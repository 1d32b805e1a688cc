package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared ScalaTest base: one local SparkSession per suite, configured like
  * the driver's Verify/Bench sessions (UTC, low shuffle partitions). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  protected val sf0001 = "/root/testdata/sf0.001"

  protected lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override protected def afterAll(): Unit = {
    // SparkSession is process-shared across suites (getOrCreate); do not stop
    super.afterAll()
  }
}
