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
    // the realistic library-user setup: every test session carries the
    // full extension ladder via the config path. Session extensions are
    // read from the SparkContext conf, so this must be on the FIRST
    // builder that creates the context — suites run in parallel and any
    // of them may win that race (ExtensionsSpec asserts the config path
    // end to end and was order-dependent before this was hoisted here).
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()

  override protected def afterAll(): Unit = {
    // SparkSession is process-shared across suites (getOrCreate); do not stop
    super.afterAll()
  }
}
