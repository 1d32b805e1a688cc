package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("events_seasonal_decomp")(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.optimizedPlan.treeString)
  }
}
