package graft.tools
import org.apache.spark.sql.execution.FormattedMode
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.SparkEntry.queries(args(0))(
        spark, if (args.length > 1) args(1) else "/root/testdata/sf0.001")
      .queryExecution.explainString(FormattedMode)
    println(p)
    spark.stop()
  }
}
