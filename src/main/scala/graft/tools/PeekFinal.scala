package graft.tools
object PeekFinal {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(args(0))(spark,
      if (args.length > 1) args(1) else "/root/testdata/sf0.001")
    q.collect()
    println(q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head)
    spark.stop()
  }
}
