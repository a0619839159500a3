package graft.tools

/** Measures generated-code compile cost for one query: runs it twice
  * (cold, then warm from the same session's codegen cache) and reports
  * the CodegenMetrics deltas — how much of a first run is Janino. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("WARN")
    val m = org.apache.spark.metrics.source.CodegenMetrics
    def snap() = (m.METRIC_COMPILATION_TIME.getCount,
      m.METRIC_SOURCE_CODE_SIZE.getSnapshot.getMax,
      m.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot.getMax)
    val (t0, _, _) = snap()
    val start = System.nanoTime()
    graft.SparkEntry.queries(args(0))(spark,
        if (args.length > 1) args(1) else "/root/testdata/sf0.1")
      .queryExecution.toRdd.count()
    val cold = (System.nanoTime() - start) / 1e9
    val (t1, maxSrc, maxByte) = snap()
    val start2 = System.nanoTime()
    graft.SparkEntry.queries(args(0))(spark,
        if (args.length > 1) args(1) else "/root/testdata/sf0.1")
      .queryExecution.toRdd.count()
    val warm = (System.nanoTime() - start2) / 1e9
    println(f"[codegen] ${args(0)} cold=$cold%.2fs warm=$warm%.2fs " +
      f"compileMs=${t1 - t0} maxSrcBytes=$maxSrc maxMethodBytecode=$maxByte")
    spark.stop()
  }
}
