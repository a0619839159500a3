package graft.tools
import org.apache.spark.sql.execution.FormattedMode
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val builder = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // extra confs (e.g. forcing a plan-time strategy gate):
    // SPARK_GRAFT_EXTRA_CONF="k=v,k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(",")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    // comma-separated names; with a third arg, write each plan to
    // <outDir>/<name><suffix>.txt instead of stdout (round-15 plan
    // capture: one JVM for the whole list)
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = if (args.length > 2) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else ""
    names.foreach { name =>
      val p = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode)
      outDir match {
        case Some(od) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(od, s"$name$suffix.txt"), p)
          println(s"[planpeek] wrote $od/$name$suffix.txt")
        case None => println(s"== $name ==\n$p")
      }
    }
    spark.stop()
  }
}
