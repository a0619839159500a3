package graft

import org.apache.spark.sql.SparkSession

/** One-stop session setup: registers all custom Catalyst functions
  * (idempotent, per-session). Call before using graft.ops on a session. */
object Graft {
  def init(spark: SparkSession): SparkSession = {
    graft.functions.VectorExprs.register(spark)
    graft.functions.TextExprs.register(spark)
    graft.functions.ShingleExprs.register(spark)
    spark
  }
}
