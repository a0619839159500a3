package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-keyed sampling and splits.
  *
  * Training pipelines need splits that are STABLE: the same document must
  * land in the same split on every run, every cluster, every engine —
  * `rand()`-based sampling breaks all three. Keying on a content hash
  * (first 8 md5 hex digits mod 100) gives a uniform, reproducible bucket
  * in [0, 100) that any engine can recompute (the DuckDB oracle does).
  *
  * Per-row expression — no shuffle, no state; at 100 TB the split is a
  * pushed-down filter, not a pass over the data.
  */
object Sampling {

  /** Uniform deterministic bucket in [0, 100) from a key column. */
  def bucketOf(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100

  /** Add a stable `split` column: "train" for buckets < pctTrain. */
  def stableSplit(df: DataFrame, keyCol: String, pctTrain: Int): DataFrame = {
    require(pctTrain >= 0 && pctTrain <= 100)
    df.withColumn("split",
      when(bucketOf(col(keyCol)) < pctTrain, "train").otherwise("test"))
  }

  /** Keep a stable ~pct% sample keyed on `keyCol`. */
  def sampleByKey(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.where(bucketOf(col(keyCol)) < pct)

  /** Deterministic global shuffle for training order: every epoch of
    * training wants the corpus in a different but REPRODUCIBLE order, and
    * `orderBy(rand())` is neither reproducible across retries nor stable
    * across engines. Ordering by md5(key ++ seed) is both — any engine
    * recomputes the same permutation from (key, seed), a lost task re-sorts
    * identically, and changing the seed gives an independent epoch order.
    *
    * Adds `shuffle_pos` (0-based contiguous position). Cost at scale: one
    * range exchange (sampled boundaries) + per-partition sort — a global
    * sort IS the operation, there is no cheaper exact form; the md5 key is
    * 1 cheap column, and zipWithIndex assigns positions from per-partition
    * counts without a second pass over the rows. Ties (duplicate keys)
    * break by the key itself, so the order is total and deterministic. */
  def shuffleDeterministic(df: DataFrame, keyCol: String, seed: Long): DataFrame = {
    require(!df.columns.contains("shuffle_pos"),
      "shuffleDeterministic reserves the column name shuffle_pos")
    require(!df.columns.contains("_shufkey"),
      "shuffleDeterministic reserves the column name _shufkey; rename it upstream")
    val ordered = df
      .withColumn("_shufkey",
        md5(concat(col(keyCol).cast("string"), lit(":" + seed))))
      .orderBy(col("_shufkey"), col(keyCol))
      .drop("_shufkey") // narrow projection — the sort order survives
    val withPos = ordered.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(withPos,
      org.apache.spark.sql.types.StructType(ordered.schema.fields :+
        org.apache.spark.sql.types.StructField("shuffle_pos",
          org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** Stratified deterministic sampling: a different keep-percentage per
    * stratum (e.g. down-weight web crawl, keep all of books — the data-
    * mixing step of corpus assembly). Strata missing from `pctByStratum`
    * fall back to `defaultPct`. Same contract as [[sampleByKey]]: pure
    * per-row expression, reproducible anywhere md5 exists, and at scale
    * the predicate pushes down to the scan (with hive-partitioned strata
    * the scan also partition-prunes fully-dropped strata). */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require((defaultPct +: pctByStratum.values.toSeq)
      .forall(p => p >= 0 && p <= 100), "percentages must be in [0, 100]")
    val pct = pctByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (acc, (stratum, p)) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(acc) }
    df.where(bucketOf(col(keyCol)) < pct)
  }
}
