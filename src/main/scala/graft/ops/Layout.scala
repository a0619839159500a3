package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Data-layout control: cluster a table on its dominant filter columns at
  * write time so downstream scans prune instead of reading everything.
  *
  * The reference's sources are an extension trait with no layout notion
  * (reference: src/datasource/table.rs:9 — scan() returns all partitions);
  * at 100 TB layout IS the difference between a query touching 100 TB or
  * 1 TB. Two complementary mechanisms, both write-side:
  *
  *  - hive-style `partitionBy` directories (Frame.write) — coarse keys with
  *    bounded cardinality (date, source); pruning happens at planning time
  *    from directory names.
  *  - range-clustering (this op) — high-cardinality orderable keys
  *    (timestamps, ids): `repartitionByRange` puts disjoint key ranges in
  *    separate files and the in-file sort tightens every parquet row-group's
  *    min/max stats, so a range filter skips whole files/row groups at read
  *    time even though the key is not a directory.
  *
  * The write costs one range-exchange (sampled boundaries, balanced output
  * files — no skewed 10 GB file next to empty ones); reads with a range
  * predicate on the cluster key then touch ~selectivity of the bytes.
  * LayoutSpec pins the read-side contract: the predicate reaches the scan
  * as PushedFilters and the clustered readback equals the source query.
  */
object Layout {

  /** Rewrite `df` as `numFiles` parquet files range-clustered and
    * internally sorted on `cols`. */
  def writeClustered(df: DataFrame, path: String, numFiles: Int,
      cols: String*): Unit = {
    require(cols.nonEmpty, "writeClustered requires at least one cluster column")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}
