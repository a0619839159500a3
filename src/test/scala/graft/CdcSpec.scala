package graft

import org.apache.spark.sql.functions._
import graft.ops.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // change rows: (key, payload, op, ts, change_id)
  private def ch(rows: (Long, String, String, Long, Long)*) =
    rows.toDF("k", "v", "op", "ts", "cid")

  test("applyChanges: latest-wins upsert, delete, insert, untouched") {
    val base = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
    val changes = ch(
      (1L, "new1a", "U", 10L, 1L), (1L, "new1b", "U", 20L, 2L), // update x2
      (2L, "gone", "D", 10L, 3L),                               // delete
      (4L, "ins4", "I", 10L, 4L),                               // insert
      (5L, "ins5", "U", 10L, 5L), (5L, "x", "D", 20L, 6L))      // ins+del
    val r = Cdc.applyChanges(base, changes, Seq("k"), Seq("ts", "cid"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, "new1b"), (3L, "old3"), (4L, "ins4")))
  }

  test("applyChanges: sequence ties broken by the second seq column") {
    val base = Seq((1L, "old")).toDF("k", "v")
    val changes = ch((1L, "a", "U", 10L, 1L), (1L, "b", "U", 10L, 2L))
    val r = Cdc.applyChanges(base, changes, Seq("k"), Seq("ts", "cid"))
      .as[(Long, String)].collect()
    assert(r.toSeq == Seq((1L, "b")))
  }

  test("scd2: intervals chain per key; delete closes without opening") {
    val changes = ch(
      (1L, "v1", "U", 10L, 1L), (1L, "v2", "U", 20L, 2L),
      (1L, "v3", "U", 30L, 3L),
      (2L, "w1", "U", 10L, 4L), (2L, "x", "D", 25L, 5L))
    val r = Cdc.scd2(changes, Seq("k"), "ts", Seq("cid"))
      .select("k", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
      .sortBy(x => (x._1, x._3))
    assert(r.toSeq == Seq(
      (1L, "v1", 10L, Some(20L), false),
      (1L, "v2", 20L, Some(30L), false),
      (1L, "v3", 30L, None, true),
      // key 2: the delete at ts=25 closes w1's interval; no current row
      (2L, "w1", 10L, Some(25L), false)))
    assert(!r.filter(_._1 == 2L).exists(_._5), "deleted key has no current")
  }

  test("applyChanges result equals scd2's current rows (delete-aware)") {
    val changes = ch(
      (1L, "a", "U", 1L, 1L), (1L, "b", "U", 2L, 2L),
      (2L, "c", "U", 1L, 3L), (2L, "x", "D", 2L, 4L),
      (3L, "d", "I", 1L, 5L))
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    val merged = Cdc.applyChanges(empty, changes, Seq("k"), Seq("ts", "cid"))
      .as[(Long, String)].collect().sortBy(_._1)
    val current = Cdc.scd2(changes, Seq("k"), "ts", Seq("cid"))
      .where(col("is_current")).select("k", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(merged.toSeq == current.toSeq)
  }

  test("plan: unchanged base rows move through one anti join, no sort") {
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val changes = Seq((1L, 0.0, "U", 1L, 1L), (2L, 0.0, "D", 1L, 2L))
      .toDF("k", "v", "op", "ts", "cid")
    val plan = Cdc.applyChanges(base, changes, Seq("k"), Seq("ts", "cid"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("LeftAnti"), s"expected anti join in:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian"))
    // the base side must not be globally sorted to merge
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 4, s"too many exchanges ($exchanges) in:\n$plan")
  }
}
