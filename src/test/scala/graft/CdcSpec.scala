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

  test("pointInTime: boundary semantics, delete gap, pre-history fact") {
    val changes = ch(
      (1L, "v1", "U", 10L, 1L), (1L, "v2", "U", 20L, 2L),
      (1L, "x", "D", 30L, 3L), (1L, "v3", "U", 40L, 4L))
    val dim = Cdc.scd2(changes, Seq("k"), "ts", Seq("cid"))
      .select(col("k"), col("v").as("dim_v"),
        col("valid_from"), col("valid_to"))
    val facts = Seq(
      (100L, 1L, 5L),   // before the first version -> NULL
      (101L, 1L, 10L),  // valid_from is inclusive -> v1
      (102L, 1L, 19L),  // inside [10,20) -> v1
      (103L, 1L, 20L),  // valid_to is exclusive -> v2
      (104L, 1L, 35L),  // inside the delete gap [30,40) -> NULL
      (105L, 1L, 99L),  // open interval -> v3
      (106L, 7L, 10L))  // key the dim never saw -> NULL
      .toDF("fid", "k", "t")
    val r = Cdc.pointInTime(facts, dim, Seq("k"), "t")
      .select("fid", "dim_v").as[(Long, Option[String])]
      .collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (100L, None), (101L, Some("v1")), (102L, Some("v1")),
      (103L, Some("v2")), (104L, None), (105L, Some("v3")),
      (106L, None)))
  }

  test("pointInTime: exactly one output row per fact (disjoint intervals)") {
    val changes = ch((1L, "a", "U", 10L, 1L), (1L, "b", "U", 10L, 2L),
      (1L, "c", "U", 20L, 3L))
    val dim = Cdc.scd2(changes, Seq("k"), "ts", Seq("cid"))
      .select(col("k"), col("v").as("dim_v"),
        col("valid_from"), col("valid_to"))
    val facts = Seq((100L, 1L, 10L), (101L, 1L, 15L), (102L, 1L, 25L))
      .toDF("fid", "k", "t")
    val r = Cdc.pointInTime(facts, dim, Seq("k"), "t")
      .select("fid", "dim_v").as[(Long, String)].collect().sortBy(_._1)
    // the ts tie at 10 gives 'a' an empty [10,10) interval: facts at 10
    // match only 'b', and every fact yields exactly one row
    assert(r.toSeq == Seq((100L, "b"), (101L, "b"), (102L, "c")))
  }

  test("snapshotDiff: all four dispositions, null-safe payload compare") {
    val oldS = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("d")), (5L, None)).toDF("k", "v")
    val newS = Seq((1L, Some("a")), (2L, Some("B")), (3L, None),
      (6L, Some("f")), (5L, Some("e"))).toDF("k", "v")
    val r = Cdc.snapshotDiff(oldS, newS, Seq("k"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (1L, "unchanged"), (2L, "changed"),
      (3L, "unchanged"),               // NULL <=> NULL
      (4L, "removed"), (5L, "changed"), // NULL -> value
      (6L, "added")))
  }

  test("snapshotDiff: survives the derived-snapshot self-join lineage") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val derived = Cdc.applyChanges(base,
      ch((2L, "B", "U", 1L, 1L), (3L, "x", "D", 1L, 2L),
        (4L, "d", "I", 1L, 3L)),
      Seq("k"), Seq("ts", "cid"))
    val r = Cdc.snapshotDiff(base, derived, Seq("k"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }

  // change rows with a group and a numeric payload:
  // (key, group, value, op, ts, cid)
  private def gch(rows: (Long, String, Double, String, Long, Long)*) =
    rows.toDF("k", "g", "v", "op", "ts", "cid")

  test("incrementalAgg equals a full recompute (delete/insert/group move)") {
    val base = Seq(
      (1L, "x", 10.5), (2L, "x", 20.25), (3L, "y", 30.125),
      (4L, "y", 5.0), (5L, "z", 7.75)).toDF("k", "g", "v")
    val changes = gch(
      (1L, "x", 11.0, "U", 10L, 1L),   // in-group update
      (2L, "y", 20.25, "U", 10L, 2L),  // moves x -> y
      (3L, "y", 0.0, "D", 10L, 3L),    // delete
      (5L, "z", 1.0, "U", 10L, 4L), (5L, "z", 2.0, "U", 20L, 5L), // latest wins
      (6L, "w", 9.5, "I", 10L, 6L))    // insert into a NEW group
    val baseAgg = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).as("total"))
    val inc = Cdc.incrementalAgg(base, baseAgg, changes,
        Seq("k"), "g", "v", Seq("ts", "cid"))
      .select(col("g"), col("n"), col("total").cast("double"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val full = Cdc.applyChanges(base, changes, Seq("k"), Seq("ts", "cid"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).cast("decimal(18,6)")
          .cast("double").as("total"))
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(inc.toSeq == full.toSeq)
    assert(inc.exists(_._1 == "w"), "new group must appear")
  }

  test("incrementalMinMax equals full recompute; untouched groups pass through") {
    val base = Seq(
      (1L, "x", 10.0), (2L, "x", 20.0), (3L, "y", 30.0),
      (4L, "y", 5.0), (5L, "z", 7.0), (6L, "q", 1.0)).toDF("k", "g", "v")
    val changes = gch(
      (2L, "x", 99.0, "D", 10L, 1L),   // delete the max of x -> min/max must RECEDE
      (3L, "y", 2.0, "U", 10L, 2L),    // new min for y
      (7L, "w", 50.0, "I", 10L, 3L))   // new group
    val baseAgg = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
    val inc = Cdc.incrementalMinMax(base, baseAgg, changes,
        Seq("k"), "g", "v", Seq("ts", "cid"))
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    val full = Cdc.applyChanges(base, changes, Seq("k"), Seq("ts", "cid"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    assert(inc.toSeq == full.toSeq)
    // the receding-max case is what invertible deltas get wrong
    assert(inc.find(_._1 == "x").get == ("x", 1L, 10.0, 10.0))
    assert(inc.find(_._1 == "q").get == ("q", 1L, 1.0, 1.0),
      "untouched group must survive via passthrough")
    assert(inc.exists(_._1 == "w"))
  }

  test("incrementalAgg: a group emptied by deletes disappears") {
    val base = Seq((1L, "solo", 4.5)).toDF("k", "g", "v")
    val baseAgg = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).as("total"))
    val r = Cdc.incrementalAgg(base, baseAgg,
      gch((1L, "solo", 0.0, "D", 1L, 1L)),
      Seq("k"), "g", "v", Seq("ts", "cid"))
    assert(r.count() == 0L)
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

  test("NULL semantics: NULL-key diff rows classify by presence, NULL " +
      "groups maintain incrementally, unknown ops fail loudly") {
    import graft.ops.Cdc
    // snapshotDiff: a removed NULL-key row previously read as "added"
    val o = Seq((Option(1L), "a"), (Option.empty[Long], "x"))
      .toDF("k", "v")
    val n = Seq((Option(1L), "a")).toDF("k", "v")
    val d = Cdc.snapshotDiff(o, n, Seq("k"))
      .as[(Option[Long], String)].collect().toSet
    assert(d == Set((Some(1L), "unchanged"), (None, "removed")), s"got $d")
    // incrementalAgg: a changed NULL group merges to ONE row, matching
    // the full recompute (the plain full_outer split it in two)
    val base = Seq((1L, Option.empty[String], 10.0),
      (2L, Option.empty[String], 20.0), (3L, Some("g"), 5.0))
      .toDF("id", "grp", "v")
    val baseAgg = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).as("total"))
    val changes = Seq((2L, Option.empty[String], 25.0, "U", 1L))
      .toDF("id", "grp", "v", "op", "seq")
    val inc = Cdc.incrementalAgg(base, baseAgg, changes, Seq("id"),
        "grp", "v", Seq("seq"))
      .as[(Option[String], Long, BigDecimal)].collect().toSet
    val full = Cdc.applyChanges(base, changes.drop("op", "seq")
        .withColumn("op", lit("U")).withColumn("seq", lit(1L)),
        Seq("id"), Seq("seq"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).as("total"))
      .as[(Option[String], Long, BigDecimal)].collect().toSet
    assert(inc == full, s"inc $inc vs full $full")
    assert(inc.count(_._1.isEmpty) == 1, s"null group split: $inc")
    // incrementalMinMax: the NULL group recomputes, not passes stale
    val baseMm = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
    val mm = Cdc.incrementalMinMax(base, baseMm, changes, Seq("id"),
        "grp", "v", Seq("seq"))
      .as[(Option[String], Long, Double, Double)].collect().toSet
    assert(mm.contains((None, 2L, 10.0, 25.0)), s"got $mm")
    // a NULL op is a corrupt extract, not a silent delete
    val bad = Seq((2L, Option.empty[String], 9.9,
        null.asInstanceOf[String], 2L))
      .toDF("id", "grp", "v", "op", "seq")
    val ex = intercept[Exception] {
      Cdc.applyChanges(base, bad, Seq("id"), Seq("seq")).collect() }
    assert(ex.getMessage.contains("unknown change op"),
      s"unexpected: ${ex.getMessage}")
  }
}
