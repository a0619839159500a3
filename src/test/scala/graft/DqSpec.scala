package graft

import org.apache.spark.sql.functions._
import graft.ops.Dq

class DqSpec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long)].collect().toMap

  test("row rules: null / range / domain counted in one aggregate") {
    val df = Seq(
      (Some(1L), 10.0, "A"), (None, 60.0, "X"),
      (Some(3L), -5.0, "N"), (Some(4L), 20.0, "R"))
      .toDF("k", "q", "flag")
    val r = asMap(Dq.report(df, rowRules = Seq(
      "not_null:k" -> col("k").isNull,
      "range:q:0-50" -> (col("q") < 0.0 || col("q") > 50.0),
      "domain:flag" -> !col("flag").isin("A", "N", "R"))))
    assert(r == Map("not_null:k" -> 1L, "range:q:0-50" -> 2L,
      "domain:flag" -> 1L))
  }

  test("row rules: a NULL predicate result is not a violation") {
    val df = Seq(Some(5.0), None).toDF("q")
    val r = asMap(Dq.report(df,
      rowRules = Seq("range:q" -> (col("q") > 10.0))))
    // NULL > 10.0 is NULL, not true: the null row needs its own
    // not-null rule, it must not leak into the range count
    assert(r == Map("range:q" -> 0L))
  }

  test("unique rule: k occurrences count k-1; NULL keys group") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "b"))
      .toDF("k", "sub").union(
        Seq((Option.empty[Long], "n"), (Option.empty[Long], "n"))
          .toDF("k", "sub"))
    val r = asMap(Dq.report(df, rowRules = Nil,
      uniqueRules = Seq(Dq.UniqueRule("unique:k", Seq("k")))))
    assert(r == Map("unique:k" -> 3L)) // (3-1) + (2-1)
  }

  test("unique rule on a clean empty table reports zero") {
    val df = Seq.empty[(Long, String)].toDF("k", "v")
    val r = asMap(Dq.report(df, rowRules = Nil,
      uniqueRules = Seq(Dq.UniqueRule("unique:k", Seq("k")))))
    assert(r == Map("unique:k" -> 0L))
  }

  test("ref rule: orphans count once each, NULL FKs excluded") {
    val facts = Seq(Some(1L), Some(1L), Some(9L), Some(9L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L).toDF("pk")
    val r = asMap(Dq.report(facts, rowRules = Nil,
      refRules = Seq(Dq.RefRule("ref:fk->dim", Seq("fk"), dim, Seq("pk")))))
    assert(r == Map("ref:fk->dim" -> 2L))
  }

  test("all three families union into one report") {
    val facts = Seq((1L, 5.0), (1L, 99.0), (7L, 1.0)).toDF("k", "q")
    val dim = Seq(1L).toDF("pk")
    val r = asMap(Dq.report(facts,
      rowRules = Seq("range:q:0-50" -> (col("q") > 50.0)),
      uniqueRules = Seq(Dq.UniqueRule("unique:k", Seq("k"))),
      refRules = Seq(Dq.RefRule("ref:k->dim", Seq("k"), dim, Seq("pk")))))
    assert(r == Map("range:q:0-50" -> 1L, "unique:k" -> 1L,
      "ref:k->dim" -> 1L))
  }

  test("annotate: declaration-order '|' list, '' for clean, NULL-safe") {
    val df = Seq(
      (1L, Some(5.0)),    // clean
      (2L, Some(99.0)),   // range only
      (3L, None),         // null predicate -> only the null rule fires
      (4L, Some(-99.0)))  // both
      .toDF("k", "q")
    val r = Dq.annotate(df, Seq(
        "q_null" -> col("q").isNull,
        "range" -> (col("q") > 50.0 || col("q") < 0.0),
        "neg" -> (col("q") < 0.0)))
      .select("k", "violations").as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "", 2L -> "range", 3L -> "q_null",
      4L -> "range|neg"))
  }

  test("annotate refuses to shadow an existing violations column") {
    val df = Seq((1L, "x")).toDF("k", "violations")
    intercept[IllegalArgumentException] {
      Dq.annotate(df, Seq("r" -> col("k").isNull))
    }
  }

  test("observed: metrics ride the existing action, counts match report") {
    val df = Seq((1L, 5.0), (2L, 99.0), (3L, -1.0), (4L, 7.0))
      .toDF("k", "q")
    val rules = Seq(
      "range_high" -> (col("q") > 50.0),
      "range_low" -> (col("q") < 0.0))
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get("dq").foreach(r => seen = Some(r))
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val observed = Dq.observed(df, "dq", rules)
      assert(observed.count() == 4L, "observation must not change results")
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10000000000L
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = seen.getOrElse(fail("observed metrics never arrived"))
      assert(m.getAs[Long]("n_rows") == 4L)
      assert(m.getAs[Long]("range_high") == 1L)
      assert(m.getAs[Long]("range_low") == 1L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("observed enforces the naming contract: duplicates, empties, " +
      "and n_rows collisions fail fast") {
    // (review r12) a duplicate rule name would make one violation count
    // silently shadow the other in the observedMetrics row
    val df = Seq((1L, 5.0)).toDF("k", "q")
    intercept[IllegalArgumentException](Dq.observed(df, "dq",
      Seq("r" -> (col("q") > 0), "r" -> (col("q") < 0))))
    intercept[IllegalArgumentException](Dq.observed(df, "dq",
      Seq("" -> (col("q") > 0))))
    intercept[IllegalArgumentException](Dq.observed(df, "dq",
      Seq("n_rows" -> (col("q") > 0))))
  }

  test("plan: row rules share ONE scan regardless of rule count") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plan = Dq.report(df, rowRules = Seq(
        "a" -> col("l_quantity").isNull,
        "b" -> (col("l_discount") > 0.05),
        "c" -> (col("l_tax") > 0.05),
        "d" -> !col("l_returnflag").isin("A", "N", "R")))
      .queryExecution.executedPlan.toString()
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan for 4 row rules, got $scans:\n$plan")
  }
}
