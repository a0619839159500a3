package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test / Deequ shape):
  * run a set of named rules against a table and return one
  * `(rule, violations)` row per rule — the gate a 100 TB ingest runs
  * before promoting a partition, where "scan the table once per rule"
  * is the difference between a feasible check and an abandoned one.
  *
  * (Extension surface — the reference engine has no validation
  * surface; the per-rule aggregates compose the engine's own
  * expression layer.)
  *
  * Three rule families, each with the cheapest exact plan shape:
  *  - ROW rules (not-null, range, any boolean predicate): ALL rules
  *    fold into ONE full-scan aggregate — a conditional-sum per rule,
  *    partial-aggregated map-side, one 1-row result exploded back to
  *    rows. Adding a rule adds a column, not a pass.
  *  - UNIQUE rules (key sets): one key-keyed aggregate per rule;
  *    violations = rows beyond the first per key (`sum(cnt - 1)`), so
  *    a clean table reports 0 and a table where a key appears k times
  *    reports k-1. NULL keys group like values (a duplicated NULL key
  *    is a duplicate).
  *  - REF rules (foreign key into a dimension): one LEFT ANTI join on
  *    the key; NULL foreign keys are EXCLUDED (SQL FK semantics — pair
  *    with a not-null row rule to forbid them), and orphan rows count
  *    once each. Dim-sized right sides broadcast under AQE.
  *
  * Everything is exact integer counting — no sampling, no sketches —
  * and the output is engine-reproducible by construction. */
object Dq {

  /** A named uniqueness expectation over a key-column set. */
  final case class UniqueRule(name: String, keyCols: Seq[String])

  /** A named referential-integrity expectation: every non-NULL
    * `fkCols` tuple must exist as a `pkCols` tuple in `dim`. */
  final case class RefRule(name: String, fkCols: Seq[String],
      dim: DataFrame, pkCols: Seq[String])

  /** Run the expectations; one `(rule, violations)` row per rule.
    * `rowRules` maps each rule name to its VIOLATION predicate (true =
    * the row fails the expectation). */
  def report(df: DataFrame, rowRules: Seq[(String, Column)],
      uniqueRules: Seq[UniqueRule] = Nil,
      refRules: Seq[RefRule] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty || refRules.nonEmpty,
      "report needs at least one rule")
    val parts = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      // positional internal aliases: rule names are labels, not
      // identifiers (dots/colons in a name must not hit the resolver)
      val sums = rowRules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"__r$i") }
      val agged = df.agg(sums.head, sums.tail: _*)
      // a 1-row frame exploded to (rule, violations) rows — the agg
      // subtree runs once for every rule together
      parts += agged.select(explode(array(
          rowRules.zipWithIndex.map { case ((n, _), i) =>
            struct(lit(n).as("rule"),
              coalesce(col(s"__r$i"), lit(0L)).as("violations"))
          }.toIndexedSeq: _*)).as("r"))
        .select(col("r.rule").as("rule"), col("r.violations").as("violations"))
    }
    uniqueRules.foreach { u =>
      parts += df.groupBy(u.keyCols.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("__cnt"))
        .agg(coalesce(sum(col("__cnt") - 1L), lit(0L)).as("violations"))
        .select(lit(u.name).as("rule"), col("violations"))
    }
    refRules.foreach { r =>
      require(r.fkCols.size == r.pkCols.size,
        s"ref rule ${r.name}: fk/pk arity mismatch")
      val fkNotNull = r.fkCols.map(col(_).isNotNull).reduce(_ && _)
      val left = df.where(fkNotNull)
        .select(r.fkCols.zipWithIndex.map { case (c, i) =>
          col(c).as(s"__fk$i") }.toIndexedSeq: _*)
      val right = r.dim.select(r.pkCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__fk$i") }.toIndexedSeq: _*)
      parts += left
        .join(right, r.fkCols.indices.map(i => s"__fk$i"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("violations"))
        .select(lit(r.name).as("rule"), col("violations"))
    }
    parts.result().reduce(_ unionByName _)
  }

  /** Per-row rule annotation — the gate form of the row rules: every
    * row gains a `violations` column naming the rules it fails,
    * '|'-joined in declaration order ('' = clean). Pure per-row
    * expressions, so it pipelines inside the scan stage, works
    * unchanged on a streaming DataFrame (StreamOps.dqGate), and a NULL
    * predicate result is not a violation (the report() rule). The
    * string form (not an array) is deliberate: it is the sortable
    * scalar the cross-engine comparator convention requires, and the
    * split downstream is one `where(violations === "")`. */
  def annotate(df: DataFrame, rowRules: Seq[(String, Column)]): DataFrame = {
    require(rowRules.nonEmpty, "annotate needs at least one rule")
    require(!df.columns.contains("violations"),
      "annotate reserves the column name violations")
    val marks = rowRules.map { case (n, pred) =>
      when(coalesce(pred, lit(false)), lit(n)) }
    df.withColumn("violations", concat_ws("|", marks.toIndexedSeq: _*))
  }

  /** Piggyback the row-rule violation counts onto whatever job already
    * runs, via `Dataset.observe`: the returned frame computes exactly
    * what the input did, and every action over it ALSO delivers one
    * named metric row (`n_rows` plus one violation count per rule) to
    * the session's QueryExecutionListener / streaming progress — the
    * production-monitoring form of [[report]], costing zero extra
    * passes because the observation rides the existing scan. Rule
    * names become metric names; they must be unique and non-empty.
    *
    * Works on batch and streaming frames alike (on streams the
    * metrics surface per micro-batch in StreamingQueryProgress
    * .observedMetrics under `name`). */
  def observed(df: DataFrame, name: String,
      rowRules: Seq[(String, Column)]): DataFrame = {
    require(rowRules.nonEmpty, "observed needs at least one rule")
    // enforce the documented naming contract (review r12): duplicate
    // names make one violation count silently shadow the other in the
    // observedMetrics row, an empty name is unaddressable, and a rule
    // named n_rows collides with the built-in row-count metric — a
    // production monitor would read the wrong number with no error
    val names = rowRules.map(_._1)
    require(names.forall(_.nonEmpty), "observed: rule names must be non-empty")
    require(!names.contains("n_rows"),
      "observed: rule name n_rows collides with the built-in row count")
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty,
      s"observed: rule names must be unique, duplicated: ${dups.mkString(", ")}")
    val counts = rowRules.map { case (n, pred) =>
      sum(when(coalesce(pred, lit(false)), 1L).otherwise(0L)).as(n) }
    df.observe(name, count(lit(1)).as("n_rows"), counts: _*)
  }
}
