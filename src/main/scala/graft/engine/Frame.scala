package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Join types — the reference declares Inner | Left | Right
  * (reference: src/logical_plan/logical_plan.rs:106-110) but only ever
  * executes inner (nested_loop_join.rs has no join_type field). Here all
  * three run with CORRECT SQL semantics via Spark's join (the reference's
  * positional-zip join and its last-key-wins flag bug, SURVEY.md §4.3, are
  * deliberately not replicated). */
object JoinType extends Enumeration {
  val Inner, Left, Right, FullOuter, Semi, Anti = Value
  def toSpark(jt: Value): String = jt match {
    case Inner => "inner"; case Left => "left"; case Right => "right"
    // extension surface beyond the reference's three declared types:
    // FULL OUTER, LEFT SEMI (exists) and LEFT ANTI (not-exists) — Semi and
    // Anti return only the left side's columns (SQL semantics; Spark plans
    // them as existence joins, so the right side never materializes into
    // the output and broadcasts when small).
    case FullOuter => "full_outer"; case Semi => "left_semi"; case Anti => "left_anti"
  }
}

/** Fluent logical-plan builder mirroring the reference's `DataFrame`
  * (reference: src/logical_plan/data_frame.rs:15-102) over a Spark Dataset.
  *
  * Each method is a LAZY plan transformation — Catalyst analyzes, optimizes
  * (predicate pushdown, column pruning, join-strategy selection, AQE) and
  * executes distributed, replacing the reference's 1:1 unoptimized
  * planner (planner/mod.rs:26-131) and single-threaded full-materialization
  * executor (physical_plan.rs:8-14).
  */
final case class Frame(df: DataFrame) {

  /** Projection (reference: data_frame.rs:24-39 → projection.rs:30-62).
    * Spark: `select`; Catalyst prunes unused columns all the way into the
    * parquet scan — the pushdown the reference declares but never wires up
    * (catalog.rs:37-40 always passes projection=None). */
  def project(exprs: Expr*): Frame =
    Frame(df.select(exprs.map(_.toColumn): _*))

  /** Selection/filter. NOTE the reference names this `select`
    * (data_frame.rs:41-48 — SQL-inverted naming); we keep both spellings.
    * Rows with a null predicate are dropped (SQL semantics; the reference
    * emits a null row — quirk not replicated, SURVEY.md §4.3 item 6). */
  def filter(pred: Expr): Frame = Frame(df.filter(pred.toColumn))
  /** Reference-compatible alias for [[filter]] (data_frame.rs:41-48). */
  def select(pred: Expr): Frame = filter(pred)

  /** Aggregation (reference: data_frame.rs:50-71 → aggr/mod.rs:102-245).
    * Zero group exprs = global aggregate (aggr/mod.rs:125-144). Unlike the
    * reference: multiple group exprs allowed, group keys may be any
    * expression, null group keys form a group (SQL semantics). Spark plans
    * this as partial (map-side) + final HashAggregate — the scale shape the
    * reference's single HashMap (aggr/mod.rs:56-100) cannot have. */
  def aggregate(groupExprs: Seq[Expr], aggExprs: Seq[Expr]): Frame = {
    require(aggExprs.nonEmpty, "aggregate requires at least one aggregate expression")
    val aggs = aggExprs.map(e => named(e))
    if (groupExprs.isEmpty) Frame(df.agg(aggs.head, aggs.tail: _*))
    else Frame(df.groupBy(groupExprs.map(e => named(e)): _*)
      .agg(aggs.head, aggs.tail: _*))
  }

  /** Multi-key equi-join (reference: data_frame.rs:73-102 →
    * nested_loop_join.rs:62-191). `on` is (leftCol, rightCol) pairs, all
    * ANDed — same signature as the reference, but a real SQL join product
    * (not the reference's matched-rows positional zip). Catalyst picks
    * broadcast-hash / shuffled-hash / sort-merge from statistics; AQE can
    * re-plan at runtime — at 100 TB the dimension side broadcasts and the
    * fact side never shuffles for it. */
  def join(right: Frame, on: Seq[(String, String)],
           joinType: JoinType.Value = JoinType.Inner): Frame = {
    require(on.nonEmpty, "join requires at least one key pair") // nested_loop_join.rs:68-72
    // per-join unique aliases: conditions built from df(col) attribute
    // references break when both sides share lineage (e.g. the SAME
    // cached Catalog.table frame self-joined on differently-named keys
    // hits AMBIGUOUS_SELF_JOIN); alias-qualified name resolution is
    // robust for self-joins and normal joins alike
    val (la, ra) = (s"__jl${Frame.joinId.incrementAndGet()}",
      s"__jr${Frame.joinId.incrementAndGet()}")
    val cond = on.map { case (l, r) =>
      org.apache.spark.sql.functions.col(s"$la.$l") ===
        org.apache.spark.sql.functions.col(s"$ra.$r") }.reduce(_ && _)
    Frame(df.as(la).join(right.df.as(ra), cond, JoinType.toSpark(joinType)))
  }

  /** General theta join (extension — the reference's join is equi-only,
    * nested_loop_join.rs:62-191): joins on an arbitrary boolean condition.
    * Catalyst still extracts any equi-conjuncts as hash-join keys and keeps
    * the rest as a residual filter, so "key equality AND range" plans as a
    * hash join, not a cartesian. For a pure range predicate on BIG sides
    * prefer [[graft.ops.RangeJoin]], which bin-shards the range dimension
    * instead of filtering a per-key cross product. */
  def joinOn(right: Frame, cond: Expr,
             joinType: JoinType.Value = JoinType.Inner): Frame =
    Frame(df.join(right.df, cond.toColumn, JoinType.toSpark(joinType)))

  // ---- extension surface: the reference has NO sort/limit/distinct/set
  // ops (SURVEY.md §2.5 absence matrix) — these close that gap with the
  // obvious Spark primitives. ----

  /** Total sort; each key (expr, ascending?). Spark plans a range-
    * partitioned distributed sort, not a single-node sort. */
  def sort(keys: (Expr, Boolean)*): Frame =
    Frame(df.orderBy(keys.map { case (e, asc) =>
      if (asc) e.toColumn.asc else e.toColumn.desc }: _*))

  /** Limit; combined with [[sort]] Spark executes TakeOrderedAndProject —
    * a per-partition top-k + driver merge, never a full global sort. */
  def limit(n: Int): Frame = Frame(df.limit(n))

  def distinct(): Frame = Frame(df.distinct())

  def union(other: Frame): Frame = Frame(df.union(other.df))

  /** Set intersection/difference (SQL INTERSECT / EXCEPT semantics). */
  def intersect(other: Frame): Frame = Frame(df.intersect(other.df))
  def except(other: Frame): Frame = Frame(df.except(other.df))

  /** Bag (multiset) forms — SQL INTERSECT ALL / EXCEPT ALL: a row
    * occurring m times on the left and n on the right appears
    * min(m, n) / max(m - n, 0) times. Spark plans both as one
    * count-compare aggregate + generate, never a join explosion. */
  def intersectAll(other: Frame): Frame = Frame(df.intersectAll(other.df))
  def exceptAll(other: Frame): Frame = Frame(df.exceptAll(other.df))

  /** ROLLUP aggregation (subtotal + grand-total groups). */
  def rollup(groupExprs: Seq[Expr], aggExprs: Seq[Expr]): Frame = {
    require(aggExprs.nonEmpty, "rollup requires at least one aggregate expression")
    val aggs = aggExprs.map(e => named(e))
    Frame(df.rollup(groupExprs.map(e => named(e)): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** CUBE aggregation (every grouping-set combination — rollup's sibling,
    * same partial+final aggregate shape with a grouping-id column). */
  def cube(groupExprs: Seq[Expr], aggExprs: Seq[Expr]): Frame = {
    require(aggExprs.nonEmpty, "cube requires at least one aggregate expression")
    val aggs = aggExprs.map(e => named(e))
    Frame(df.cube(groupExprs.map(e => named(e)): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** GROUPING SETS aggregation — the general form under [[rollup]] and
    * [[cube]]: aggregate over exactly the listed grouping-key combinations.
    * `groupCols` is the union of columns any set mentions (they appear in
    * the output, NULL where a set omits them). Same partial+final
    * hash-aggregate shape as a plain groupBy — one shuffle, expanded by the
    * number of sets map-side. */
  def groupingSets(sets: Seq[Seq[Expr]], groupCols: Seq[Expr],
      aggExprs: Seq[Expr]): Frame = {
    require(sets.nonEmpty, "groupingSets requires at least one grouping set")
    require(aggExprs.nonEmpty, "groupingSets requires at least one aggregate expression")
    val aggs = aggExprs.map(e => named(e))
    Frame(df.groupingSets(sets.map(_.map(e => named(e))),
      groupCols.map(e => named(e)): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** PIVOT (wide aggregation): one output column per pivoted value.
    * Values are EXPLICIT — the scale-safe form: no hidden distinct pass
    * over the corpus to discover them. */
  def pivot(groupExprs: Seq[Expr], pivotCol: String, values: Seq[Any],
      aggExprs: Seq[Expr]): Frame = {
    require(aggExprs.nonEmpty, "pivot requires at least one aggregate expression")
    require(values.nonEmpty, "pivot requires explicit pivot values")
    val aggs = aggExprs.map(e => named(e))
    Frame(df.groupBy(groupExprs.map(e => named(e)): _*)
      .pivot(pivotCol, values).agg(aggs.head, aggs.tail: _*))
  }

  /** Explode-with-position (LATERAL VIEW POSEXPLODE): one output row per
    * array element of `arrayExpr`, as (posAlias, valAlias), keeping the
    * `keep` columns. Generates rows inside the scan stage — no shuffle. */
  def explode(arrayExpr: Expr, posAlias: String, valAlias: String,
      keep: Seq[Expr]): Frame =
    Frame(df.select(keep.map(_.toColumn) :+
      org.apache.spark.sql.functions.posexplode(arrayExpr.toColumn)
        .as(Seq(posAlias, valAlias)): _*))

  /** Outer explode: rows whose array is NULL or empty are KEPT with
    * NULL position/value — the left-join form of [[explode]], needed
    * when the per-row context must survive empty collections. */
  def explodeOuter(arrayExpr: Expr, posAlias: String, valAlias: String,
      keep: Seq[Expr]): Frame =
    Frame(df.select(keep.map(_.toColumn) :+
      org.apache.spark.sql.functions.posexplode_outer(arrayExpr.toColumn)
        .as(Seq(posAlias, valAlias)): _*))

  /** Append (or replace) one computed column — the incremental form of
    * [[project]]. */
  def withColumn(name: String, expr: Expr): Frame =
    Frame(df.withColumn(name, expr.toColumn))

  def drop(cols: String*): Frame = Frame(df.drop(cols: _*))

  def rename(from: String, to: String): Frame =
    Frame(df.withColumnRenamed(from, to))

  /** Windowed analytics (extension surface, string-fn convention of
    * [[Exprs.AggFn]]): appends each (fn, operand, alias) column over ONE
    * window spec. RANK / DENSE_RANK / ROW_NUMBER ignore the operand;
    * LAG / LEAD read the previous/next row; SUM MIN MAX AVG COUNT run
    * cumulatively (unbounded preceding .. current row). One shuffle on
    * the partition keys — same cost class as a keyed aggregation. */
  def window(partitionBy: Seq[Expr], orderBy: Seq[(Expr, Boolean)],
      cols: Seq[(String, Expr, String)]): Frame = {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.{functions => F}
    require(cols.nonEmpty, "window requires at least one analytic column")
    val base = W.partitionBy(partitionBy.map(_.toColumn): _*)
      .orderBy(orderBy.map { case (e, asc) =>
        if (asc) e.toColumn.asc else e.toColumn.desc }: _*)
    val running = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    val out = cols.map { case (fn, operand, alias) =>
      val fnU = fn.toUpperCase(java.util.Locale.ROOT)
      val c = fnU match {
        case "RANK" => F.rank().over(base)
        case "DENSE_RANK" => F.dense_rank().over(base)
        case "ROW_NUMBER" => F.row_number().over(base)
        case "PERCENT_RANK" => F.percent_rank().over(base)
        case "CUME_DIST" => F.cume_dist().over(base)
        case "NTILE" =>
          // bucket count must be a literal (SQL says so too); NTILE
          // depends on the FULL order — give it a tie-free orderBy or
          // bucket assignment is engine-arbitrary
          val n = operand match {
            case Lit(v: Int) => v
            case Lit(v: Long) => v.toInt
            case other => throw new IllegalArgumentException(
              s"NTILE requires an integer literal bucket count, got $other")
          }
          F.ntile(n).over(base)
        case "LAG" => F.lag(operand.toColumn, 1).over(base)
        case "LEAD" => F.lead(operand.toColumn, 1).over(base)
        case "SUM" | "MIN" | "MAX" | "AVG" | "COUNT" =>
          AggFn(fnU, operand).toColumn.over(running)
        case other => throw new IllegalArgumentException(
          s"unknown window function: $other")
      }
      c.as(alias)
    }
    Frame(df.select(df.columns.toSeq.map(org.apache.spark.sql.functions.col) ++ out: _*))
  }

  /** As-of join (ops/AsOfJoin passthrough): attach the latest `right` row
    * with the same key at or before each left row's time, as
    * `asof_<payload>` columns. One shuffle on the key; `saltBuckets > 1`
    * splits hot keys' windows by time range with identical results. */
  def asOf(right: Frame, keyCol: String, timeCol: String,
      payloadCols: Seq[String], saltBuckets: Int = 1,
      direction: String = "backward",
      tolerance: Option[Long] = None): Frame =
    Frame(graft.ops.AsOfJoin.asOf(df, right.df, keyCol, timeCol,
      payloadCols, saltBuckets, direction, tolerance))

  /** Point-in-interval range join (ops/RangeJoin passthrough): this frame
    * is the point side; every `intervals` row with equal key whose
    * [start, end) contains the point's time matches exactly once. The
    * range dimension is bin-sharded so candidates come from an equi-join
    * on (key, bin) — never a per-key cross product. */
  def rangeJoin(intervals: Frame, key: String, time: String,
      iKey: String, iStart: String, iEnd: String, binWidth: Long): Frame =
    Frame(graft.ops.RangeJoin.pointInInterval(df, key, time,
      intervals.df, iKey, iStart, iEnd, binWidth))

  /** Interval-overlap join (ops/RangeJoin passthrough): both sides are
    * [start, end) ranges; equal-key overlapping pairs match exactly once
    * via the ownership-bin rule. */
  def intervalOverlap(right: Frame, key: String, start: String, end: String,
      rKey: String, rStart: String, rEnd: String, binWidth: Long): Frame =
    Frame(graft.ops.RangeJoin.intervalOverlap(df, key, start, end,
      right.df, rKey, rStart, rEnd, binWidth))

  // ---- LLM-pipeline passthroughs ------------------------------------

  /** Line-level corpus dedup (ops/TextOps passthrough): drop lines
    * occurring in more than `maxDf` distinct documents, reassemble the
    * survivors in order. */
  def dedupLines(idCol: String = "doc_id", textCol: String = "text",
      maxDf: Int = 1, delim: String = "\n"): Frame =
    Frame(graft.ops.TextOps.dedupLines(df, idCol, textCol, maxDf, delim))

  /** Incremental dedup (ops/Dedup passthrough): rows of this frame whose
    * content fingerprint is absent from `seen`, deduped internally. */
  def newUnseen(seen: Frame, keyCol: String, idCol: String,
      seenFpCol: String = "fp"): Frame =
    Frame(graft.ops.Dedup.newUnseen(df, seen.df, keyCol, idCol, seenFpCol))

  /** Source-weighted mixture sampling to a token budget (ops/Sampling
    * passthrough): adds a deterministic `n_copies` epoch count per row
    * and drops rows outside the mixture. */
  def mixtureToBudget(sourceCol: String, keyCol: String, tokensCol: String,
      weights: Map[String, Double], budgetTokens: Long): Frame =
    Frame(graft.ops.Sampling.mixtureToBudget(df, sourceCol, keyCol,
      tokensCol, weights, budgetTokens))

  /** Column profiling (ops/Profile passthrough): per-column row/null/
    * distinct counts and min/max in one aggregation pass. */
  def profile(cols: Seq[String] = Nil, exactDistinct: Boolean = false): Frame =
    Frame(graft.ops.Profile.summarize(df, cols, exactDistinct))

  /** Semantic dedup (ops/Similarity passthrough): keep-first selection
    * over the embedding near-dup relation — survivors keep their
    * original columns. */
  def semanticDedup(idCol: String, vecCol: String,
      threshold: Double = 0.9): Frame =
    Frame(graft.ops.Similarity.semanticDedup(df, idCol, vecCol, threshold))

  /** BPE tokenizer training (ops/TextOps passthrough): learn `numMerges`
    * merge rules from this frame's text column. */
  def bpeMerges(textCol: String = "text", numMerges: Int = 8): Frame =
    Frame(graft.ops.TextOps.bpeMerges(df, textCol, numMerges))

  /** Edit-distance fuzzy pairs (ops/Dedup passthrough): SymSpell
    * deletion-neighborhood join, maxDist 1 or 2. */
  def editDistancePairs(idCol: String, strCol: String,
      maxDist: Int = 1): Frame =
    Frame(graft.ops.Dedup.editDistancePairs(df, idCol, strCol, maxDist))

  /** Cluster-representative dedup (ops/Dedup passthrough): keep the
    * min-id row of every connected near-dup cluster in `pairs`. */
  def representatives(pairs: Frame, idCol: String): Frame =
    Frame(graft.ops.Dedup.representatives(df, pairs.df, idCol))

  /** Time-series resample + forward-fill (ops/TimeSeries passthrough). */
  def resampleFfill(keyCol: String, bucket: Expr, aggs: Seq[Expr],
      fillCols: Seq[String]): Frame =
    Frame(graft.ops.TimeSeries.resampleFfill(df, keyCol, bucket.toColumn,
      aggs.map(named), fillCols))

  /** Cohort retention matrix (ops/TimeSeries passthrough): first-active
    * bucket per entity, survivors per (cohort, period). */
  def cohortRetention(entityCol: String, bucket: Expr): Frame =
    Frame(graft.ops.TimeSeries.cohortRetention(df, entityCol,
      bucket.toColumn))

  /** Rolling z-score outlier detection (ops/TimeSeries passthrough):
    * each row scored against its key's preceding-rows window. */
  def rollingZscore(keyCol: String, orderCols: Seq[Expr], valueCol: String,
      lookback: Int = 20, minPeriods: Int = 10): Frame =
    Frame(graft.ops.TimeSeries.rollingZscore(df, keyCol,
      orderCols.map(_.toColumn), valueCol, lookback, minPeriods))

  /** PageRank over this frame as an edge table (ops/Graph passthrough). */
  def pageRank(srcCol: String, dstCol: String, iterations: Int,
      damping: Double = 0.85): Frame =
    Frame(graft.ops.Graph.pageRank(df, srcCol, dstCol, iterations, damping))

  /** Degree table over this frame as an edge table (ops/Graph
    * passthrough). */
  def degrees(srcCol: String, dstCol: String): Frame =
    Frame(graft.ops.Graph.degrees(df, srcCol, dstCol))

  /** Triangle enumeration over this frame as an undirected edge table
    * (ops/Graph passthrough): one row per triangle, corners ascending. */
  def triangles(srcCol: String, dstCol: String): Frame =
    Frame(graft.ops.Graph.triangles(df, srcCol, dstCol))

  /** Link prediction over this frame as an undirected edge table
    * (ops/Graph passthrough): distance-2 non-edges scored by common
    * neighbors and the fixed-point Resource-Allocation index. */
  def linkPredictions(srcCol: String, dstCol: String,
      maxDegree: Long = 100000): Frame =
    Frame(graft.ops.Graph.linkPredictions(df, srcCol, dstCol, maxDegree))

  /** Exact one-pass covariance/correlation matrix (ops/Profile
    * passthrough). */
  def covarianceMatrix(cols: Seq[String]): Frame =
    Frame(graft.ops.Profile.covarianceMatrix(df, cols))

  /** Densified equi-width histogram (ops/Profile passthrough). */
  def histogram(colName: String, nBins: Int, lo: Double, hi: Double): Frame =
    Frame(graft.ops.Profile.histogram(df, colName, nBins, lo, hi))

  /** PSI drift report vs a reference slice (ops/Profile passthrough):
    * per-bin Population Stability Index contributions of THIS frame
    * against `ref` over the same column. */
  def drift(ref: Frame, colName: String, nBins: Int, lo: Double,
      hi: Double): Frame =
    Frame(graft.ops.Profile.driftReport(ref.df, df, colName, nBins, lo, hi))

  /** TF-IDF keyword extraction (ops/TextOps passthrough): top-k terms
    * per document by quantized tf·idf. */
  def tfidfTopTerms(idCol: String = "doc_id", textCol: String = "text",
      k: Int = 5): Frame =
    Frame(graft.ops.TextOps.tfidfTopTerms(df, idCol, textCol, k))

  /** PMI collocations (ops/TextOps passthrough): top-k bigrams by
    * pointwise mutual information among those seen >= minCount times. */
  def collocations(textCol: String = "text", minCount: Long = 5,
      k: Int = 20): Frame =
    Frame(graft.ops.TextOps.collocations(df, textCol, minCount, k))

  /** Exact repeated-substring spans (ops/Dedup passthrough): maximal
    * shared token spans of length >= minLen across document pairs. */
  def repeatedSpans(idCol: String = "doc_id", textCol: String = "text",
      minLen: Int = 8, maxShingleDf: Long = 64): Frame =
    Frame(graft.ops.Dedup.repeatedSpans(df, idCol, textCol, minLen,
      maxShingleDf))

  /** Duplicated-content fraction (ops/Dedup passthrough): coverage-merged
    * shared-span tokens per document over its token count. */
  def duplicatedTokenStats(idCol: String = "doc_id",
      textCol: String = "text", minLen: Int = 8,
      maxShingleDf: Long = 64): Frame =
    Frame(graft.ops.Dedup.duplicatedTokenStats(df, idCol, textCol, minLen,
      maxShingleDf))

  // ---- scale-control passthroughs -----------------------------------

  /** Plan hint (e.g. "broadcast", "merge", "shuffle_hash", "rebalance") —
    * explicit control where statistics mislead the optimizer. */
  def hint(name: String, params: Any*): Frame = Frame(df.hint(name, params: _*))

  /** Hash-repartition on columns (pre-shuffle for repeated co-located
    * work) or round-robin on a count. */
  def repartition(n: Int, exprs: Expr*): Frame =
    if (exprs.isEmpty) Frame(df.repartition(n))
    else Frame(df.repartition(n, exprs.map(_.toColumn): _*))

  /** Merge to fewer partitions without a shuffle (output sizing). */
  def coalesce(n: Int): Frame = Frame(df.coalesce(n))

  /** Reference-style indented plan printer (reference: logical_plan.rs:113-204
    * is its Display impl — the engine's "EXPLAIN"). Here: Catalyst's plans. */
  def explain(): String = df.queryExecution.toString()
  def explainFormatted(): String = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)

  /** Result surface — the reference returns Vec<RecordBatch> to the caller
    * (physical_plan.rs:8-14); here an action on the lazy plan. */
  def collect(): Array[Row] = df.collect()
  def show(): Unit = df.show(false)
  def count(): Long = df.count()

  /** Sink facade (extension — the reference has no sinks, SURVEY.md §2.5):
    * distributed write, one file per partition; combine with
    * [[repartition]]/[[coalesce]] to control output file count/size.
    * `partitionBy` lays the output out hive-style (col=value directories)
    * so downstream readers get partition pruning for free. */
  def write(path: String, format: String = "parquet",
            mode: String = "overwrite", partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.format(format).mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  private def named(e: Expr): Column = e match {
    case _: Alias | _: Raw | _: ColumnRef => e.toColumn
    case other => other.toColumn.as(other.name) // reference-style auto-name
  }
}

object Frame {
  private val joinId = new java.util.concurrent.atomic.AtomicLong(0L)
}
