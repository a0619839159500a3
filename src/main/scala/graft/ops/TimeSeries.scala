package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: put per-key event streams onto a
  * fixed-step bucket grid and forward-fill the gaps — the resample +
  * ffill step every feature pipeline runs before windowed model inputs.
  *
  * (Extension surface — the reference engine has no time functions at
  * all; this builds on the same event fixtures as the as-of / range
  * join family.)
  */
object TimeSeries {

  /** Epoch-microseconds LONG from a time column, whatever physical form
    * it arrived in: an epoch-nanos LONG (parquet TIMESTAMP(NANOS) read
    * under spark.sql.legacy.parquet.nanosAsLong — driver fixtures of
    * rounds <= 6), or TIMESTAMP / TIMESTAMP_NTZ (the round-7 fixture
    * regeneration ships TIMESTAMP(MICROS)). Integer `div` keeps full
    * precision (a double division would lose bits above 2^53); the
    * NTZ->LTZ cast is an identity wall-clock mapping under the UTC
    * session timezone, so the result equals DuckDB's epoch_us(ts) on
    * the same file. */
  def epochMicros(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr(s"$tsCol div 1000")
      case _ => unix_micros(col(tsCol).cast("timestamp"))
    }

  /** Per-key fixed-step grid from each key's first to last bucket, with
    * the supplied per-bucket aggregates, and the `fillCols` columns
    * forward-filled: a row (gap row OR data-point row whose aggregate
    * is NULL, e.g. sum over all-NULL values) carries the latest earlier
    * non-NULL value — standard ffill semantics; non-NULL aggregates at
    * data points always keep their own value.
    *
    * `bucket` must be an integral column expression over `df`'s rows
    * (e.g. `expr("ts_sec div 3600")` for hourly buckets) — the grid
    * steps by 1 in bucket units, so the caller controls resolution.
    *
    * Scale shape: one partial+final aggregation shuffles (key, bucket);
    * the grid is a per-key `sequence` explode bounded by that key's own
    * span (never a global cartesian with the time axis); the gap join
    * is keyed on (key, bucket); the forward fill is one window per key
    * ordered by bucket. A key whose span is pathologically long
    * concentrates its grid in one window partition — the same watch
    * item as the as-of join, and the same time-range salting applies
    * if it bites. */
  def resampleFfill(df: DataFrame, keyCol: String, bucket: Column,
      aggs: Seq[Column], fillCols: Seq[String]): DataFrame = {
    require(aggs.nonEmpty, "resampleFfill needs at least one aggregate")
    // Round 15 (join-free form): the old shape built the grid as a
    // second aggregate over the per-bucket table and LEFT-joined the
    // per-bucket table back to it — and Catalyst's column pruning
    // specialized the grid branch into its own scan+aggregate over the
    // raw input (2 corpus scans, a grid join, 3 exchanges — plan
    // audit). Instead, each real row expands to itself plus the GAP
    // buckets up to the next real row (lead), which is also exactly
    // the forward-fill: gap rows copy their preceding real row's
    // already-filled values. One scan, the aggregate exchange, one
    // key-partitioned window — no join, and a key's grid now explodes
    // from its gap segments rather than one giant per-key row.
    //
    // Preserved edge semantics of the join form: null-bucket groups
    // joined to no grid row (filtered here before the window so their
    // values cannot leak into a fill); null-KEY grid rows survived the
    // join UNMATCHED — every aggregate null — so all outputs are
    // nulled for a null key; a real row whose fill value is null
    // carries the latest earlier non-null (fill runs on real rows
    // before expansion).
    val perBucket = df.groupBy(col(keyCol), bucket.as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
      .where(col("bucket").isNotNull)
    val aggCols = perBucket.columns.filterNot(c => c == keyCol || c == "bucket")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
    val filled = fillCols.foldLeft(perBucket)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    val outAggs = aggCols.map { c =>
      if (fillCols.contains(c)) when(col(keyCol).isNotNull, col(c)).as(c)
      else when(col(keyCol).isNotNull && col("_b") === col("_rb"), col(c)).as(c)
    }
    filled
      .withColumn("_nxt", lead(col("bucket"), 1).over(w))
      .select(col(keyCol) +: col("bucket").as("_rb") +:
        explode(sequence(col("bucket"),
          coalesce(col("_nxt") - 1, col("bucket")))).as("_b") +:
        aggCols.map(col): _*)
      .select(col(keyCol) +: col("_b").as("bucket") +: outAggs: _*)
  }

  /** Cohort retention matrix: bucket each entity's activity (the
    * `bucket` expression sets the resolution — hour, day, week), define
    * its cohort as its FIRST active bucket, and count how many of each
    * cohort's entities are still active `period` buckets later.
    * `retention` divides by the cohort's own size (its period-0 count —
    * present by construction, since the cohort bucket is itself an
    * activity row).
    *
    * Scale shape: activity collapses to distinct (entity, bucket) in
    * one partial+final aggregation; cohorts are a second entity-keyed
    * aggregation; the join back is entity-keyed (never data-sized on
    * the driver); the final matrix is one (cohort, period) aggregation
    * whose output is bounded by #buckets², independent of row count.
    * The cohort-size attach is a window over that matrix — cohort-sized
    * partitions, trivially small. */
  def cohortRetention(df: DataFrame, entityCol: String,
      bucket: Column): DataFrame = {
    val activity = df
      .select(col(entityCol).as("entity"), bucket.cast("long").as("bucket"))
      .where(col("entity").isNotNull && col("bucket").isNotNull)
      .distinct()
    val cohorts = activity.groupBy(col("entity"))
      .agg(min(col("bucket")).as("cohort"))
    val matrix = activity.join(cohorts, Seq("entity"))
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("period"))
      .agg(count(lit(1)).as("n_active"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matrix
      .withColumn("cohort_size", first(col("n_active")).over(w))
      .select(col("cohort"), col("period"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
  }

  /** Rolling z-score outlier detection: each row's value scored against
    * the mean/stddev of its key's `lookback` PRECEDING rows (the frame
    * excludes the current row, so an outlier can't mask itself). Rows
    * with fewer than `minPeriods` history rows are dropped — their
    * estimates are noise.
    *
    * Cross-engine exactness (the [[Profile.covarianceMatrix]]
    * convention): the frame's Σx accumulates in DECIMAL(18,2) and Σx²
    * in DECIMAL(28,8) — exact, order-independent — and only the final
    * per-row mean/variance/z arithmetic runs in doubles, a fixed IEEE
    * sequence any engine reproduces token-for-token; z rounds to 6dp.
    * Spark's own stddev over a window streams doubles in frame order
    * and is NOT cross-engine stable.
    *
    * NULL values occupy frame SLOTS (the frame is row-based) but are
    * excluded from every moment — `n_hist` counts non-null history, so
    * the minPeriods gate is about real evidence, not elapsed rows; a
    * NULL-valued row itself scores z = NULL.
    *
    * Scale shape: one shuffle on the key, one window pass computing all
    * three frame aggregates together; everything after is per-row
    * projection. A pathologically hot key concentrates its rows in one
    * window partition — the as-of join's salting pattern applies if a
    * key's row count outgrows a task. */
  def rollingZscore(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      valueCol: String, lookback: Int = 20, minPeriods: Int = 10):
      DataFrame = {
    require(lookback >= minPeriods && minPeriods >= 2,
      s"need lookback >= minPeriods >= 2, got $lookback/$minPeriods")
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val dec8 = org.apache.spark.sql.types.DecimalType(28, 8)
    val v = col(valueCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(-lookback.toLong, -1L)
    // all three frame moments in ONE select so CollapseWindow keeps a
    // single Window operator (a withColumn chain interleaves Projects
    // that block the merge — three passes over the sorted partition)
    val scored = df
      .select(df.columns.map(col) ++ Seq(
        count(v).over(w).as("n_hist"),
        sum(v.cast(dec2)).over(w).cast("double").as("__s"),
        sum((v * v).cast(dec8)).over(w).cast("double").as("__s2")): _*)
      .where(col("n_hist") >= minPeriods)
    val mean = col("__s") / col("n_hist")
    val variance = greatest(
      col("__s2") / col("n_hist") - mean * mean, lit(0.0))
    scored
      .withColumn("mean_hist", round(mean, 6))
      // zero-variance history (all-equal values) gets NULL, not ±inf/NaN
      // — engines disagree on IEEE edge signs, and NULL is the honest
      // answer for "no spread to score against"
      .withColumn("z",
        when(variance > 0.0, round((v - mean) / sqrt(variance), 6)))
      .withColumn("is_outlier", coalesce(abs(col("z")) > 3.0, lit(false)))
      .drop("__s", "__s2")
  }

  /** Coalesce overlapping-or-touching `[startCol, endCol)` intervals
    * per key into maximal disjoint spans (gaps-and-islands) — uptime /
    * coverage windows from session spans, attribution-window flattening
    * before a containment join, de-overlapping validity history. An
    * interval starting exactly where another ends TOUCHES it and
    * merges (half-open semantics: there is no gap between them).
    *
    * Island detection is the classic running-max form: a new island
    * starts when an interval's start exceeds the max end seen so far
    * in its key's start order. With duplicate (start, end) rows the
    * running max is tie-order-insensitive (equal rows contribute equal
    * prefixes), so the islands — and therefore the output — are
    * deterministic with no tie-break column needed.
    *
    * Scale shape: ONE key-keyed shuffle feeds both windows (running
    * max and island numbering share the same partitioning+sort) and
    * the closing (key, island) aggregation — intervals per key stream
    * through a single sort, nothing global. Output: (keyCol, start,
    * end, n_merged). */
  /** Growth accounting over integer activity buckets: per bucket, how
    * many entities were active, and of those how many were NEW (first
    * bucket ever), RETAINED (active in the immediately preceding
    * bucket) or RESURRECTED (returning after a gap); plus CHURNED —
    * entities active in the preceding bucket who did not return. The
    * classic DAU/MAU decomposition (new + retained + resurrected =
    * active; churned balances the previous bucket). Buckets are plain
    * integers (day numbers, month indexes) — calendar semantics are
    * the caller's bucketing choice.
    *
    * Exact set arithmetic on integers — nothing to round. Churn needs
    * the PRECEDING bucket's active count, attached by a bucket-level
    * self-join on (bucket - 1) — correct even when a bucket has zero
    * activity rows (its successor then reports churned = 0 because no
    * preceding row exists, matching "nobody was there to churn").
    *
    * Scale shape: activity collapses to distinct (entity, bucket)
    * FIRST (the cohortRetention rule), one per-entity window orders
    * its buckets, and everything after runs at bucket cardinality. */
  def growthAccounting(df: DataFrame, entityCol: String,
      bucketCol: String): DataFrame = {
    val act = df.select(col(entityCol).as("e"),
        col(bucketCol).cast("long").as("b"))
      .where(col("e").isNotNull && col("b").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("e")).orderBy(col("b"))
    val per = act
      .withColumn("prev", lag(col("b"), 1).over(w))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prev") === col("b") - 1, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev").isNotNull && col("prev") < col("b") - 1, 1L)
          .otherwise(0L)).as("n_resurrected"))
    // bucket-level self-join (renamed — derived-frame lineage) attaches
    // the preceding bucket's active count for the churn balance
    val prevActive = per.select((col("b") + 1).as("b"),
      col("n_active").as("__prev_active"))
    per.join(prevActive, Seq("b"), "left")
      .select(col("b").as("bucket"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        (coalesce(col("__prev_active"), lit(0L)) - col("n_retained"))
          .as("n_churned"))
  }

  /** Markov transition counts over per-key event sequences: one row
    * per (from_state, to_state) with the number of adjacent
    * occurrences across all keys — the flow matrix behind funnel
    * diagrams and next-action models. `tieCols` complete the per-key
    * total order (the [[timeWeightedAvg]] rule: an ambiguous order
    * would make the adjacency partitioning-dependent).
    *
    * Scale shape: one key-keyed shuffle for the lead() window, then a
    * states²-bounded (tiny) count aggregation. */
  def transitions(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).toIndexedSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df
      .withColumn("__to", lead(col(stateCol), 1).over(w))
      .where(col("__to").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__to").as("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** The `depth`-step paths leading into a target state, counted
    * corpus-wide: for every event whose state equals `target`, the
    * '>'-joined sequence of the `depth` states immediately before it
    * on the same key's timeline (shorter if history runs out) — "what
    * do users do right before they buy". Paths come back as sortable
    * strings (the comparator convention) with their frequencies.
    *
    * Scale shape: one key-keyed shuffle for the lag() chain window;
    * the path aggregation is path-cardinality-bounded. */
  def pathsBefore(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, target: String, depth: Int = 3,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(depth >= 1 && depth <= 8, "depth must be in 1..8")
    val order = (col(tsCol) +: tieCols.map(col)).toIndexedSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val lags = (depth to 1 by -1).map(d => lag(col(stateCol), d).over(w))
    df
      .withColumn("__path", concat_ws(">", lags.toIndexedSeq: _*))
      .where(col(stateCol) === target && col("__path") =!= "")
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-key time-weighted average of a step function: each event's
    * value holds from its own timestamp until the key's next event
    * (the monitoring-metric form — a gauge sampled at irregular times,
    * where the plain AVG over-weights chatty periods). The key's last
    * event opens no interval and contributes nothing; keys with a
    * single event produce no row.
    *
    * Determinism contract: `tieCols` must complete (`tsUsCol` ++
    * tieCols) into a total order per key — with timestamp ties left
    * ambiguous, WHICH value carries the zero-length slot would be
    * partitioning-dependent. The weighted sum runs in exact BIGINT
    * fixed point: values quantized to cents (1e2), durations floored
    * to whole seconds (documented quantization; cents × a month of
    * seconds × thousands of events stays far under 2^63), and the
    * single final `(Σ v·d) / (Σ d) / 100` is two IEEE divisions of
    * exact integers — bit-reproducible on any engine.
    *
    * Scale shape: one key-keyed shuffle for the lead() window, then
    * the same partitioning feeds the per-key aggregation. Output:
    * (keyCol, n_steps, sum_dur_s, twa). */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsUsCol: String,
      valueCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val order = (col(tsUsCol) +: tieCols.map(col)).toIndexedSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    df
      .withColumn("__next_us", lead(col(tsUsCol), 1).over(w))
      .where(col("__next_us").isNotNull)
      .withColumn("__dur_s",
        expr(s"(__next_us - $tsUsCol) div 1000000"))
      .withColumn("__v_cents",
        round(col(valueCol).cast(
          org.apache.spark.sql.types.DecimalType(18, 2)) * 100, 0)
          .cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_steps"),
        sum(col("__dur_s")).as("sum_dur_s"),
        sum(col("__v_cents") * col("__dur_s")).as("__sum_vd"))
      .where(col("sum_dur_s") > 0)
      .select(col(keyCol), col("n_steps"), col("sum_dur_s"),
        (col("__sum_vd").cast("double") / col("sum_dur_s").cast("double")
          / lit(100.0)).as("twa"))
  }

  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val wPrev = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df
      .withColumn("__prev_max", max(col(endCol)).over(wPrev))
      .withColumn("__new_island",
        when(col("__prev_max").isNull ||
          col(startCol) > col("__prev_max"), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new_island")).over(wRun))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }

  /** Per-key lag-k autocorrelation — the seasonality/momentum detector
    * (is this metric self-similar hour over hour?). Pairs each value
    * with its k-back neighbor on a TOTAL order, then computes Pearson
    * correlation over the pairs from EXACT BIGINT moment sums
    * (n, Σu, Σv, Σuv, Σu², Σv² on quantized units) with one fixed IEEE
    * final chain — the cancellation-free [[graft.ops.Profile]] moment
    * rule, so any engine lands on the identical double. Groups with
    * fewer than k+2 points, or zero variance on either side, emit NULL.
    *
    * Scale shape: one key shuffle feeds the lag window and the moment
    * aggregation; output is one row per key. NULL/NaN values are
    * excluded before pairing (a NULL would silently break the k-back
    * distance). */
  def autocorr(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      valueCol: String, lagK: Int, scale: Int = 2): DataFrame = {
    require(lagK >= 1, "lagK must be positive")
    val unit = round(col(valueCol).cast(
        org.apache.spark.sql.types.DecimalType(18, scale))
        * math.pow(10, scale).toLong, 0).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.where(col(valueCol).isNotNull &&
        !isnan(col(valueCol).cast("double")))
      .withColumn("__u", unit)
      .withColumn("__v", lag(col("__u"), lagK).over(w))
      .where(col("__v").isNotNull)
      .groupBy(col(keyCol))
      // moment products in DECIMAL(38,0): per-row u·v and the Pearson
      // products n·Σu² / (Σu)² overflow BIGINT at realistic key sizes
      // (1e6 pairs of ~100.00 values already wraps (Σu)² — ADVICE-class,
      // r11 self-review); decimal keeps them exact for |unit| ≤ ~1e9
      // and n_pairs ≤ ~1e9 (every product ≤ 1e36 < 1e38), and the final
      // double casts round the same values the long path produced
      // wherever the long path was in range
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__u")).as("su"), sum(col("__v")).as("sv"),
        sum(col("__u").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("__v")).as("suv"),
        sum(col("__u").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("__u")).as("su2"),
        sum(col("__v").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("__v")).as("sv2"))
      .select(col(keyCol), col("n_pairs"),
        expr("CASE WHEN CAST(n_pairs AS DECIMAL(38,0)) * su2" +
          " - CAST(su AS DECIMAL(38,0)) * su = 0" +
          " OR CAST(n_pairs AS DECIMAL(38,0)) * sv2" +
          " - CAST(sv AS DECIMAL(38,0)) * sv = 0 THEN NULL" +
          " ELSE CAST(CAST(n_pairs AS DECIMAL(38,0)) * suv" +
          " - CAST(su AS DECIMAL(38,0)) * sv AS DOUBLE)" +
          " / (sqrt(CAST(CAST(n_pairs AS DECIMAL(38,0)) * su2" +
          " - CAST(su AS DECIMAL(38,0)) * su AS DOUBLE))" +
          " * sqrt(CAST(CAST(n_pairs AS DECIMAL(38,0)) * sv2" +
          " - CAST(sv AS DECIMAL(38,0)) * sv AS DOUBLE))) END")
          .as("autocorr"))
  }

  /** Per-key EWMA with EXACT dyadic weights — the smoothing gauge
    * (latency trend, spend trend) stated so no engine can disagree:
    * over each row's trailing window of up to `lookback` values
    * (ordered by (`orderCols`), a total order), the weights are the
    * normalized powers of two
    *
    *   w_j = 2^(j-1) / (2^m - 1),   j = 1 (oldest) .. m (newest)
    *
    * — i.e. alpha = 1/2 smoothing with the tail mass folded into the
    * normalization instead of an infinite history. Everything is BIGINT
    * (value quantized to `scale` decimals, shifts, one truncating
    * micros divide): classic float EWMA accumulates 1-ulp drift per
    * step and diverges across engines/orders; this form cannot.
    *
    * Scale shape: one key shuffle, one window pass building the bounded
    * trailing list, then per-row fold over ≤ lookback elements —
    * codegen'd higher-order functions, no UDF. `lookback` ≤ 32 keeps
    * every shift and sum in comfortable BIGINT range (weights ≤ 2^31).
    * Output: input keys/order plus `value_unit` and `ewma_unit_micros`
    * (the smoothed value in quantized units, micro precision). */
  def ewmaDyadic(df: DataFrame, keyCol: String, orderCols: Seq[Column],
      valueCol: String, lookback: Int, scale: Int = 2): DataFrame = {
    require(lookback >= 1 && lookback <= 32, "lookback must be in 1..32")
    val unit = round(col(valueCol).cast(
        org.apache.spark.sql.types.DecimalType(18, scale))
        * math.pow(10, scale).toLong, 0).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(-(lookback - 1), 0)
    // NULL/NaN rows are excluded BEFORE windowing (they'd silently
    // shrink lists via collect_list's null-skipping while other engines
    // keep them — the one place the two conventions diverge)
    df.where(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .withColumn("value_unit", unit)
      .withColumn("__l", collect_list(col("value_unit")).over(w))
      .withColumn("__s", expr("aggregate(" +
        "transform(__l, (v, i) -> v * shiftleft(1L, i)), 0L," +
        " (a, x) -> a + x)"))
      .withColumn("__d", expr("shiftleft(1L, size(__l)) - 1L"))
      // quotient-and-remainder split of (10^6·S) div D: multiplying the
      // FULL weighted sum by 10^6 first overflowed BIGINT once
      // |unit| ≥ ~2150 at lookback 32 (ADVICE-class, r11 self-review);
      // the split is the identical truncating quotient — 10^6·S =
      // 10^6·q·D + 10^6·r with every term sharing S's sign — and the
      // remainder term stays under 2^52, so the op is now exact for
      // |unit| up to ~2^31 at the max lookback, the range the scaladoc
      // always claimed
      .withColumn("ewma_unit_micros", expr(
        "(__s div __d) * 1000000L + ((__s % __d) * 1000000L) div __d"))
      .drop("__l", "__s", "__d")
  }
}
