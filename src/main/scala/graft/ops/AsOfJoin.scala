package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, attach the latest right row
  * with the same key whose time is <= the left row's time.
  *
  * Spark has no native as-of join; a naive formulation is a range
  * theta-join (quadratic per key). This implementation is the
  * single-shuffle union trick instead:
  *
  *   1. tag left rows 1, right rows 0, union them;
  *   2. one window partitioned by key, ordered by (time, tag) —
  *      `last(payload, ignoreNulls)` over unbounded-preceding..current
  *      carries the most recent right payload forward (at equal times the
  *      right row sorts first, so ties match, like `ON l.t >= r.t`);
  *   3. keep only the left rows.
  *
  * Cost: ONE shuffle on the key column — the same cost as any keyed
  * aggregation, no join blowup, no range comparison per pair.
  *
  * SKEW (`saltBuckets`, VERDICT r3 ask #7): the plain form puts a key's
  * ENTIRE history in one window partition — a single hot key (one user
  * with a billion events) lands on one task. `saltBuckets = B > 1` splits
  * every key's window by TIME RANGE instead: the observed time span is cut
  * into B fixed-width buckets, each (key, bucket) windows independently,
  * and a tiny carry pre-pass (per-(key,bucket) latest right row, then a
  * B-row-per-key running max) injects "the latest right row from any
  * earlier bucket" as one synthetic row per bucket, preserving exact
  * semantics. The hot key's history now spreads over B tasks; the
  * pre-pass shuffles only (key, bucket)-cardinality rows, never data.
  * Requires a time column with a monotonic cast to long (numeric or
  * timestamp — bucketing only needs order preservation, not precision).
  *
  * (Extension surface — the reference engine has only an inner equi-join,
  * reference: src/physical_plan/nested_loop_join.rs:62-191.)
  */
object AsOfJoin {

  /** @param left        rows to enrich
    * @param right       rows providing the carried payload
    * @param keyCol      equi-key present in both sides
    * @param timeCol     monotonic order column present in both sides
    * @param payloadCols right-side columns to carry (become `asof_<name>`)
    * @param saltBuckets > 1 splits each key's window into that many
    *                    time-range buckets (skew defense, same result)
    * @param direction   "backward" (latest right at or before the left
    *                    time — the default) or "forward" (earliest right
    *                    at or after it)
    * @param tolerance   maximum |left time - matched right time| in units
    *                    of the time column's long cast (seconds for
    *                    timestamps, native units for numerics); a match
    *                    farther away yields nulls, like pandas merge_asof
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      saltBuckets: Int = 1, direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asOf direction must be 'backward' or 'forward', got '$direction'")
    // a negative tolerance would silently null every carried payload
    // (lt - mt >= 0 by construction) — a caller sign error must fail
    // fast, not masquerade as "no right data matched" (review r12)
    require(tolerance.forall(_ >= 0L),
      s"tolerance must be non-negative, got ${tolerance.get}")
    asOfOn(left, right, keyCol, timeCol, payloadCols, saltBuckets,
      tolerance, forward = direction == "forward")
  }

  /** The windowed core. `forward = true` runs the SAME carry logic over
    * the time-descending window — "earliest right with r.t >= l.t" is
    * "latest preceding right" in descending order. The window orders by
    * the RAW time column in both directions (review r12: the old
    * forward reduction negated `cast(t as long)`, whose truncation —
    * whole seconds for timestamps, floor for fractional numerics —
    * collapsed distinct times, matching right rows strictly BEFORE the
    * left time and mis-picking among sub-second candidates; a cast used
    * for ordering must be injective, and this one was not). */
  private def asOfOn(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      saltBuckets: Int, tolerance: Option[Long],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_tag", "_r", "_asof", "_b", "_last", "_carry") ++
      payloadCols.map("asof_" + _)
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with reserved as-of names: " +
        leftCols.filter(reserved.contains).mkString(", "))
    // payload columns named after the internals would be silently
    // clobbered by the tagging withColumns before the payload struct
    // resolves (review r12) — reject them like the left-side collisions
    require(!payloadCols.exists(c => reserved.contains(c) || c == "_grft_mt"),
      s"payload columns collide with reserved as-of names: " +
        payloadCols.filter(c => reserved.contains(c) || c == "_grft_mt")
          .mkString(", "))
    // the whole right payload travels as ONE struct: last(_, ignoreNulls)
    // then selects the latest right ROW atomically — per-column carrying
    // would resurrect an older value when the latest right row holds a
    // null, and could even stitch fields from different right rows.
    // The matched right time rides along as the LAST struct field (so the
    // struct-ordering tiebreak among same-(time, tag) rows is unchanged —
    // the field is equal across any such tie) for the tolerance check.
    val payloadStruct = struct(payloadCols.map(c => col(c).as(c)) :+
      col(timeCol).cast("long").as("_grft_mt"): _*)
    val structType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)) :+
        org.apache.spark.sql.types.StructField("_grft_mt",
          org.apache.spark.sql.types.LongType, nullable = true))
    val lAligned = left.withColumn("_tag", lit(1))
      .withColumn("_r", lit(null).cast(structType))
    val rAligned = leftCols.foldLeft(
      right.select((keyCol +: timeCol +: payloadCols).distinct.map(col): _*)
        // a NULL key or time can never legitimately match under SQL
        // `l.k = r.k AND l.t >= r.t` semantics — but asc-nulls-first
        // ordering would sort such rows before everything and leak their
        // payload into every left row, so drop them up front
        .where(col(keyCol).isNotNull && col(timeCol).isNotNull)
        .withColumn("_tag", lit(0))
        .withColumn("_r", payloadStruct))((df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lAligned.columns.map(col): _*)
    val unioned = lAligned.unionByName(rAligned)

    def finish(df: DataFrame, partCols: Seq[String]): DataFrame = {
      // final `_r` tiebreaker: several right rows at the same (key, time)
      // would otherwise resolve by physical row order — nondeterministic
      // across retries; struct ordering makes last() pick the max payload.
      // Forward runs the identical carry over the DESC window: nulls
      // still sort first (a null-time left row must precede every right
      // row and match nothing, exactly as in the asc default)
      val tOrd = if (forward) col(timeCol).desc_nulls_first else col(timeCol)
      val w = Window.partitionBy(partCols.map(col): _*)
        .orderBy(tOrd, col("_tag"), col("_r").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // tolerance: the carried distance is lt - mt >= 0 backward and
      // mt - lt >= 0 forward, both in the time column's long-cast units;
      // outside the band the payload nulls out but the left row survives
      val within = tolerance match {
        case Some(t) if forward =>
          col("_asof._grft_mt") - col(timeCol).cast("long") <= lit(t)
        case Some(t) =>
          col(timeCol).cast("long") - col("_asof._grft_mt") <= lit(t)
        case None => lit(true)
      }
      df.withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
        .where(col("_tag") === 1)
        .select((leftCols.map(col) ++ payloadCols.map(c =>
          when(within, col(s"_asof.$c")).as(s"asof_$c"))): _*)
    }

    if (saltBuckets <= 1) return finish(unioned, Seq(keyCol))

    // ---- time-range salted path ------------------------------------
    // observed span -> B fixed-width buckets (2 driver scalars, one agg).
    // Bucketing needs a MONOTONE long image only (equal images share a
    // bucket, which is harmless): cast(t as long), flipped with the
    // overflow-free bitwise_not for forward joins so ascending bucket
    // ids follow the DESC window order and ONE carry direction serves
    // both directions (the old `-cast(t)` flip corrupted Long.MinValue)
    val bImg0 = col(timeCol).cast("long")
    val bImg = if (forward) bitwise_not(bImg0) else bImg0
    val mm = unioned.select(bImg.as("_t"))
      .where(col("_t").isNotNull).agg(min("_t"), max("_t")).head()
    if (mm.isNullAt(0)) return finish(unioned, Seq(keyCol)) // no usable times
    val (tmin, tmax) = (mm.getLong(0), mm.getLong(1))
    val width = (tmax - tmin) / saltBuckets + 1 // >= 1, covers tmax
    val withB = unioned.withColumn("_b",
      ((bImg - lit(tmin)) / lit(width)).cast("long"))
    // the right row each bucket contributes = exactly the row last()
    // would carry out of it in WINDOW order. Backward: latest time, max
    // payload at ties — one map-side-combinable max(struct). Forward:
    // EARLIEST time with max payload at ties — min-then-max has no
    // single-aggregate form over the truncated image (sub-second
    // candidates must resolve on the RAW time), so it runs as a rank-1
    // window instead; InferWindowGroupLimit bounds its exchange at one
    // row per (task, key, bucket)
    // `_last` leads with the row's own bucket image `i`: the cross-
    // bucket running max below must rank candidate buckets in WINDOW
    // order (largest time backward, smallest time forward), and images
    // from different buckets are strictly ordered by construction —
    // raw-time-first struct ordering would pick the latest time in both
    // directions, carrying the wrong (farthest) row on forward joins
    val rb = if (!forward)
      withB.where(col("_tag") === 0)
        .groupBy(col(keyCol), col("_b"))
        .agg(max(struct(col(timeCol).as("t"), col("_r").as("r"))).as("_m"))
        .select(col(keyCol), col("_b"),
          struct(col("_m.t").cast("long").as("i"), col("_m.t").as("t"),
            col("_m.r").as("r")).as("_last"))
    else {
      val w1 = Window.partitionBy(col(keyCol), col("_b"))
        .orderBy(col(timeCol).asc, col("_r").desc_nulls_last)
      withB.where(col("_tag") === 0)
        .withColumn("_rn", row_number().over(w1))
        .where(col("_rn") === 1)
        .select(col(keyCol), col("_b"),
          struct(bitwise_not(col(timeCol).cast("long")).as("i"),
            col(timeCol).as("t"), col("_r").as("r")).as("_last"))
    }
    // carry INTO bucket b = running max over strictly earlier buckets, on
    // the full (key, bucket) grid (left-only buckets still need a carry).
    // Window size <= saltBuckets rows per key — driver-small per task.
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = withB.select(col(keyCol), col("_b")).distinct()
      .join(rb, Seq(keyCol, "_b"), "left")
      .withColumn("_carry", max(col("_last")).over(wCarry))
      .where(col("_carry").isNotNull)
    // one synthetic right row per (key, bucket), at the carried row's
    // ORIGINAL time: strictly outside every in-bucket time on the
    // window-order side (the bucket image is monotone, and equal images
    // share a bucket, so a carried row's time is strictly earlier —
    // strictly later for forward — than all in-bucket times), so it
    // sorts first in the bucket's window and any real in-bucket right
    // row at or before (at or after, forward) a left row wins over it
    val carryRows = carries.select(lAligned.columns.map {
      case "_tag" => lit(0).as("_tag")
      case "_r" => col("_carry.r").as("_r")
      case c if c == keyCol => col(keyCol)
      case c if c == timeCol => col("_carry.t").as(timeCol)
      case c => lit(null).cast(left.schema(c).dataType).as(c)
    } :+ col("_b"): _*)
    finish(withB.unionByName(carryRows), Seq(keyCol, "_b"))
  }
}
