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
    if (direction == "forward") {
      // exact reduction: forward on t IS backward on -t. "earliest right
      // with r.t >= l.t" == "latest right with r.(-t) <= l.(-t)", and the
      // tolerance band |lt - rt| is symmetric under negation. The salted
      // path only needs a monotonic long cast, which -cast(t) is.
      val l2 = left.withColumn("_negt", -col(timeCol).cast("long"))
      val r2 = right.withColumn("_negt", -col(timeCol).cast("long"))
      return asOfOn(l2, r2, keyCol, "_negt", payloadCols, saltBuckets,
        tolerance).drop("_negt")
    }
    asOfOn(left, right, keyCol, timeCol, payloadCols, saltBuckets, tolerance)
  }

  /** The backward-direction core, windowing on `timeCol` as given. */
  private def asOfOn(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      saltBuckets: Int, tolerance: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_tag", "_r", "_asof", "_b", "_last", "_carry") ++
      payloadCols.map("asof_" + _)
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with reserved as-of names: " +
        leftCols.filter(reserved.contains).mkString(", "))
    require(!payloadCols.contains("_grft_mt"),
      "payload column name _grft_mt is reserved for the tolerance check")
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
      // across retries; struct ordering makes last() pick the max payload
      val w = Window.partitionBy(partCols.map(col): _*)
        .orderBy(col(timeCol), col("_tag"), col("_r").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // tolerance: the carried distance is lt - mt >= 0 by construction
      // (on the negated axis for forward joins, where it equals rt - lt);
      // outside the band the payload nulls out but the left row survives
      val within = tolerance match {
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
    // observed span -> B fixed-width buckets (2 driver scalars, one agg)
    val mm = unioned.select(col(timeCol).cast("long").as("_t"))
      .where(col("_t").isNotNull).agg(min("_t"), max("_t")).head()
    if (mm.isNullAt(0)) return finish(unioned, Seq(keyCol)) // no usable times
    val (tmin, tmax) = (mm.getLong(0), mm.getLong(1))
    val width = (tmax - tmin) / saltBuckets + 1 // >= 1, covers tmax
    val withB = unioned.withColumn("_b",
      ((col(timeCol).cast("long") - lit(tmin)) / lit(width)).cast("long"))
    // latest right row per (key, bucket): max struct(time, payload) is
    // exactly the row last() would carry (same (time, _r) tie-break)
    val rb = withB.where(col("_tag") === 0)
      .groupBy(col(keyCol), col("_b"))
      .agg(max(struct(col(timeCol).as("t"), col("_r").as("r"))).as("_last"))
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
    // ORIGINAL time: strictly earlier than every in-bucket time (the cast
    // is monotonic), so it sorts first in the bucket's window and any real
    // in-bucket right row at or before a left row correctly wins over it
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
