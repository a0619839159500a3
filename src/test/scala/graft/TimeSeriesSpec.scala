package graft

import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleFfill fills gap buckets with the latest earlier value") {
    // user 1: buckets 10 and 13 (gap 11, 12); user 2: single bucket
    val ev = Seq((1L, 10L, 5.0), (1L, 10L, 3.0), (1L, 13L, 7.0),
      (2L, 20L, 1.0)).toDF("user_id", "b", "value")
    val out = TimeSeries.resampleFfill(ev, "user_id", col("b"),
        aggs = Seq(count(lit(1)).as("n"), sum("value").as("v")),
        fillCols = Seq("v"))
      .select(col("user_id"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"), col("v"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 10L, 2L, 8.0),  // data point keeps its own aggregate
      (1L, 11L, 0L, 8.0),  // gap carries the latest earlier value
      (1L, 12L, 0L, 8.0),
      (1L, 13L, 1L, 7.0),  // next data point overrides
      (2L, 20L, 1L, 1.0))) // single-bucket key: grid of one
  }

  test("resampleFfill grid is bounded per key, not global") {
    val ev = Seq((1L, 0L, 1.0), (1L, 2L, 1.0),
      (2L, 1000L, 1.0), (2L, 1001L, 1.0)).toDF("user_id", "b", "value")
    val n = TimeSeries.resampleFfill(ev, "user_id", col("b"),
      aggs = Seq(sum("value").as("v")), fillCols = Seq("v")).count()
    // 3 buckets for key 1 (0..2) + 2 for key 2 (1000..1001) — NOT
    // 1002 x 2 rows of a global time-axis product
    assert(n == 5)
  }

  test("cohortRetention counts survivors against the first-bucket size") {
    // cohort 10: users 1,2,3 — all at 10; 1,2 at 11; 1 at 13
    // cohort 11: user 4 — at 11 and 13; duplicate activity collapses
    val ev = Seq((1L, 10L), (1L, 10L), (1L, 11L), (1L, 13L),
      (2L, 10L), (2L, 11L), (3L, 10L),
      (4L, 11L), (4L, 13L)).toDF("user_id", "b")
    val got = TimeSeries.cohortRetention(ev, "user_id", col("b"))
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (10L, 0L, 3L, 3L, 1.0),
      (10L, 1L, 2L, 3L, 0.666667),
      (10L, 3L, 1L, 3L, 0.333333),
      (11L, 0L, 1L, 1L, 1.0),
      (11L, 2L, 1L, 1L, 1.0)))
  }

  test("rollingZscore scores against preceding rows only") {
    // key 1: nine 10.0s then a 20.0 spike, lookback covers all history.
    // The spike's own value must NOT enter its frame (else it would
    // drag the mean and mask itself); history variance is zero -> the
    // stable rows have NULL z, and the spike also scores NULL (no
    // spread). Add jitter history for key 2 to get a real z.
    val base = (1 to 9).map(i => (1L, i.toLong, 10.0))
    val spike = Seq((1L, 10L, 20.0))
    val jitter = (1 to 10).map(i =>
      (2L, i.toLong, if (i % 2 == 0) 12.0 else 8.0))
    val probe = Seq((2L, 11L, 30.0))
    val df = (base ++ spike ++ jitter ++ probe).toDF("k", "t", "value")
    val out = TimeSeries.rollingZscore(df, "k", Seq(col("t")), "value",
        lookback = 20, minPeriods = 9)
      .select(col("k"), col("t"), col("n_hist"), col("mean_hist"),
        col("z"), col("is_outlier"))
      .as[(Long, Long, Long, Double, Option[Double], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    // key 1 spike: 9 rows of history, all 10.0 -> zero variance, NULL z
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._3, r._4, r._5, r._6))
      .toSeq == Seq((10L, 9L, 10.0, None, false)))
    // key 2 probe: mean 10, pop-std 2 -> z = (30-10)/2 = 10, outlier
    val probeRow = out.filter(r => r._1 == 2L && r._2 == 11L).head
    assert(probeRow._3 == 10L && probeRow._4 == 10.0 &&
      probeRow._5.contains(10.0) && probeRow._6)
    // rows with fewer than minPeriods history rows are dropped
    assert(!out.exists(r => r._3 < 9L))
  }

  test("rollingZscore: NULL values occupy frame slots but don't count as history") {
    // 12 rows; row 6's value is NULL. For later rows the NULL sits in
    // the 5-row frame window, shrinking n_hist below the slot count —
    // and the NULL row itself scores z = NULL but still appears once
    // it has enough history.
    val rows = (1 to 12).map(t =>
      (1L, t.toLong, if (t == 6) None else Some(t * 1.0 + (t % 3) * 0.5)))
    val df = rows.toDF("k", "t", "value")
    val out = TimeSeries.rollingZscore(df, "k", Seq(col("t")), "value",
        lookback = 5, minPeriods = 4)
      .select(col("t"), col("n_hist"), col("z"))
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // t=7..10: frame covers t-5..t-1 which includes the NULL at 6
    assert(out(7)._1 == 4L && out(8)._1 == 4L && out(10)._1 == 4L)
    assert(out(12)._1 == 5L)           // NULL aged out of the frame
    assert(out(6)._2.isEmpty)          // NULL value scores NULL
    assert(out(6)._1 == 5L)            // but its history was full
    assert(!out.contains(4L))          // 3 non-null history rows < minPeriods
    assert(out.contains(5L))           // 4 non-null history rows passes
  }

  test("rollingZscore matches a brute-force reference on random data") {
    val rng = new scala.util.Random(7)
    val rows = for (k <- 1 to 3; t <- 1 to 40)
      yield (k.toLong, t.toLong, rng.nextInt(2000) / 100.0)
    val df = rows.toDF("k", "t", "value")
    val got = TimeSeries.rollingZscore(df, "k", Seq(col("t")), "value",
        lookback = 12, minPeriods = 5)
      .select(col("k"), col("t"), col("z"))
      .as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val byKey = rows.groupBy(_._1)
    var checked = 0
    for (((k, t), z) <- got) {
      val hist = byKey(k).filter(r => r._2 >= t - 12 && r._2 < t)
        .map(_._3)
      assert(hist.size >= 5)
      val mean = hist.sum / hist.size
      val variance = hist.map(x => x * x).sum / hist.size - mean * mean
      val v = byKey(k).find(_._2 == t).get._3
      if (variance > 0) {
        val expect = (v - mean) / math.sqrt(variance)
        assert(z.isDefined && math.abs(z.get - expect) < 1e-4,
          s"key $k t $t: got $z want $expect")
      } else assert(z.isEmpty)
      checked += 1
    }
    assert(checked == 3 * (40 - 5))
  }

  test("growthAccounting: new/retained/resurrected partition active; churn balances") {
    import spark.implicits._
    // u1: days 1,2,4 (new, retained, resurrected)
    // u2: days 1,2,3 ; u3: day 2 only ; u4: day 4 only
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 4L),
      (2L, 1L), (2L, 2L), (2L, 3L), (3L, 2L), (4L, 4L),
      (1L, 2L)) // duplicate activity row collapses
      .toDF("u", "d")
    val got = graft.ops.TimeSeries.growthAccounting(rows, "u", "d")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // day 1: active{1,2} both new
    assert(got(1L) == (1L, 2L, 2L, 0L, 0L, 0L))
    // day 2: active{1,2,3}; 1,2 retained; 3 new; churn 2-2=0
    assert(got(2L) == (2L, 3L, 1L, 2L, 0L, 0L))
    // day 3: active{2} retained; churned = 3 - 1 = 2 (users 1 and 3)
    assert(got(3L) == (3L, 1L, 0L, 1L, 0L, 2L))
    // day 4: active{1,4}; 1 resurrected, 4 new; churned = 1 - 0 = 1
    assert(got(4L) == (4L, 2L, 1L, 0L, 1L, 1L))
    // invariant: new + retained + resurrected == active, every bucket
    got.values.foreach { r =>
      assert(r._3 + r._4 + r._5 == r._2, s"decomposition broke: $r") }
  }

  test("transitions: adjacency per key, none across keys, tie order") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (1L, 30L, 4L, "c"),   // tie at 30: a precedes c by eid
      (2L, 5L, 5L, "b"))    // lone event: no transition
      .toDF("k", "t", "eid", "s")
    val got = graft.ops.TimeSeries.transitions(rows, "k", "t", "s",
        tieCols = Seq("eid"))
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 1L), ("b", "a", 1L), ("a", "c", 1L)))
  }

  test("pathsBefore: depth window, short histories shrink, target only") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"), (1L, 3L, 3L, "cart"),
      (1L, 4L, 4L, "buy"),                       // path view>click>cart
      (2L, 1L, 5L, "click"), (2L, 2L, 6L, "buy"), // short: just click
      (3L, 1L, 7L, "buy"))                        // no history: excluded
      .toDF("k", "t", "eid", "s")
    val got = graft.ops.TimeSeries.pathsBefore(rows, "k", "t", "s",
        target = "buy", depth = 3, tieCols = Seq("eid"))
      .as[(String, Long)].collect().toSet
    assert(got == Set(("view>click>cart", 1L), ("click", 1L)))
  }

  test("timeWeightedAvg: hand-computed step weights; last event opens nothing") {
    import spark.implicits._
    val us = 1000000L
    val rows = Seq(
      // key 1: v=10 for 4s, v=20 for 6s -> twa = (40+120)/10 = 16.0
      (1L, 0L * us, 1L, 10.0), (1L, 4L * us, 2L, 20.0),
      (1L, 10L * us, 3L, 99.0),             // last event: no interval
      (2L, 0L * us, 4L, 7.5))               // single event -> no row
      .toDF("k", "ts_us", "eid", "v")
    val got = graft.ops.TimeSeries.timeWeightedAvg(rows, "k", "ts_us", "v",
        tieCols = Seq("eid"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 10L, 16.0)))
  }

  test("timeWeightedAvg: timestamp ties resolve on the tie column") {
    import spark.implicits._
    val us = 1000000L
    // two events at t=0: eid order makes v=2 carry the 10s slot and
    // v=1 the zero-length one
    val rows = Seq((1L, 0L, 1L, 1.0), (1L, 0L, 2L, 2.0),
      (1L, 10L * us, 3L, 9.0)).toDF("k", "ts_us", "eid", "v")
    val got = graft.ops.TimeSeries.timeWeightedAvg(rows, "k", "ts_us", "v",
        tieCols = Seq("eid"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 10L, 2.0)))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, dups collapse") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap -> one span [0,20)
      (1L, 20L, 30L),                 // touches 20 -> still the span
      (1L, 40L, 50L),                 // gap -> new island
      (2L, 0L, 5L), (2L, 0L, 5L),     // duplicate rows collapse (n=2)
      (3L, 7L, 9L))                   // singleton
      .toDF("k", "s", "e")
    val got = graft.ops.TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L),
      (2L, 0L, 5L, 2L), (3L, 7L, 9L, 1L)))
  }

  test("mergeIntervals: contained interval never extends its island") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 150L, 160L))
      .toDF("k", "s", "e")
    val got = graft.ops.TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 100L, 2L), (1L, 150L, 160L, 1L)))
  }

  test("autocorr: perfect persistence, alternating series, degenerate NULL") {
    import spark.implicits._
    // strictly increasing by a constant step: lag-1 pairs are perfectly
    // linearly related -> autocorr 1.0 exactly (integer moments)
    val inc = (1 to 20).map(i => ("inc", i.toLong, i * 2.0))
    // alternating +1/-1: lag-1 correlation is ~-1
    val alt = (1 to 20).map(i => ("alt", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    // constant: zero variance -> NULL
    val const = (1 to 10).map(i => ("const", i.toLong, 5.0))
    val df = (inc ++ alt ++ const).toDF("k", "sec", "v")
    val got = graft.ops.TimeSeries.autocorr(df, "k",
        Seq(col("sec")), "v", lagK = 1)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("inc")._1 == 19L && math.abs(got("inc")._2.get - 1.0) < 1e-12)
    assert(got("alt")._2.get < -0.99)
    assert(got("const")._2.isEmpty)
    // lag beyond history: no pairs -> group absent entirely
    val far = graft.ops.TimeSeries.autocorr(df.where(col("k") === "const"),
      "k", Seq(col("sec")), "v", lagK = 50)
    assert(far.count() == 0)
  }

  test("ewmaDyadic: hand-computed dyadic weights, lookback bound, NULL drop") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "a", Some(100.0)), (2L, 20L, "a", Some(200.0)),
      (3L, 25L, "a", Option.empty[Double]), // dropped before windowing
      (4L, 30L, "a", Some(400.0)), (5L, 10L, "b", Some(50.0)))
      .toDF("id", "sec", "k", "v")
    def run(lb: Int) = TimeSeries.ewmaDyadic(df, "k",
        Seq(col("sec"), col("id")), "v", lookback = lb)
      .select("id", "value_unit", "ewma_unit_micros")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // lookback 4: weights 1,2,4,... oldest->newest over the trailing list
    assert(run(4) == Seq(
      (1L, 10000L, 10000L * 1000000L),                    // [100]
      (2L, 20000L, 1000000L * 50000L / 3L),               // 1*100+2*200 / 3
      (4L, 40000L, 1000000L * 210000L / 7L),              // +4*400 / 7
      (5L, 5000L, 5000L * 1000000L)))
    // lookback 2 forgets the oldest value at row 3
    assert(run(2).find(_._1 == 4L).get._3 == 1000000L * 100000L / 3L)
    intercept[IllegalArgumentException](
      TimeSeries.ewmaDyadic(df, "k", Seq(col("sec")), "v", 0))
    intercept[IllegalArgumentException](
      TimeSeries.ewmaDyadic(df, "k", Seq(col("sec")), "v", 33))
  }

  test("ewmaDyadic and autocorr stay exact at magnitudes that overflowed " +
      "the old BIGINT products (r11 self-review)") {
    import spark.implicits._
    // lookback 32 over values ~1e5: the old (10^6 * Σ v·2^i) wrapped
    // once |unit| >= ~2150; the quotient-remainder split must equal the
    // BigInt reference exactly
    val vals = (1 to 40).map(i => 100000.0 + i * 137.25)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, "k", v) }.toDF("sec", "k", "v")
    val got = TimeSeries.ewmaDyadic(df, "k", Seq(col("sec")), "v",
        lookback = 32)
      .select("sec", "ewma_unit_micros").as[(Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val units = vals.map(v => BigDecimal(v).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).*(100).toBigInt)
    (0 until 40).foreach { i =>
      val window = units.slice(math.max(0, i - 31), i + 1)
      val s = window.zipWithIndex.map { case (u, j) =>
        u * BigInt(2).pow(j) }.sum
      val d = BigInt(2).pow(window.length) - 1
      val expect = (BigInt(1000000) * s) / d   // both positive: same trunc
      assert(BigInt(got(i.toLong)) == expect, s"row $i")
    }
    // autocorr at 1e5-scale values over 5k pairs: (Σu)² alone is ~2.6e21
    // — far past 2^63; the decimal moments must still give ~1.0 on a
    // perfectly persistent series instead of wrapped garbage
    val big = (1 to 5001).map(i => ("big", i.toLong, 100000.0 + i))
      .toDF("k", "sec", "v")
    val ac = graft.ops.TimeSeries.autocorr(big, "k", Seq(col("sec")),
        "v", lagK = 1)
      .as[(String, Long, Option[Double])].collect().head
    assert(ac._2 == 5000L && math.abs(ac._3.get - 1.0) < 1e-9,
      s"autocorr ${ac._3}")
  }
}
