package graft

import graft.ops.Profile
import org.apache.spark.sql.functions.col

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("covariance matrix computes exact population moments") {
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 3.0), (3.0, 6.0, 1.0))
      .toDF("x", "y", "z")
    val rows = Profile.covarianceMatrix(df, Seq("x", "y", "z"))
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(rows.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    val (n, covXY, corrXY) = rows(("x", "y"))
    assert(n == 3L)
    // cov = 28/3 - 2*4 = 4/3 (rounded to 9 dp); y = 2x exactly -> corr 1
    assert(covXY == 1.333333333)
    assert(corrXY == 1.0)
    // z = 7 - 2x -> perfectly anti-correlated with x
    assert(rows(("x", "z"))._3 == -1.0)
  }

  test("histogram densifies empty bins and clamps out-of-range values") {
    val df = Seq(-5.0, 0.0, 1.0, 1.5, 9.9, 25.0, Double.NaN).toDF("v")
    val h = Profile.histogram(df, "v", nBins = 5, lo = 0.0, hi = 10.0)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(h.map(_._1).toSeq == (0L until 5L))        // every bin present
    // clamped ends; the NaN is excluded, not counted into bin 0
    assert(h.map(_._2).toSeq == Seq(4L, 0L, 0L, 0L, 2L))
    assert(h.map(_._3).toSeq == Seq(0.0, 2.0, 4.0, 6.0, 8.0))
  }

  test("covariance drops incomplete rows listwise, keeping supports consistent") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(2.0), Some(4.0)),
      (None: Option[Double], Some(6.0))).toDF("x", "y")
    val r = Profile.covarianceMatrix(df, Seq("x", "y"))
      .as[(String, String, Long, Double, Double)].collect().head
    // only the two complete rows participate: n=2, exact cov of
    // (1,2),(2,4) = 2.5 - 1.5*3 = 0.5? -> sums: sx=3 sxx=5 sy=6 syy=20
    // sxy=10; cov = 10/2 - (3/2)(6/2) = 0.5; y=2x -> corr 1
    assert(r._3 == 2L)
    assert(math.abs(r._4 - 0.5) < 1e-12)
    assert(math.abs(r._5 - 1.0) < 1e-12)
  }

  test("summarize reports rows, nulls, distincts and bounds per column") {
    val df = Seq(Some(1), Some(1), Some(3), None).toDF("v")
    val p = Profile.summarize(df, Seq("v"), exactDistinct = true)
      .as[(String, Long, Long, Long, String, String)].collect().head
    assert(p == (("v", 4L, 1L, 2L, "1", "3")))
  }

  test("skew report surfaces the heavy key, ratio, share and count quantiles") {
    // counts: a=6, b=2, c=1, NULL=3 -> 12 rows over 4 key groups
    val df = (Seq.fill(6)(Option("a")) ++ Seq.fill(2)(Option("b")) ++
      Seq(Option("c")) ++ Seq.fill(3)(Option.empty[String]))
      .zipWithIndex.map(_.swap).toDF("id", "k")
    val r = Profile.skewReport(df, Seq("k")).collect().head
    assert(r.getAs[String]("key_col") == "k")
    assert(r.getAs[Long]("n_rows") == 12L)
    assert(r.getAs[Long]("n_keys") == 4L) // NULL is one key group
    assert(r.getAs[Long]("max_key_rows") == 6L)
    assert(r.getAs[String]("top_key") == "a")
    assert(r.getAs[Double]("skew_ratio") == 2.0) // 6 / (12/4)
    assert(r.getAs[Double]("top_share") == 0.5)
    // counts sorted [1,2,3,6]: interpolated p50 = 2.5
    assert(r.getAs[Double]("p50_key_rows") == 2.5)
    // a balanced key reports ratio 1
    val bal = Profile.skewReport(df.where(col("k").isNotNull)
      .withColumn("k2", col("id") % 3), Seq("k2")).collect().head
    assert(bal.getAs[Double]("skew_ratio") == 1.0)
  }

  test("PSI drift report: zero on identical slices, closed form on a shift") {
    def slice(counts: Seq[Int]) = counts.zipWithIndex
      .flatMap { case (n, b) => Seq.fill(n)(b * 10.0 + 5.0) }
      .toDF("v") // values dead-center in bin b of [0,40) @ width 10
    // identical distributions -> every contribution exactly 0
    val same = Profile.driftReport(slice(Seq(4, 3, 2, 1)),
      slice(Seq(4, 3, 2, 1)), "v", 4, 0.0, 40.0)
      .select("psi_contrib").as[Double].collect()
    assert(same.toSeq == Seq.fill(4)(0.0))
    // shifted mass: ref (5,5,0,0)/10, cur (2,5,2,1)/10; bin 2 and 3 are
    // empty in ref -> ref share clamps to minShare
    def q6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def contrib(rs: Double, cs: Double) = q6((cs - rs) * q6(math.log(cs / rs)))
    val got = Profile.driftReport(slice(Seq(5, 5, 0, 0)),
      slice(Seq(2, 5, 2, 1)), "v", 4, 0.0, 40.0)
      .orderBy("bin").select("bin", "n_ref", "n_cur", "psi_contrib")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 5L, 2L, contrib(0.5, 0.2)),
      (1L, 5L, 5L, contrib(0.5, 0.5)),
      (2L, 0L, 2L, contrib(1e-6, 0.2)),
      (3L, 0L, 1L, contrib(1e-6, 0.1))))
    // the clamped empty bins dominate, as PSI is designed to flag
    assert(got(2)._4 > 1.0 && got(3)._4 > 1.0)
  }

  test("equi-depth histogram: even populations on distinct values") {
    import spark.implicits._
    // 100 distinct values 0.01..1.00, 4 bins -> exactly 25 rows each
    val df = (1 to 100).map(i => i / 100.0).toDF("x")
    val got = Profile.histogramEqDepth(df, "x", nBins = 4)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(25L, 25L, 25L, 25L))
    assert(got.map(r => (r._3, r._4)).toSeq ==
      Seq((1L, 25L), (26L, 50L), (51L, 75L), (76L, 100L)))
    // sum_unit of bin 0 = 1+2+...+25
    assert(got(0)._5 == (1 to 25).sum.toLong)
  }

  test("equi-depth histogram: a heavy value stays in one bin") {
    import spark.implicits._
    // 90 copies of 5.00 plus ten tail values: the tie mass lands in
    // bin 0 whole, tail rows spread by their exact CDF position
    val df = (Seq.fill(90)(5.0) ++ (1 to 10).map(i => 10.0 + i))
      .toDF("x")
    val got = Profile.histogramEqDepth(df, "x", nBins = 4)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val byBin = got.map(r => r._1 -> r._2).toMap
    assert(byBin(0L) == 90L, s"tied value split across bins: ${got.toSeq}")
    assert(byBin.values.sum == 100L)
    // all tail values have cum_before >= 90 -> 90*4 div 100 = 3
    assert(byBin(3L) == 10L && !byBin.contains(1L) && !byBin.contains(2L))
  }

  test("exactPercentiles: lower order statistic per group, ties honored") {
    import spark.implicits._
    // group a: 1..10 (p50 -> rank 5 -> value 5); group b: heavy tie
    val rows = (1 to 10).map(i => ("a", i.toDouble)) ++
      (Seq.fill(7)(("b", 2.0)) ++ Seq(("b", 9.0), ("b", 9.0), ("b", 9.0)))
    val got = Profile.exactPercentiles(rows.toDF("g", "x"), "g", "x",
        Seq(50, 90))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 50, 500L, 10L),  // rank ceil(10*50/100)=5 -> 5.00
      ("a", 90, 900L, 10L),  // rank 9 -> 9.00
      ("b", 50, 200L, 10L),  // rank 5 falls inside the 7-copy tie
      ("b", 90, 900L, 10L))) // rank 9 -> first 9.0 copy
  }

  test("exactPercentiles: p100 is the maximum, one row per (group, p)") {
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("c", 7.0))
    val got = Profile.exactPercentiles(rows.toDF("g", "x"), "g", "x",
        Seq(100))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == Set(("a", 100, 300L, 3L), ("c", 100, 700L, 1L)))
  }

  test("madOutliers: hand-computed median/MAD flags only true outliers") {
    import spark.implicits._
    // group a: 1..9 plus a wild 100 -> median 5.50? no: lower median of
    // 10 values (rank 5) = 5.0; deviations {4,3,2,1,0,.5,1.5,2.5,3.5,95}
    // in units: med=500, devs {400,300,200,100,0,50,150,250,350,9500},
    // MAD = rank-5 of sorted devs {0,50,100,150,200,250,300,350,400,9500}
    // = 200; outlier iff dev*10 > 200*30=6000 i.e. dev > 600 -> only 9500
    val rows = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 100.0)) ++
      Seq(("b", 7.0), ("b", 7.0), ("b", 7.0), ("b", 9.0))
    val got = Profile.madOutliers(rows.toDF("g", "x"), "g", "x",
        kTenths = 30)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a") == ("a", 10L, 500L, 200L, 1L))
    // group b: >50% share 7.0 -> MAD 0, the off value flags (the
    // documented MAD-zero pitfall)
    assert(got("b") == ("b", 4L, 700L, 0L, 1L))
  }

  test("weighted percentiles: weights count as copies; bad weight fails") {
    import spark.implicits._
    // (1.0 x3, 2.0 x1, 3.0 x6): W=10, p50 -> weighted rank 5 -> 3.0
    // (cum_before=4 < 5 <= 10); p30 -> rank 3 -> 1.0
    val rows = Seq(("a", 1.0, 3L), ("a", 2.0, 1L), ("a", 3.0, 6L))
    val got = Profile.exactPercentilesWeighted(rows.toDF("g", "x", "w"),
        "g", "x", "w", Seq(30, 50))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == Set(("a", 30, 100L, 10L), ("a", 50, 300L, 10L)))
    // equal to the unweighted form on the expanded multiset
    val expanded = rows.flatMap { case (g, x, w) =>
      Seq.fill(w.toInt)((g, x)) }
    val unweighted = Profile.exactPercentiles(expanded.toDF("g", "x"),
        "g", "x", Seq(30, 50))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == unweighted)
    val bad = Seq(("a", 1.0, 0L)).toDF("g", "x", "w")
    val e = intercept[Exception] {
      Profile.exactPercentilesWeighted(bad, "g", "x", "w", Seq(50)).collect()
    }
    assert(e.getMessage.contains("non-positive weight"),
      s"unexpected: ${e.getMessage}")
  }

  test("groupRegression: exact fit on linear data, NULLs on zero variance") {
    import spark.implicits._
    // group a: y = 3x + 2 exactly -> slope 3, intercept 2, r2 = 1
    // group b: constant x -> vertical line, no OLS fit
    val rows = (1 to 20).map(i => ("a", i.toDouble, 3.0 * i + 2.0)) ++
      (1 to 5).map(i => ("b", 7.0, i.toDouble))
    val got = Profile.groupRegression(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val a = got("a")
    assert(a._2 == 20L && a._3.contains(3.0) && a._4.contains(2.0) &&
      a._5.contains(1.0), s"bad fit: $a")
    val b = got("b")
    assert(b._2 == 5L && b._3.isEmpty && b._4.isEmpty && b._5.isEmpty,
      s"zero x-variance must yield NULLs: $b")
  }

  test("groupRegression: slope sign tracks the relationship") {
    import spark.implicits._
    val rows = (1 to 30).map(i =>
      ("down", i.toDouble, 100.0 - 2.0 * i + (i % 3) * 0.25))
    val got = Profile.groupRegression(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(got._3.exists(_ < 0), "negative trend must yield negative slope")
    assert(got._5.exists(r => r > 0.99 && r <= 1.0), s"near-linear r2: $got")
  }

  test("abCompare: shifted variants score a confident t; equal ones near 0") {
    import spark.implicits._
    val rows =
      (1 to 40).map(i => ("seg1", "a", 10.0 + (i % 5))) ++
      (1 to 40).map(i => ("seg1", "b", 14.0 + (i % 5))) ++ // +4 shift
      (1 to 40).map(i => ("seg2", "a", 10.0 + (i % 5))) ++
      (1 to 40).map(i => ("seg2", "b", 10.0 + ((i + 2) % 5))) // same dist
    val got = Profile.abCompare(rows.toDF("g", "v", "x"), "g", "v", "x",
        "a", "b")
      .as[(String, Long, Long, Double, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val s1 = got("seg1")
    assert(s1._2 == 40L && s1._3 == 40L && s1._6 == 4.0)
    assert(s1._7.exists(_ > 5.0), s"shift must be significant: $s1")
    val s2 = got("seg2")
    assert(s2._6 == 0.0 && s2._7.exists(t => math.abs(t) < 1e-6), s"$s2")
  }

  test("abCompare: a group missing one variant or undersized is absent") {
    import spark.implicits._
    val rows = Seq(("g1", "a", 1.0), ("g1", "a", 2.0), ("g1", "b", 3.0),
      ("g2", "a", 1.0), ("g2", "a", 2.0))
    val got = Profile.abCompare(rows.toDF("g", "v", "x"), "g", "v", "x",
      "a", "b")
    assert(got.count() == 0L) // g1 has n_b=1, g2 has no b at all
  }

  test("winsorizedMean: tails clamp to the exact-CDF band") {
    import spark.implicits._
    // 20 values 1..20 plus an outlier 1000; p5 rank=ceil(21*5/100)=2
    // -> lo=2; p95 rank=ceil(21*95/100)=20 -> hi=20: the outlier
    // clamps to 20, value 1 clamps up to 2
    val rows = ((1 to 20).map(i => ("a", i.toDouble)) :+ ("a", 1000.0))
    val got = Profile.winsorizedMean(rows.toDF("g", "x"), "g", "x")
      .as[(String, Long, Long, Long, Double)].collect().head
    val expect = ((2 + (2 to 20).sum + 20).toDouble / 21.0)
    assert(got._1 == "a" && got._2 == 21L &&
      got._3 == 200L && got._4 == 2000L)
    assert(math.abs(got._5 - expect) < 1e-9, s"got $got want $expect")
    // the plain mean is dragged far above by the outlier
    assert(got._5 < 60.0)
  }

  test("equi-depth histogram excludes NULL and NaN rows") {
    import spark.implicits._
    val df = (Seq(Some(1.0), Some(2.0), None, Some(Double.NaN)))
      .toDF("x")
    val got = Profile.histogramEqDepth(df, "x", nBins = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).sum == 2L)
  }

  test("binByQuantile: even quartiles, tie cohesion, histogram agreement") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val bins = Profile.binByQuantile(df, "id", "x", nBins = 4)
      .as[(Long, Long, Long)].collect()
    assert(bins.length == 100)
    // value i (unit 100*i) -> bin (i-1)/25: exact 25-row quartiles
    assert(bins.forall { case (id, u, b) =>
      u == id * 100 && b == (id - 1) / 25 })
    // heavy tie: one value can only occupy one bin
    val ties = (1 to 10).map(i => (i.toLong, 5.0)) ++
      Seq((11L, 1.0), (12L, 9.0))
    val tb = Profile.binByQuantile(ties.toDF("id", "x"), "id", "x", 4)
      .as[(Long, Long, Long)].collect()
    assert(tb.filter(_._2 == 500L).map(_._3).distinct.length == 1)
    // bin sizes agree with histogramEqDepth on the same data
    val hist = Profile.histogramEqDepth(df, "x", nBins = 4)
      .select("bin", "n").as[(Long, Long)].collect().toMap
    val sizes = Profile.binByQuantile(df, "id", "x", 4)
      .groupBy("bin").count().as[(Long, Long)].collect().toMap
    assert(sizes == hist)
    // NULL/NaN rows vanish
    val withNull = Seq((1L, Some(1.0)), (2L, None), (3L, Some(2.0)))
      .toDF("id", "x")
    assert(Profile.binByQuantile(withNull, "id", "x", 2).count() == 2)
  }

  test("shareShift: exact micro shares, truncating; empty period -> NULLs") {
    val df = Seq(("x", false), ("x", false), ("y", false),
      ("x", true), ("y", true), ("y", true)).toDF("g", "b")
    val got = Profile.shareShift(df, "g", col("b"))
      .orderBy("g")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      ("x", 2L, 1L, Some(666666L), Some(333333L), Some(-333333L)),
      ("y", 1L, 2L, Some(333333L), Some(666666L), Some(333333L))))
    // all rows in period A: B shares and deltas are NULL, not a crash
    val onlyA = Profile.shareShift(
        Seq(("x", false), ("y", false)).toDF("g", "b"), "g", col("b"))
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq.sortBy(_._1)
    assert(onlyA == Seq(
      ("x", 1L, 0L, Some(500000L), None, None),
      ("y", 1L, 0L, Some(500000L), None, None)))
  }

  test("planReport counts shapes; requirePlan gates scale-killers") {
    val a = (1 to 100).map(i => (i.toLong, i % 5)).toDF("id", "k")
    val b = (1 to 10).map(i => (i, s"v$i")).toDF("k", "v")
    val joined = a.join(b, "k").groupBy("v").count()
    val r = Profile.planReport(joined)
    assert(r.nExchanges >= 1 && !r.hasCartesian)
    // a true cross join trips the guard
    val cross = a.crossJoin(b)
    val rc = Profile.planReport(cross)
    assert(rc.hasCartesian || rc.hasBroadcastNestedLoop)
    intercept[IllegalArgumentException](
      Profile.requirePlan(cross, forbidCartesian = true))
    // the guard passes compliant plans through unchanged
    assert(Profile.requirePlan(joined, maxExchanges = 10) eq joined)
    intercept[IllegalArgumentException](
      Profile.requirePlan(joined, maxExchanges = 0))
  }

  test("aucExact: perfect, random, tie-corrected, degenerate cases") {
    def auc(rows: Seq[(Long, Long)]): Option[Long] =
      Profile.aucExact(rows.toDF("s", "y"), "s", "y")
        .as[(Long, Long, Option[Long])].collect().head._3
    // perfect separation
    assert(auc(Seq((10L, 1L), (20L, 1L), (1L, 0L), (2L, 0L)))
      == Some(1000000L))
    // one pos between two negs: wins one pair, loses one -> 0.5
    assert(auc(Seq((3L, 1L), (1L, 0L), (5L, 0L))) == Some(500000L))
    // full tie: tie-averaged ranks give exactly 0.5
    assert(auc(Seq((2L, 1L), (2L, 1L), (2L, 0L))) == Some(500000L))
    // inverted scores
    assert(auc(Seq((1L, 1L), (9L, 0L))) == Some(0L))
    // degenerate: single class -> NULL
    assert(auc(Seq((1L, 1L), (2L, 1L))).isEmpty)
  }

  test("joinPreflight: exact inner-join cardinality, hot key, null keys out") {
    val left = Seq(Some(1L), Some(1L), Some(2L), Some(3L), None).toDF("lk")
    val right = Seq(1L, 2L, 2L, 5L).toDF("rk")
    val r = Profile.joinPreflight(left, "lk", right, "rk").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)       // non-null rows
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L)       // key counts
    assert(r.getLong(4) == 2L)                             // matched keys
    assert(r.getLong(5) == 4L)                             // 2*1 + 1*2 exact
    assert(r.getLong(6) == 2L)                             // worst product
    assert(r.getString(7) == "2")  // product tie 2 vs 2 -> max string key
    // the exact claim: est_rows equals the actual inner join's count
    assert(left.join(right, left("lk") === right("rk")).count() == 4L)
  }

  test("standardize: bit-stated z against closed form; zero variance NULL") {
    val df = Seq((1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0),
      (4L, "z", 5.0), (5L, "z", 5.0)).toDF("id", "t", "v")
    val got = Profile.standardize(df, "id", "t", "v")
      .select("id", "z").as[(Long, Option[Double])].collect().toMap
    val expect = -300.0 / math.sqrt(60000.0) // (u*n - s1)/sqrt(n*s2 - s1^2)
    assert(got(1L).get == expect && got(3L).get == -expect)
    assert(got(2L).get == 0.0)
    assert(got(4L).isEmpty && got(5L).isEmpty) // zero-variance group
    // closed-form sanity: equals (x - mean)/sigma_pop within float noise
    assert(math.abs(got(1L).get - (1.0 - 2.0) / math.sqrt(2.0 / 3.0)) < 1e-12)
  }

  test("ksStatistic: identical samples D=0; disjoint D=1; hand mid case") {
    import graft.ops.Profile
    def ks(a: Seq[Long], b: Seq[Long]) = Profile.ksStatistic(
        a.toDF("x"), b.toDF("x"), "x")
      .as[(Long, Long, Long, Long)].collect().head
    assert(ks(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))._3 == 0L)
    // disjoint: full separation, max first reached at value 2
    val d = ks(Seq(1L, 1L, 2L), Seq(3L, 3L, 4L))
    assert(d == ((3L, 3L, 1000000L, 2L)), s"got $d")
    // a=[1,2], b=[2,3]: at v=1 |1*2-0*2|=2, v=2 |2*2-1*2|=2, v=3 0
    // -> dmax 2 over denominator 4 = 0.5, argmax tie-break min v = 1
    val m = ks(Seq(1L, 2L), Seq(2L, 3L))
    assert(m == ((2L, 2L, 500000L, 1L)), s"got $m")
  }

  test("quantile normalization: identity on aligned bins, cross-group distribution match") {
    // 16 distinct values, b = 16: rank r maps to bin r, boundary[r] is
    // the value at pooled rank r — normalization is the identity
    val single = (1 to 16).map(i => (i.toLong, "g", i * 10L))
      .toDF("id", "g", "v")
    val idm = Profile.quantileNormalize(single, "id", "g", "v", 16)
      .select("v", "normalized").as[(Long, Long)].collect()
    assert(idm.forall { case (v, nv) => v == nv }, s"got ${idm.toSeq}")
    // two equal-size groups on disjoint scales: after normalization
    // their value multisets agree exactly (rank r -> same bin -> same
    // pooled boundary)
    val two = ((1 to 32).map(i => (i.toLong, "a", i.toLong)) ++
      (1 to 32).map(i => (100 + i.toLong, "b", 1000 + i.toLong)))
      .toDF("id", "g", "v")
    val norm = Profile.quantileNormalize(two, "id", "g", "v", 16)
      .select("g", "normalized").as[(String, Long)].collect()
    val byG = norm.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byG("a") == byG("b"), s"a=${byG("a")}\nb=${byG("b")}")
    // normalization preserves within-group order
    val ordered = Profile.quantileNormalize(two, "id", "g", "v", 16)
      .where(col("g") === "a").orderBy(col("v"))
      .select("normalized").as[Long].collect()
    assert(ordered.toSeq == ordered.sorted.toSeq)
    // every row lands in a bin in [1, 16]
    val bins = Profile.quantileNormalize(two, "id", "g", "v", 16)
      .select("q_bin").as[Long].collect()
    assert(bins.forall(k => k >= 1 && k <= 16))
  }

  test("bootstrap CI brackets the mean, replays exactly, and is salt-sensitive") {
    val data = (1 to 200).map(i => (i.toLong, (100 + i % 50).toLong))
      .toDF("id", "v")
    val ci = Profile.bootstrapMeanCi(data, "id", "v", b = 200, salt = "s1")
      .as[(Double, Double, Double, Long)].collect().head
    val trueMean = (1 to 200).map(i => 100 + i % 50).sum / 200.0
    assert(ci._1 == trueMean)
    assert(ci._2 < ci._1 && ci._1 < ci._3, s"CI $ci")
    assert(ci._4 == 200L)
    // deterministic across runs
    val again = Profile.bootstrapMeanCi(data, "id", "v", 200, "s1")
      .as[(Double, Double, Double, Long)].collect().head
    assert(ci == again)
    // a different salt draws different replicates (interval shifts)
    val other = Profile.bootstrapMeanCi(data, "id", "v", 200, "s2")
      .as[(Double, Double, Double, Long)].collect().head
    assert(other._2 != ci._2 || other._3 != ci._3)
    // driver-side replay of the full mechanism at b = 20
    def u(id: Long, rep: Int, salt: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$rep:$salt".getBytes("UTF-8"))
      val hex = d.take(4).map(x => f"${x & 0xFF}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    }
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238463, 0.9963401531726563,
      0.9994058151824183, 0.999916758850712, 0.9999897508033253,
      0.999998874797402, 0.9999998885745216)
    def w(uu: Double): Long = cdf.indexWhere(uu < _) match {
      case -1 => 10L; case k => k.toLong
    }
    val vals = (1 to 200).map(i => i.toLong -> (100 + i % 50).toLong)
    val means = (0 until 20).flatMap { rep =>
      val ws = vals.map { case (id, v) => (w(u(id, rep, "s3")), v) }
      val sw = ws.map(_._1).sum
      if (sw == 0) None else Some(ws.map { case (k, v) => k * v }.sum.toDouble / sw)
    }.sorted
    val expected = (means(0), means(19))   // ranks 1 and 20 at b = 20
    val got = Profile.bootstrapMeanCi(data, "id", "v", 20, "s3")
      .as[(Double, Double, Double, Long)].collect().head
    assert((got._2, got._3) == expected, s"got $got expected $expected")
  }

  test("domainPrefix: exact prefix sums on adversarial domains") {
    import spark.implicits._
    // adversarial shapes for the bucket cascade: negative keys (sign
    // stitch), keys straddling bucket boundaries at every level (4096,
    // 2^24, 2^48), huge sparse gaps, Long extremes, a null key (sorts
    // first), duplicates of measure values — checked against the plain
    // sequential prefix sum
    val keys: Seq[Option[Long]] = Seq(None, Some(Long.MinValue),
      Some(Long.MinValue + 4095L), Some(-5000000000000000L),
      Some(-4097L), Some(-4096L), Some(-1L), Some(0L), Some(1L),
      Some(4095L), Some(4096L), Some(4097L), Some(1L << 24),
      Some((1L << 24) + 1), Some(1L << 48), Some(7L << 50),
      Some(Long.MaxValue - 1), Some(Long.MaxValue))
    val rows = keys.zipWithIndex.map { case (k, i) =>
      (k, (i % 5 + 1).toLong, (i % 3).toLong)
    }
    val dom = rows.toDF("u", "a", "b")
    val got = Profile.domainPrefix(dom, "u", Seq("a", "b"))
      .select(col("u"), col("cum_a"), col("cum_b"),
        col("tot_a"), col("tot_b"))
      .as[(Option[Long], Long, Long, Long, Long)].collect()
      .sortBy(r => r._1.getOrElse(Long.MinValue))
    // reference: nulls first, then ascending key (rows are constructed
    // sorted already; null shares the MinValue bucket but sorts first)
    val ordered = rows.sortBy(r => (r._1.isDefined, r._1.getOrElse(0L)))
    val expCumA = ordered.map(_._2).scanLeft(0L)(_ + _).init
    val expCumB = ordered.map(_._3).scanLeft(0L)(_ + _).init
    val gotSorted = got.sortBy(r => (r._1.isDefined, r._1.getOrElse(0L)))
    assert(gotSorted.length == rows.length, "no row lost (incl. the null key)")
    gotSorted.zipWithIndex.foreach { case ((k, ca, cb, ta, tb), i) =>
      assert(ca == expCumA(i) && cb == expCumB(i),
        s"key $k: got ($ca,$cb) expected (${expCumA(i)},${expCumB(i)})")
      assert(ta == rows.map(_._2).sum && tb == rows.map(_._3).sum)
    }
    // randomized: 300 distinct keys drawn across the full long range,
    // seeded, single measure — exact agreement with the sequential scan
    val rnd = new scala.util.Random(42)
    val rkeys = Seq.fill(400)(rnd.nextLong()).distinct.take(300)
    val rrows = rkeys.map(k => (k, (k % 7 + 7).abs + 1))
    val rgot = Profile.domainPrefix(rrows.toDF("u", "n"), "u", Seq("n"))
      .select(col("u"), col("cum_n")).as[(Long, Long)].collect()
      .sortBy(_._1)
    val rord = rrows.sortBy(_._1)
    val rexp = rord.map(_._2).scanLeft(0L)(_ + _).init
    rgot.zipWithIndex.foreach { case ((k, c), i) =>
      assert(c == rexp(i), s"key $k: got $c expected ${rexp(i)}")
    }
  }

  test("domainPrefix fracBucket: fractional [0,1] domains, NaN last, infinities") {
    import spark.implicits._
    // the raw-value callers (ksStatistic, quantileNormalize): a score
    // domain inside (0, 1) must spread across buckets (plain truncation
    // collapses it to one), NaN must keep Spark's sort-LAST position,
    // infinities the extremes, NULL first
    val keys: Seq[Option[Double]] = Seq(None, Some(Double.NegativeInfinity),
      Some(-1e30), Some(-2.5), Some(-0.4), Some(0.0)) ++
      (1 to 200).map(i => Some(i / 201.0)) ++
      Seq(Some(1.0), Some(7.25), Some(4095.9), Some(4096.1), Some(1e30),
        Some(Double.PositiveInfinity), Some(Double.NaN))
    val rows = keys.zipWithIndex.map { case (k, i) => (k, (i % 4 + 1).toLong) }
    val dom = rows.toDF("v", "n")
    val got = Profile.domainPrefix(dom, "v", Seq("n"),
        Some(Profile.fracBucket(col("v"))))
      .select(col("v"), col("cum_n"), col("tot_n"))
      .as[(Option[Double], Long, Long)].collect()
    // reference order: NULL first, then ascending, NaN last (Spark's
    // ORDER BY total order)
    def rank(k: Option[Double]): Double = k match {
      case None => Double.NegativeInfinity
      case Some(d) if d.isNaN => Double.MaxValue // after +Inf? use key
      case Some(d) => d
    }
    val ordered = rows.sortBy { case (k, _) => (k.isDefined,
      k.exists(_.isNaN), rank(k)) }
    val exp = ordered.map(_._2).scanLeft(0L)(_ + _).init
    // string keys: Some(NaN) == Some(NaN) is FALSE under Scala's
    // primitive-double equality, so a direct Option[Double] map misses
    def kstr(k: Option[Double]): String = k.map(_.toString).getOrElse("null")
    val expByKey = ordered.map(r => kstr(r._1)).zip(exp).toMap
    assert(got.length == rows.length, "no row lost")
    got.foreach { case (k, c, t) =>
      assert(c == expByKey(kstr(k)),
        s"key $k: got $c expected ${expByKey(kstr(k))}")
      assert(t == rows.map(_._2).sum)
    }
    // the fractional domain genuinely spreads: >1 distinct level-0 bucket
    val nBuckets = dom.where(col("v").isNotNull)
      .select(Profile.fracBucket(col("v")).as("b"))
      .distinct().count()
    assert(nBuckets > 10, s"fractional domain collapsed to $nBuckets buckets")
  }

  test("domainPrefix groupCols: per-group exact prefixes, groups independent") {
    import spark.implicits._
    // three groups with interleaved, deliberately overlapping key spaces
    // (including keys spanning multiple 4096-buckets and negatives) —
    // each group's prefix must see ONLY its own rows
    val rnd = new scala.util.Random(7)
    val rows = for {
      gi <- 0 until 3
      k <- Seq.fill(120)(rnd.nextInt(40000) - 20000L).distinct
    } yield (s"g$gi", k, (k % 5 + 5) % 5 + 1L)
    val got = Profile.domainPrefix(rows.toDF("src", "u", "n"), "u",
        Seq("n"), groupCols = Seq("src"))
      .select(col("src"), col("u"), col("cum_n"), col("tot_n"))
      .as[(String, Long, Long, Long)].collect()
    val byGroup = rows.groupBy(_._1)
    got.foreach { case (src, k, c, t) =>
      val grp = byGroup(src).sortBy(_._2)
      val exp = grp.takeWhile(_._2 < k).map(_._3).sum
      assert(c == exp, s"group $src key $k: got $c expected $exp")
      assert(t == grp.map(_._3).sum, s"group $src total")
    }
    assert(got.length == rows.length)
  }

  test("domainPrefix groupCols: a NULL group is a real partition " +
      "(the Window.partitionBy contract)") {
    import spark.implicits._
    // the offset/total joins were null-unsafe and every NULL-group row
    // silently vanished from the cascade's output (r11 self-review)
    val rows = Seq((Option("g"), 1L, 2L), (Option("g"), 5L, 3L),
      (Option.empty[String], 2L, 7L), (Option.empty[String], 9L, 4L))
    val got = Profile.domainPrefix(rows.toDF("src", "u", "n"), "u",
        Seq("n"), groupCols = Seq("src"))
      .select(col("src"), col("u"), col("cum_n"), col("tot_n"))
      .as[(Option[String], Long, Long, Long)].collect().toSet
    assert(got == Set(
      (Some("g"), 1L, 0L, 5L), (Some("g"), 5L, 2L, 5L),
      (None, 2L, 0L, 11L), (None, 9L, 7L, 11L)), s"got $got")
  }

  test("NULL/NaN edges across the profile family (r11 self-review)") {
    import spark.implicits._
    // quantileNormalize: NULL values have no quantile and must not
    // shift the pooled CDF or surface as boundary values
    val qn = Profile.quantileNormalize(
      Seq((1L, "a", Option(1.0)), (2L, "a", Option(2.0)),
        (3L, "a", Option.empty[Double]), (4L, "b", Option(3.0)),
        (5L, "b", Option(4.0))).toDF("id", "g", "v"),
      "id", "g", "v", b = 2)
    val rows = qn.collect()
    assert(rows.length == 4, s"NULL value row leaked: ${rows.toSeq}")
    assert(rows.forall(!_.isNullAt(4)), "NULL emitted as normalized value")
    // shareShift: a NULL period predicate belongs to NEITHER period
    val ss = Profile.shareShift(
      Seq(("s1", Option(1L)), ("s1", Option(10L)),
        ("s1", Option.empty[Long])).toDF("seg", "ts"),
      "seg", col("ts") >= 5L).collect().head
    assert(ss.getLong(1) == 1L && ss.getLong(2) == 1L,
      s"NULL-predicate row was counted: $ss")
    // covarianceMatrix: zero-variance corr is NULL, never NaN/Inf
    val cm = Profile.covarianceMatrix(
      Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0)).toDF("c1", "c2"),
      Seq("c1", "c2")).collect()
    assert(cm.forall(r => r.isNullAt(4) ||
      !r.getDouble(4).isNaN), s"NaN corr leaked: ${cm.toSeq}")
    assert(cm.exists(r => r.getString(0) == "c1" && r.isNullAt(4)))
    // aucExact: fractional scores fail with guidance, not AUC 0.5
    val ex = intercept[Exception] {
      Profile.aucExact(Seq((0.7, 1L), (0.3, 0L)).toDF("p", "y"),
        "p", "y").collect() }
    assert(ex.getMessage.contains("quantize"), s"got ${ex.getMessage}")
    // luhnValid: empty string is false, not INVALID_INDEX_OF_ZERO
    val lv = Seq("", "79927398713").toDF("d")
      .select(graft.ops.TextOps.luhnValid(col("d"))).as[Boolean].collect()
    assert(lv.toSeq == Seq(false, true))
  }
}
