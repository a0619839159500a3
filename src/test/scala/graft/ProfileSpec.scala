package graft

import graft.ops.Profile

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
}
