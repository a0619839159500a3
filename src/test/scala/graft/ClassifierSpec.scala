package graft

import org.apache.spark.sql.functions._
import graft.ops.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("GD separates linearly separable data and saturates correctly") {
    // y = 1 iff x > 0.5, on a clean grid
    val df = (0 until 100).map { i =>
      val x = i / 100.0
      (i.toLong, x, if (x > 0.5) 1.0 else 0.0)
    }.toDF("id", "x", "y")
    val m = Classifier.train(df, Seq(col("x")), col("y"),
      iterations = 50, lr = 4.0)
    val scored = Classifier.score(df, Seq(col("x")), m)
      .select("x", "pred").as[(Double, Boolean)].collect()
    val acc = scored.count { case (x, p) => p == (x > 0.5) } / 100.0
    assert(acc >= 0.95, s"accuracy $acc, weights ${m.weights}")
    // slope points the right way, bias pushes the boundary off zero
    assert(m.weights(1) > 0 && m.weights.head < 0)
  }

  test("training is bit-deterministic under repartitioning") {
    val df = (0 until 200).map { i =>
      (i.toLong, (i % 17) / 17.0, (i % 5) / 5.0,
        if (i % 3 == 0) 1.0 else 0.0)
    }.toDF("id", "x1", "x2", "y")
    val feats = Seq(col("x1"), col("x2"))
    val m1 = Classifier.train(df, feats, col("y"), iterations = 5)
    val m2 = Classifier.train(df.repartition(13), feats, col("y"),
      iterations = 5)
    assert(m1.weights == m2.weights) // exact-micros gradient contract
    assert(m1.weights.forall(w =>
      BigDecimal(w).scale <= 6), "weights live in the 1e-6 domain")
  }

  test("rational sigmoid shape; extreme margins saturate to the 1e-6 rails") {
    val m = Classifier.LinearModel(Seq(0.0, 100.0))
    val df = Seq((1L, -3.0), (2L, 0.0), (3L, 3.0), (4L, -1e9), (5L, 1e9))
      .toDF("id", "x")
    val s = Classifier.score(df, Seq(col("x")), m)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(s(1L) > 0.0 && s(1L) < 0.01)    // z=-300: low but not clamped
    assert(s(2L) == 0.5)                   // s(0) = 0.5 exactly
    assert(s(3L) > 0.99 && s(3L) < 1.0)    // z=+300
    // |z|~1e11: the raw sigmoid never reaches 0/1, but the emitted
    // score quantizes to 1e-6 — the rails ARE the documented output
    assert(s(4L) == 0.0 && s(5L) == 1.0)
    intercept[IllegalArgumentException] {
      m.margin(Seq(col("x"), col("x")))
    }
  }

  test("word_stop_stats equals the split/filter formulation bit-for-bit") {
    // the fused classifier feature pass must reproduce size(split) and
    // size(filter(isin)) EXACTLY — these counts become score values
    import graft.functions.TextExprs.wordStopStats
    val stops = Seq("the", "a", "and", "of", "to")
    val df = Seq("the quick brown fox", "a a the and to of", "", "   ",
      "x", "THE the The", "a,b the").toDF("t")
    val got = df.select(wordStopStats(trim(lower(col("t"))), stops).as("s"))
      .select(col("s.n_words"), col("s.n_stop"))
      .as[(Int, Int)].collect().toSeq
    val want = df.select(
        size(split(trim(lower(col("t"))), "\\s+")).as("nw"),
        size(filter(split(trim(lower(col("t"))), "\\s+"),
          w => w.isin(stops.map(x => x: Any): _*))).as("ns"))
      .as[(Int, Int)].collect().toSeq
    assert(got == want, s"got $got want $want")
  }

  test("one GD round moves weights against the gradient") {
    // all labels 1, single feature 1.0: sig starts at 0.5, residual
    // -0.5 -> gradient micros = -500000 per row -> w += lr * 0.5
    val df = (0 until 10).map(i => (i.toLong, 1.0, 1.0)).toDF("id", "x", "y")
    val m = Classifier.train(df, Seq(col("x")), col("y"),
      iterations = 1, lr = 1.0)
    assert(m.weights == Seq(0.5, 0.5), s"got ${m.weights}")
  }

  test("train rejects empty input with a named error") {
    import graft.ops.Classifier
    import org.apache.spark.sql.functions._
    val empty = Seq((1.0, 0.0)).toDF("x", "label").where(lit(false))
    val ex = intercept[IllegalArgumentException] {
      Classifier.train(empty, Seq(col("x")), col("label"), 1, 0.1) }
    assert(ex.getMessage.contains("empty input"))
  }
}
