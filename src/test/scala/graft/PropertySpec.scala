package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.{Frame, Exprs => E}

/** Algebraic properties of the engine surface (SURVEY.md §5 plan): laws
  * that must hold for ANY data, checked over ScalaCheck-generated inputs
  * (driven with explicit seeds so failures are reproducible). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Double)]] = Gen.listOfN(60,
    Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(-100.0, 100.0)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("filter(p1).filter(p2) == filter(p1 && p2)") {
    for ((rows, i) <- samples(rowsGen, 8).zipWithIndex) {
      val thr = -50.0 + i * 12.5
      val df = rows.toDF("k", "v")
      val p1 = E.col("v") >= E.lit(thr)
      val p2 = E.col("k") =!= E.lit(i.toLong)
      val a = Frame(df).filter(p1).filter(p2).collect().map(_.toSeq).toSet
      val b = Frame(df).filter(p1 && p2).collect().map(_.toSeq).toSet
      assert(a == b, s"seed case $i")
    }
  }

  test("grouped SUM is invariant under repartitioning") {
    for ((rows, i) <- samples(rowsGen, 8).zipWithIndex) {
      // long values -> exact sums regardless of partial-agg order
      val df = rows.map { case (k, v) => (k, v.toLong) }.toDF("k", "v")
      val parts = 1 + (i % 7)
      val a = Frame(df).aggregate(Seq(E.col("k")), Seq(E.sum(E.col("v"))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = Frame(df.repartition(parts))
        .aggregate(Seq(E.col("k")), Seq(E.sum(E.col("v"))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b, s"seed case $i")
    }
  }

  test("distinct union cardinality: max(|A|,|B|) <= |A ∪ B| <= |A| + |B|") {
    val gs = samples(rowsGen, 8)
    for (Seq(ra, rb) <- gs.grouped(2) if ra != rb) {
      val a = Frame(ra.toDF("k", "v").select(col("k")))
      val b = Frame(rb.toDF("k", "v").select(col("k")))
      val da = a.distinct().count(); val db = b.distinct().count()
      val u = a.union(b).distinct().count()
      assert(u <= da + db && u >= math.max(da, db))
    }
  }

  test("projection then projection composes") {
    for (rows <- samples(rowsGen, 4)) {
      val df = rows.toDF("k", "v")
      val a = Frame(df).project(E.col("k"), (E.col("v") * E.lit(2.0)).as("w"))
        .project(E.col("w")).collect().map(_.getDouble(0)).sorted.toSeq
      val b = Frame(df).project((E.col("v") * E.lit(2.0)).as("w"))
        .collect().map(_.getDouble(0)).sorted.toSeq
      assert(a == b)
    }
  }

  private val textGen: Gen[String] = Gen.listOfN(12,
    Gen.oneOf("alpha", "beta", "gamma", "user@example.org", "10.0.0.42",
      "1234567890", "call", "now", "words")).map(_.mkString(" "))

  test("PII redaction is idempotent: redacting twice changes nothing") {
    // the replacement tokens <EMAIL>/<IP>/<NUM> match none of the
    // patterns, so a second pass must be the identity
    for ((texts, i) <- samples(Gen.listOfN(20, textGen), 5).zipWithIndex) {
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val once = graft.ops.TextOps.redactPii(df)
        .select(col("doc_id"), col("text_redacted").as("text"))
      val twice = graft.ops.TextOps.redactPii(once)
        .select("doc_id", "text_redacted")
      val a = once.as[(Long, String)].collect().toMap
      val b = twice.as[(Long, String)].collect().toMap
      assert(a == b, s"seed case $i")
    }
  }

  test("stratified sample is always a subset; rate 100 is the identity") {
    for ((rows, i) <- samples(rowsGen, 5).zipWithIndex) {
      val df = rows.zipWithIndex.map { case ((k, v), j) =>
        (j.toLong, s"src${k % 3}", s"text $k $v") }.toDF("id", "source", "text")
      val pcts = Map("src0" -> (i * 20) % 101, "src1" -> 100)
      val sampled = graft.ops.Sampling.stratifiedSample(df, "source", "text", pcts)
      val all = df.select("id").as[Long].collect().toSet
      val kept = sampled.select("id").as[Long].collect().toSet
      assert(kept.subsetOf(all))
      // rate-100 strata keep every row
      val src1All = df.where(col("source") === "src1").count()
      assert(sampled.where(col("source") === "src1").count() == src1All)
    }
  }

  test("mixture sampling hits each source's token budget in expectation") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 2000).map { i =>
      (i.toLong, s"s${i % 4}", 50L + rnd.nextInt(100)) }
      .toDF("id", "source", "toks")
    val weights = Map("s0" -> 0.5, "s1" -> 0.25, "s2" -> 0.25)
    val budget = 300000L
    val out = graft.ops.Sampling.mixtureToBudget(df, "source", "id",
      "toks", weights, budget)
    val emitted = out.groupBy("source")
      .agg(sum(col("toks") * col("n_copies")).as("e"))
      .as[(String, Long)].collect().toMap
    // unweighted source drops out entirely
    assert(!emitted.contains("s3"))
    // per-source emitted tokens within 10% of target (md5 bucket noise)
    for ((s, w) <- weights) {
      val target = budget * w
      assert(math.abs(emitted(s) - target) < target * 0.10,
        s"source $s emitted ${emitted(s)} vs target $target")
    }
    // s0's fraction is ~2.3: every kept doc repeats at least twice
    val minCopies = out.where(col("source") === "s0")
      .agg(min("n_copies")).as[Long].collect().head
    assert(minCopies >= 2)
    // determinism: identical output on re-run
    val again = graft.ops.Sampling.mixtureToBudget(df, "source", "id",
      "toks", weights, budget)
      .select("id", "n_copies").as[(Long, Long)].collect().toSet
    assert(again == out.select("id", "n_copies")
      .as[(Long, Long)].collect().toSet)
  }

  test("range joins equal the brute-force theta join on random intervals") {
    // random keys/times stress bin boundaries (times land on multiples of
    // small primes vs binWidth 10) and hot keys (keys drawn from 0..4).
    // Times span NEGATIVE values too (review r12): pre-epoch data must
    // floor-bin correctly, not vanish or fold bins across zero
    val pointsGen = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(-200L, 200L)))
    val ivGen = Gen.listOfN(40, Gen.zip(Gen.zip(
      Gen.chooseNum(0L, 4L), Gen.chooseNum(-200L, 200L)),
      Gen.chooseNum(0L, 60L)))
    for (i <- 0 until 6) {
      val pts = samples(pointsGen, i + 1).last.zipWithIndex
        .map { case ((k, t), id) => (id.toLong, k, t) }
      val ivs = samples(ivGen, i + 1).last.zipWithIndex
        .map { case (((k, s), len), id) => (id.toLong, k, s, s + len) }
      val p = pts.toDF("pid", "pk", "pt")
      val v = ivs.toDF("iid", "ik", "is", "ie")
      val got = graft.ops.RangeJoin.pointInInterval(p, "pk", "pt",
          v, "ik", "is", "ie", binWidth = 10L)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = pts.flatMap { case (pid, pk, pt) =>
        ivs.collect { case (iid, ik, s, e) if ik == pk && pt >= s && pt < e =>
          (pid, iid) }
      }.sorted
      assert(got == want, s"pointInInterval case $i")
      val ov = graft.ops.RangeJoin.intervalOverlap(
          v, "ik", "is", "ie",
          v.toDF("jid", "jk", "js", "je"), "jk", "js", "je", binWidth = 10L)
        .select("iid", "jid").as[(Long, Long)].collect().sorted.toSeq
      val wantOv = ivs.flatMap { case (a, ak, as_, ae) =>
        ivs.collect { case (b, bk, bs, be)
          if ak == bk && as_ < ae && bs < be && as_ < be && bs < ae => (a, b) }
      }.sorted
      assert(ov == wantOv, s"intervalOverlap case $i")
    }
  }

  test("int8 quantization error never exceeds scale/2 on random vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    for ((vecs, i) <- samples(Gen.listOfN(10, vecGen), 3).zipWithIndex) {
      val df = vecs.zipWithIndex.map { case (v, j) => (j.toLong, v.toArray) }
        .toDF("id", "v")
      val bad = df.select(col("id"),
          graft.ops.Similarity.quantizeInt8(col("v")).as("quant"), col("v"))
        .select(col("id"), col("quant.scale").as("s"),
          graft.ops.Similarity.dequantizeInt8(col("quant")).as("deq"), col("v"))
        .as[(Long, Double, Seq[Float], Seq[Float])].collect()
        .filter { case (_, s, deq, v) =>
          v.zip(deq).exists { case (x, d) => math.abs(x - d) > s / 2 + 1e-6 } }
      assert(bad.isEmpty, s"seed case $i: ${bad.map(_._1).mkString(",")}")
    }
  }

  test("weighted sampling is deterministic and an extreme weight always wins") {
    import graft.ops.Sampling
    val docs = (1L to 100L).map(i => (i, s"doc number $i", 1.0)) :+
      ((999L, "the heavy one", 1e9))
    val df = docs.toDF("doc_id", "text", "w")
    def run() = Sampling.weightedSample(df, "text", "doc_id", col("w"), 10)
      .select("doc_id").as[Long].collect().toSeq
    val top = run()
    // priority u^(1/1e9) ~ 1.0 for any u: the heavy row must lead
    assert(top.head == 999L)
    assert(top == run(), "selection must be reproducible")
    // k caps the output; all rows distinct
    assert(top.size == 10 && top.distinct.size == 10)
  }

  test("BPE expression == fold encoder on rules trained from random corpora") {
    import graft.ops.TextOps
    // random word soup over a tiny alphabet (dense adjacent-pair
    // statistics -> deep merge chains), trained per corpus, then both
    // encoders replay the learned rules over the same corpus
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val docGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(25, docGen)
    for ((corpus, i) <- samples(corpusGen, 6).zipWithIndex) {
      val docs = corpus.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val rules = TextOps.bpeMerges(docs, numMerges = 6)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val fold = TextOps.bpeEncode(docs, rules)
        .as[(Long, Seq[String], Long)].collect().sortBy(_._1).toSeq
      val fast = TextOps.bpeEncodeFast(docs, rules)
        .as[(Long, Seq[String], Long)].collect().sortBy(_._1).toSeq
      assert(fast == fold, s"seed case $i (rules=$rules)")
    }
  }

  test("DSIR importance weights rank target-like docs above off-target") {
    import graft.ops.Sampling
    // target distribution: "alpha beta" phrasing; off-target: "zq xv"
    val target = (0L to 9L).map(i => (i, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (100L, "alpha beta alpha beta"), // exactly target-like
      (101L, "alpha beta zq xv"),      // half
      (102L, "zq xv zq xv"))           // off-target
      .toDF("doc_id", "text")
    val w = Sampling.importanceWeights(raw, target, nBuckets = 64)
      .as[(Long, Double)].collect().toMap
    assert(w(100L) > w(101L) && w(101L) > w(102L), s"weights: $w")
    // resample selects in weight order with the id tie-break
    val top = Sampling.importanceResample(raw, target, nBuckets = 64, k = 2)
      .select("doc_id").as[Long].collect().toSeq
    assert(top == Seq(100L, 101L))
    // determinism: a repartitioned input gives bit-identical weights
    val w2 = Sampling.importanceWeights(raw.repartition(7), target,
      nBuckets = 64).as[(Long, Double)].collect().toMap
    assert(w2 == w)
  }

  test("DSIR weights equal the brute-force model on a tiny fixture") {
    import graft.ops.Sampling
    val target = Seq((0L, "a b c")).toDF("doc_id", "text")
    val raw = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val nB = 16
    def feats(t: String): Seq[String] = {
      val ws = t.trim.toLowerCase.split("\\s+").toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (x, y) => s"$x $y" }
    }
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % nB
    }
    val tc = feats("a b c").map(bucket).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val rawDocs = Seq(1L -> "a b", 2L -> "c d")
    val rc = rawDocs.flatMap(d => feats(d._2)).map(bucket)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (tc.values.sum, rc.values.sum)
    def micros(x: Double) = BigDecimal(math.log(x) * 1000000.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = rawDocs.map { case (id, t) =>
      id -> feats(t).map { f =>
        val b = bucket(f)
        micros((tc.getOrElse(b, 0L) + 1.0) / (tt + nB)) -
          micros((rc(b) + 1.0) / (tr + nB))
      }.sum.toDouble / 1e6
    }.toMap
    val got = Sampling.importanceWeights(raw, target, nBuckets = nB)
      .as[(Long, Double)].collect().toMap
    assert(got == expect, s"got $got want $expect")
  }

  test("md5_bucket_grams equals the SQL md5 formulation, edge cases included") {
    // the fused DSIR pass must reproduce conv(substring(md5(f),1,8),16,10)%n
    // for every unigram+bigram — including the [''] empty-split artifact
    // and multi-whitespace separators (bigram joins with ONE space)
    val n = 64
    val texts = Seq("a b c", "word", "", "   ", "x  \t y", "a a a a")
    val got = texts.toDF("t")
      .selectExpr(s"md5_bucket_grams(trim(lower(t)), $n) AS bk")
      .as[Seq[Long]].collect()
    def ref(t: String): Seq[Long] = {
      val ws = t.trim.toLowerCase.split("\\s+").toSeq
      val fs = ws ++ ws.zip(ws.drop(1)).map { case (x, y) => s"$x $y" }
      fs.map { f =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 8), 16) % n
      }
    }
    texts.zip(got).foreach { case (t, g) =>
      assert(g == ref(t), s"text=$t got=$g want=${ref(t)}")
    }
  }

  test("weighted sampling rejects non-positive weights at runtime") {
    import graft.ops.Sampling
    val df = Seq((1L, "a", 1.0), (2L, "b", 0.0), (3L, "c", 2.0))
      .toDF("doc_id", "text", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(df, "text", "doc_id", col("w"), 2).collect() }
    assert(e.getMessage.contains("strictly positive"),
      s"unexpected error: ${e.getMessage}")
    val neg = Seq((1L, "a", 1.0, "g"), (2L, "b", -3.0, "g"))
      .toDF("doc_id", "text", "w", "src")
    val e2 = intercept[Exception] {
      Sampling.weightedSampleByGroup(neg, "text", "doc_id", "src",
        col("w"), 1).collect() }
    assert(e2.getMessage.contains("strictly positive"))
  }

  /** The priority expression weightedSample* computes, restated for the
    * window references below. */
  private def samplePriority(keyCol: String, wCol: String) = {
    val u = (conv(substring(md5(col(keyCol).cast("binary")), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / lit(4294967297.0)
    round(pow(u, lit(1.0) / col(wCol)), 9)
  }

  test("weightedSampleByGroup: the bottom-k aggregate path selects " +
      "exactly what a (priority desc, id) window does (property)") {
    import graft.ops.Sampling
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // duplicated (text, w) rows within groups plant PRIORITY TIES, so
      // the id tie-break is load-bearing, not decorative
      val rows = (1L to 120L).map { i =>
        (i, s"text-$trial-${i % 40}-${rnd.nextInt(8)}",
          1.0 + (i % 40) % 5, s"g${i % 4}")
      }
      val df = rows.toDF("doc_id", "text", "w", "src")
      val viaAgg = Sampling.weightedSampleByGroup(df, "text", "doc_id",
          "src", col("w"), 7)
        .select("doc_id", "src", "priority")
        .as[(Long, String, Double)].collect().toSet
      val ref = df.withColumn("priority", samplePriority("text", "w"))
        .withColumn("_rn", row_number().over(Window.partitionBy(col("src"))
          .orderBy(col("priority").desc, col("doc_id"))))
        .where(col("_rn") <= 7)
        .select("doc_id", "src", "priority")
        .as[(Long, String, Double)].collect().toSet
      assert(viaAgg == ref, s"trial $trial")
      assert(viaAgg.groupBy(_._2).forall(_._2.size == 7), s"trial $trial")
    }
  }

  test("weightedSampleByGroup: string ids ride the bounded aggregate — " +
      "window-equivalent with the id-HASH tie-break, no window in the plan") {
    import graft.ops.Sampling
    import org.apache.spark.sql.expressions.Window
    // duplicated (text, w) per group -> tied priorities, so the hash
    // tie-break decides real selections
    val rows = (1L to 90L).map { i =>
      (s"id-${"%03d".format(i)}", s"t-${i % 15}", 1.0 + (i % 15) % 4,
        s"g${i % 3}")
    }
    val df = rows.toDF("doc_id", "text", "w", "src")
    val got = Sampling.weightedSampleByGroup(df, "text", "doc_id",
      "src", col("w"), 5)
    // retired fallback stays retired: no row_number window anywhere
    val windows = got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, "string-id path must not plan a window")
    val gotSet = got.select("doc_id", "src", "priority")
      .as[(String, String, Double)].collect().toSet
    // reference: the same priorities ranked by (priority desc, hash60(id))
    // — the dictionary-encoded contract for non-integral ids
    val idHash = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":kmv"))), 1, 15), 16, 10).cast("long")
    val ref = df.withColumn("priority", samplePriority("text", "w"))
      .withColumn("_h", idHash)
      .withColumn("_rn", row_number().over(Window.partitionBy(col("src"))
        .orderBy(col("priority").desc, col("_h"))))
      .where(col("_rn") <= 5)
      .select("doc_id", "src", "priority")
      .as[(String, String, Double)].collect().toSet
    assert(gotSet == ref)
    assert(gotSet.groupBy(_._2).forall(_._2.size == 5))
  }

  test("weightedSampleByGroup and rowSampleBy keep the NULL group's rows") {
    import graft.ops.{Kmv, Sampling}
    val df = (1L to 40L).map(i =>
        (i, s"t$i", 1.0, if (i % 2 == 0) "g" else null))
      .toDF("doc_id", "text", "w", "src")
    // a NULL group is a real group to groupBy (and was to the window
    // form) — the null-safe join-back must keep its k survivors
    val ws = Sampling.weightedSampleByGroup(df, "text", "doc_id", "src",
      col("w"), 3).collect()
    assert(ws.count(_.isNullAt(3)) == 3, "null group lost in weighted sample")
    assert(ws.count(r => !r.isNullAt(3)) == 3)
    val rs = Kmv.rowSampleBy(df, "src", "doc_id", 4).collect()
    assert(rs.count(_.isNullAt(3)) == 4, "null group lost in row cap")
    assert(rs.count(r => !r.isNullAt(3)) == 4)
  }

  test("incrementalAgg equals full recompute on random change logs") {
    import graft.ops.Cdc
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val groups = Vector("x", "y", "z", "w")
      val base = (1L to 40L).map(k =>
        (k, groups(rnd.nextInt(3)), (rnd.nextInt(4000) - 1000) / 16.0))
      // random log: updates (possibly group-moving), deletes, inserts,
      // multiple changes per key with a total (ts, cid) order
      val changes = (1 to 60).map { i =>
        val k = rnd.nextInt(55).toLong + 1 // keys 41..55 are inserts
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (k, groups(rnd.nextInt(4)), (rnd.nextInt(4000) - 1000) / 16.0,
          op, rnd.nextInt(10).toLong, i.toLong)
      }
      val baseDf = base.toDF("k", "g", "v")
      val chDf = changes.toDF("k", "g", "v", "op", "ts", "cid")
      val baseAgg = baseDf.groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,6)")).as("total"))
      val inc = Cdc.incrementalAgg(baseDf, baseAgg, chDf,
          Seq("k"), "g", "v", Seq("ts", "cid"))
        .select(col("g"), col("n"), col("total").cast("double"))
        .as[(String, Long, Double)].collect().sortBy(_._1)
      val full = Cdc.applyChanges(baseDf, chDf, Seq("k"), Seq("ts", "cid"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("v").cast("decimal(18,6)")).cast("decimal(18,6)")
            .cast("double").as("total"))
        .as[(String, Long, Double)].collect().sortBy(_._1)
      assert(inc.toSeq == full.toSeq, s"trial $trial diverged")
    }
  }

  test("geo radius pairs equal brute force on random point clouds") {
    import graft.ops.Geo
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val pts = (1L to 120L).map(i =>
        (i, (rnd.nextInt(2001) - 1000).toLong,
          (rnd.nextInt(2001) - 1000).toLong))
      val r = 60L + rnd.nextInt(200)
      val got = Geo.radiusPairs(pts.toDF("pid", "x", "y"),
          "pid", "x", "y", r)
        .as[(Long, Long, Long)].collect().toSeq.sorted
      val brute = (for {
        (ai, ax, ay) <- pts; (bi, bx, by) <- pts
        if ai < bi
        d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
        if d2 <= r * r
      } yield (ai, bi, d2)).sorted
      assert(got == brute, s"trial $trial (r=$r) diverged")
      assert(got == got.distinct, s"trial $trial duplicated a pair")
    }
  }

  test("bfsHops equals a local BFS on random directed graphs") {
    import graft.ops.Graph
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 2) {
      val n = 40
      val edges = (1 to 150).map(_ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")).distinct
      val seeds = Seq("n0", "n1", s"n${rnd.nextInt(n)}").distinct
      val cap = 4
      val got = Graph.bfsHops(edges.toDF("src", "dst"),
          "src", "dst", seeds.toDF("node"), "node", maxHops = cap)
        .as[(String, Int)].collect().toMap
      // local frontier BFS
      val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      var h = 0
      while (h < cap && frontier.nonEmpty) {
        val next = frontier.flatMap(adj.getOrElse(_, Nil))
          .filterNot(dist.contains)
        next.foreach(v => dist += v -> (h + 1))
        frontier = next; h += 1
      }
      assert(got == dist, s"trial $trial diverged")
    }
  }

  test("snapshotDiff statuses equal brute force on random snapshots") {
    import graft.ops.Cdc
    val rnd = new scala.util.Random(321)
    val oldS = (1L to 50L).map(k => (k,
      if (rnd.nextInt(5) == 0) None else Some(s"v${rnd.nextInt(4)}")))
    val newS = (11L to 60L).map(k => (k,
      if (rnd.nextInt(5) == 0) None else Some(s"v${rnd.nextInt(4)}")))
    val got = Cdc.snapshotDiff(oldS.toDF("k", "v"), newS.toDF("k", "v"),
        Seq("k"))
      .as[(Long, String)].collect().toMap
    val om = oldS.toMap; val nm = newS.toMap
    val want = (om.keySet ++ nm.keySet).map { k =>
      k -> ((om.get(k), nm.get(k)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _ => "changed"
      })
    }.toMap
    assert(got == want)
  }

  test("diverse sample: per-orthant cap, determinism, short-vector drop") {
    import graft.ops.Sampling
    // 3 sign dims -> orthant = bits of (x>0, y>0, z>0); 10 vectors in
    // orthant 7, two in orthant 0, one too short to bucket
    val rows =
      (1L to 10L).map(i => (i, Array(1f, 2f, 3f))) ++
      Seq((20L, Array(-1f, -1f, -0.5f)), (21L, Array(0f, -2f, -3f)),
        (30L, Array(1f, 1f)))
    val df = rows.toDF("vec_id", "embedding")
    def run() = Sampling.diverseSample(df, "vec_id", "embedding",
        signDims = 3, perBucket = 2)
      .as[(Long, Long)].collect().toSeq.sorted
    val got = run()
    assert(got == run(), "selection must be deterministic")
    val byBucket = got.groupBy(_._2)
    assert(byBucket(7L).size == 2, "dense orthant capped at perBucket")
    assert(byBucket(0L).map(_._1).toSet == Set(20L, 21L),
      "sparse orthant keeps everything (zero coord counts as non-positive)")
    assert(!got.exists(_._1 == 30L), "short vector cannot bucket")
    // cap binds on the md5 priority order, not on vec_id order
    val md5Order = (1L to 10L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:42".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(byBucket(7L).map(_._1).toSet == md5Order.take(2).toSet)
  }

  test("temperature sample flattens a skewed group mix deterministically") {
    val rows = (1L to 800L).map(i => (i, "big")) ++
      (801L to 850L).map(i => (i, "small"))
    val df = rows.toDF("id", "g")
    def run() = graft.ops.Sampling.temperatureSample(df, "g", "id",
        alphaHalves = 1, targetNum = 1, targetDen = 2)
      .as[(Long, String)].collect().toSeq.sorted
    val got = run()
    assert(got == run(), "selection must be deterministic")
    val kept = got.groupBy(_._2).view.mapValues(_.size).toMap
    // alpha=0.5 on counts (800, 50): W = sqrt(800)+sqrt(50) ~ 35.4;
    // target 425 rows split ~ (28.3, 7.07)/35.4 -> (340, 85). The small
    // group's share (20%) far exceeds its raw share (5.9%), and its
    // 85-row target exceeds the 50 on hand -> p clamps to 1, keep all
    assert(kept("small") == 50, "small group keeps everything (p clamps at 1)")
    // big group keeps ~340 of 800 (md5 bucket noise ~ +-3%)
    assert(kept("big") > 300 && kept("big") < 380, s"got ${kept("big")}")
    // alpha=1 degenerates to a uniform thin: every group keeps ~half
    val prop = graft.ops.Sampling.temperatureSample(df, "g", "id", 2, 1, 2)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(prop("big") > 360 && prop("big") < 440)
    assert(prop("small") > 15 && prop("small") < 35)
    // alpha=0: equal ABSOLUTE shares per group, small clamps to all
    val eq = graft.ops.Sampling.temperatureSample(df, "g", "id", 0, 1, 2)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(eq("small") == 50)
    intercept[IllegalArgumentException](
      graft.ops.Sampling.temperatureSample(df, "g", "id", 3, 1, 2))
    intercept[IllegalArgumentException](
      graft.ops.Sampling.temperatureSample(df, "g", "id", 1, 3, 2))
    // group-cardinality contract (round 10): a data-cardinality group
    // column is rejected with guidance instead of collected; at the
    // boundary (#groups == maxGroups) everything still works
    val atBoundary = graft.ops.Sampling.temperatureSample(df, "g", "id",
      1, 1, 2, maxGroups = 2).count()
    assert(atBoundary > 0)
    val e = intercept[IllegalArgumentException](
      graft.ops.Sampling.temperatureSample(df, "id", "id", 1, 1, 2,
        maxGroups = 100))
    assert(e.getMessage.contains("rowSampleBy"), e.getMessage)
  }

  test("WARC roundtrip holds for ANY body bytes (property)") {
    import java.nio.charset.StandardCharsets.UTF_8
    // bodies drawn to be hostile: CRLFs, the record terminator, the
    // magic itself, unicode, empties
    val hostile = Gen.oneOf("", "\r\n\r\n", "WARC/1.0\r\n", "naïve ☕",
      "Content-Length: 9\r\n", "a\r\nb\r\n\r\nc")
    val bodyGen: Gen[String] = Gen.oneOf(
      hostile, Gen.listOfN(12, Gen.asciiPrintableChar).map(_.mkString),
      Gen.zip(hostile, hostile).map { case (a, b) => a + b })
    val docsGen = Gen.listOfN(8, bodyGen)
    for ((bodies, i) <- samples(docsGen, 20).zipWithIndex) {
      val blob = bodies.zipWithIndex.map { case (body, j) =>
        s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <r$j>\r\n" +
          s"WARC-Target-URI: u\r\nContent-Length: " +
          s"${body.getBytes(UTF_8).length}\r\n\r\n$body\r\n\r\n"
      }.mkString.getBytes(UTF_8)
      val parsed = graft.sources.Warc.parseFile(0L, blob).toSeq
      assert(parsed.map(_.body) == bodies, s"seed case $i")
      assert(parsed.map(_.record_id) == bodies.indices.map(j => s"r$j"),
        s"seed case $i")
    }
  }

  test("robots admission equals the brute-force REP reference (property)") {
    import spark.implicits._
    val prefixGen = Gen.oneOf("/a", "/a/", "/a/b", "/ab", "/b", "/b/c", "/")
    val ruleGen = Gen.zip(prefixGen, Gen.oneOf(true, false))
    val rulesGen = Gen.listOfN(6, ruleGen).map(_.distinct)
    val pathGen = Gen.oneOf("/a", "/a/", "/a/b", "/a/bc", "/ab", "/abc",
      "/b", "/b/c", "/c", "/")
    val caseGen = Gen.zip(rulesGen, Gen.listOfN(10, pathGen))
    def reference(rules: Seq[(String, Boolean)], path: String): Boolean = {
      val matches = rules.filter { case (p, _) => path.startsWith(p) }
      if (matches.isEmpty) true
      else matches.maxBy { case (p, allow) => (p.length, allow) }._2
    }
    for (((rules, paths), i) <- samples(caseGen, 8).zipWithIndex) {
      val rulesDf = rules.map { case (p, a) => ("h", p, a) }
        .toDF("host", "prefix", "allow")
      val urls = paths.zipWithIndex
        .map { case (p, j) => (j.toLong, "h", p) }
        .toDF("id", "host", "path")
      val got = graft.ops.Robots
        .filterAllowed(urls, rulesDf, "host", "path", "id")
        .select($"id", $"allowed").as[(Long, Boolean)].collect().toMap
      val want = paths.zipWithIndex
        .map { case (p, j) => j.toLong -> reference(rules, p) }.toMap
      assert(got == want, s"seed case $i: rules=$rules paths=$paths")
    }
  }
  test("chunkBySentences partitions the sentences for ANY doc (property)") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val sentence = Gen.chooseNum(1, 7).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ") + "."))
    val docGen = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, sentence).map(_.mkString(" ")))
    for ((text, i) <- samples(docGen, 20).zipWithIndex; max <- Seq(3, 8)) {
      val chunks = graft.ops.TextOps.chunkBySentences(
          Seq((1L, text)).toDF("doc_id", "text"), maxTokens = max)
        .orderBy("chunk_id")
        .as[(Long, Int, Int, Int, String)].collect().toSeq
      val sents = graft.ops.TextOps.sentences(col("text"))
      val expected = Seq((1L, text)).toDF("doc_id", "text")
        .select(sents).as[Seq[String]].head()
      // chunk ids are 0..n-1 dense; concatenating chunks restores the
      // sentence list exactly (a partition, in order)
      assert(chunks.map(_._2) == chunks.indices, s"case $i/$max ids")
      assert(chunks.flatMap(_._5.split('|').filter(_.nonEmpty)) == expected,
        s"case $i/$max lost or reordered sentences")
      // every chunk over budget is a single oversized sentence
      chunks.foreach { c =>
        assert(c._4 <= max || c._3 == 1, s"case $i/$max budget") }
    }
  }

  test("preferencePairs halves never overlap for ANY scores (property)") {
    import spark.implicits._
    val rowGen = Gen.zip(Gen.oneOf("g1", "g2"), Gen.chooseNum(0L, 100L))
    val dataGen = Gen.listOfN(14, rowGen)
    for ((rows, i) <- samples(dataGen, 10).zipWithIndex) {
      val df = rows.zipWithIndex
        .map { case ((g, sc), id) => (g, id.toLong, sc) }
        .toDF("g", "id", "score")
      val got = graft.ops.Sampling.preferencePairs(df, "g", "id",
          "score", k = 5)
        .select("chosen_id", "rejected_id", "chosen_score",
          "rejected_score")
        .as[(Long, Long, Long, Long)].collect()
      val chosen = got.map(_._1).toSet
      val rejected = got.map(_._2).toSet
      assert(chosen.intersect(rejected).isEmpty, s"case $i overlap")
      assert(got.forall(r => r._3 > r._4), s"case $i zero-gap leaked")
    }
  }

  test("preferencePairs decimal scores select identically to brute force " +
      "(property)") {
    // DecimalType has no exact long image, so this is the one selection
    // path that stays on the group-partitioned window (VERDICT r11 #7) —
    // pin it to the documented rule: i-th best (score desc, id asc) pairs
    // with i-th worst (score asc, id desc), ranks capped at min(k, n/2),
    // zero-gap pairs dropped
    val rowGen = Gen.zip(Gen.oneOf("g1", "g2", "g3"),
      Gen.chooseNum(-999L, 999L))
    for ((rows, i) <- samples(Gen.listOfN(16, rowGen), 8).zipWithIndex) {
      val data = rows.zipWithIndex.map { case ((g, c), id) =>
        (g, id.toLong, BigDecimal(c) / 100) }
      val df = data.toDF("g", "id", "score")
        .withColumn("score", col("score").cast("decimal(10,2)"))
      assert(df.schema("score").dataType ==
        org.apache.spark.sql.types.DecimalType(10, 2))
      val got = graft.ops.Sampling.preferencePairs(df, "g", "id",
          "score", k = 3)
        .select("g", "pair_rank", "chosen_id", "chosen_score",
          "rejected_id", "rejected_score")
        .as[(String, Int, Long, BigDecimal, Long, BigDecimal)]
        .collect().toSet
      val want = data.groupBy(_._1).flatMap { case (g, xs) =>
        val best = xs.sortWith((a, b) =>
          a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
        val worst = xs.sortWith((a, b) =>
          a._3 < b._3 || (a._3 == b._3 && a._2 > b._2))
        (0 until math.min(3, xs.length / 2)).flatMap { j =>
          val c = best(j); val r = worst(j)
          if (c._3 > r._3) Some((g, j + 1, c._2, c._3, r._2, r._3))
          else None
        }
      }.toSet
      assert(got == want, s"case $i")
    }
  }

  test("diverseSample equals the brute-force per-orthant window rule " +
      "for ANY vectors (property)") {
    // the bottom-k-pair aggregate selection (r12) must pick exactly what
    // the retired window picked: per sign-orthant, (md5(id:seed), id)
    // ascending, top perBucket — on the integral-id direct-decode path
    // AND the string-id hash60 dictionary path
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val vecGen = Gen.listOfN(3, Gen.chooseNum(-5, 5).map(_.toFloat))
    for ((vecs, i) <- samples(Gen.listOfN(40, vecGen), 6).zipWithIndex) {
      val rows = vecs.zipWithIndex.map { case (v, id) =>
        (id.toLong, v.toArray) }
      val want = rows.map { case (id, v) =>
        (id, (if (v(0) > 0f) 1L else 0L) + (if (v(1) > 0f) 2L else 0L))
      }.groupBy(_._2).flatMap { case (_, xs) =>
        xs.sortBy { case (id, _) => (md5hex(s"$id:7"), id) }.take(2)
      }.toSet
      val got = graft.ops.Sampling.diverseSample(rows.toDF("vec_id",
          "embedding"), "vec_id", "embedding",
          signDims = 2, perBucket = 2, seed = 7L)
        .as[(Long, Long)].collect().toSet
      assert(got == want, s"case $i long ids")
      // string ids: same selection (the md5 priority is keyed on the
      // CAST string, identical for "N" vs N), ids decode via hash60
      val gotStr = graft.ops.Sampling.diverseSample(
          rows.map { case (id, v) => (id.toString, v) }
            .toDF("vec_id", "embedding"),
          "vec_id", "embedding", signDims = 2, perBucket = 2, seed = 7L)
        .as[(String, Long)].collect()
        .map { case (id, b) => (id.toLong, b) }.toSet
      assert(gotStr == want, s"case $i string ids")
    }
  }

  test("mixtureToBudget totals are policy-bounded: a data-cardinality " +
      "source column cannot inflate the driver collect") {
    // 5000 distinct sources, 2 weighted: the totals aggregation filters
    // to the weight map's keys BEFORE grouping (VERDICT r11 weak), so
    // only the weighted sources are ever aggregated or emitted
    val df = (1L to 5000L).map(i => (i, s"src$i", 100L))
      .toDF("id", "source", "toks")
    val out = graft.ops.Sampling.mixtureToBudget(df, "source", "id",
      "toks", Map("src1" -> 0.5, "src2" -> 0.5), budgetTokens = 400L)
    // each weighted source holds 100 tokens, target 200 -> f = 2.0
    // exactly: every kept doc carries exactly 2 copies, nothing else
    val copies = out.select("id", "n_copies").as[(Long, Long)]
      .collect().toMap
    assert(copies == Map(1L -> 2L, 2L -> 2L))
  }

  test("mixtureToBudget: a weighted source with all-NULL tokens is " +
      "treated as empty, not an NPE") {
    val df = Seq[(Long, String, java.lang.Long)](
      (1L, "good", 100L), (2L, "good", 100L),
      (3L, "hollow", null), (4L, "hollow", null))
      .toDF("id", "source", "toks")
    val out = graft.ops.Sampling.mixtureToBudget(df, "source", "id",
      "toks", Map("good" -> 0.5, "hollow" -> 0.5), budgetTokens = 200L)
    val copies = out.select("id", "n_copies").as[(Long, Long)]
      .collect().toMap
    // hollow has no usable tokens -> excluded like a zero-total
    // source; good's docs keep by the deterministic md5 bucket at
    // f = 0.5 (each doc independently 0 or 1 copies — only the
    // hollow-source exclusion and the absence of the NPE are pinned)
    assert(copies.keySet.subsetOf(Set(1L, 2L)), s"got $copies")
    assert(copies.values.forall(_ == 1L), s"got $copies")
  }

  test("HLL merge is commutative, associative, idempotent for ANY key sets (property)") {
    import graft.ops.Hll
    val setGen = Gen.listOfN(80, Gen.chooseNum(0L, 400L))
    def regs(df: org.apache.spark.sql.DataFrame): Map[Int, Int] =
      df.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    for ((pair, i) <- samples(Gen.zip(setGen, setGen), 6).zipWithIndex) {
      val (xs, ys) = pair
      val a = Hll.sketch(xs.toDF("k"), "k", 5)
      val b = Hll.sketch(ys.toDF("k"), "k", 5)
      val ab = regs(Hll.merge(a, b))
      val ba = regs(Hll.merge(b, a))
      assert(ab == ba, s"case $i commutativity")
      assert(regs(Hll.merge(a, a)) == regs(a), s"case $i idempotence")
      // merge equals the sketch of the concatenated input
      val whole = regs(Hll.sketch((xs ++ ys).toDF("k"), "k", 5))
      assert(ab == whole, s"case $i union")
    }
  }

  test("CMS never underestimates and conserves mass for ANY multiset (property)") {
    import graft.ops.Freq
    val dataGen = Gen.listOfN(120, Gen.chooseNum(0, 30).map(n => s"k$n"))
    for ((vals, i) <- samples(dataGen, 6).zipWithIndex) {
      val df = vals.toDF("v").repartition(1 + i % 5)
      val sk = Freq.cmsSketch(df, "v", width = 16, depth = 3)
      // mass conservation per hash row
      val perRow = sk.groupBy("r").sum("cnt").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(perRow.values.forall(_ == vals.length.toLong), s"case $i mass")
      // one-sided guarantee for every present key, even at width 16
      val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val est = Freq.cmsEstimate(sk, exact.keys.toSeq.toDF("v"), "v", 16, 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(exact.forall { case (k, c) => est(k) >= c }, s"case $i bound")
    }
  }

  test("bottom-k merge is a lattice for ANY split of ANY key set (property)") {
    import graft.ops.Kmv
    val dataGen = Gen.listOfN(150,
      Gen.zip(Gen.chooseNum(0L, 400L), Gen.oneOf(0, 1, 2)))
    for ((rows, i) <- samples(dataGen, 6).zipWithIndex) {
      val k = 16 + (i % 3) * 8
      val whole = Kmv.sketch(rows.toDF("key", "part").select(col("key")),
        "key", k).as[Long].collect().toSeq
      // ANY 3-way split: merging the parts' sketches IS the whole sketch
      val parts = (0 to 2).map(p =>
        Kmv.sketch(rows.filter(_._2 == p).toDF("key", "part")
          .select(col("key")), "key", k))
      val merged = Kmv.merge(k, parts: _*).as[Long].collect().toSeq
      assert(merged == whole, s"case $i k=$k")
      // merge is idempotent and order-insensitive
      val twice = Kmv.merge(k, parts(2), parts(0), parts(1), parts(0))
        .as[Long].collect().toSeq
      assert(twice == whole, s"case $i reorder")
      // estimates never disagree between the merged and whole forms
      val ew = Kmv.estimate(Kmv.sketch(rows.toDF("key", "part")
        .select(col("key")), "key", k), k).collect().head.getDouble(0)
      val em = Kmv.estimate(Kmv.merge(k, parts: _*), k)
        .collect().head.getDouble(0)
      assert(ew == em, s"case $i estimate")
    }
  }
}
