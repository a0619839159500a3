package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic embeddings: 40 vectors in R^8; vec 1 = vec 0
  // scaled (cosine 1), vec 2 = vec 0 slightly perturbed (cosine ~0.999)
  private def mkVec(seed: Int): Array[Float] = {
    val r = new java.util.Random(seed)
    Array.fill(8)(r.nextGaussian().toFloat)
  }
  private val v0 = mkVec(100)
  private val vecs: Seq[(Long, Array[Float])] =
    Seq(0L -> v0, 1L -> v0.map(_ * 2.0f),
      2L -> v0.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }) ++
      (3L until 40L).map(i => i -> mkVec(i.toInt))
  private def emb = vecs.toDF("vec_id", "embedding")

  test("dot and cosine expressions compute correct values") {
    val r = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .select(VectorExprs.dot(col("a"), col("b")).as("d"),
        VectorExprs.cosineSim(col("a"), col("b")).as("c"))
      .as[(Double, Double)].collect().head
    assert(r._1 == 32.0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r._2 - expected) < 1e-12)
    // zero-norm guard
    val z = Seq((Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
      .select(VectorExprs.cosineSim(col("a"), col("b"))).as[Double].collect().head
    assert(z == 0.0)
    // mismatched dimensions -> NULL, never a silent prefix-dot
    val m = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
      .select(VectorExprs.dot(col("a"), col("b")).as("d"),
        VectorExprs.cosineSim(col("a"), col("b")).as("c")).collect().head
    assert(m.isNullAt(0) && m.isNullAt(1))
  }

  test("brute-force top-k ranks by cosine with id tie-break") {
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", v0, 3)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).take(2).toSet == Set(0L, 1L)) // cosine exactly 1.0 both
    assert(top(0)._1 == 0L && top(1)._1 == 1L) // tie broken by id
    assert(top(2)._1 == 2L) // the perturbed one
    assert(top(2)._2 > 0.99)
  }

  test("LSH top-k returns a cosine-ranked subset including the near-exact hits") {
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", v0, 5)
      .as[(Long, Double)].collect().map(_._1)
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", v0, 5)
      .as[(Long, Double)].collect()
    // identical-direction vectors share every band with the query
    assert(lsh.map(_._1).contains(0L) && lsh.map(_._1).contains(1L))
    // ranking within the returned set is by cosine desc
    assert(lsh.map(_._2).toSeq == lsh.map(_._2).sorted(Ordering[Double].reverse).toSeq)
    assert(lsh.map(_._1).toSet.subsetOf(vecs.map(_._1).toSet))
    assert(brute.nonEmpty)
  }

  test("cosine near-dup pairs find the planted pair, no unrelated pairs") {
    val r = Similarity.cosineNearDups(emb, "vec_id", "embedding",
      threshold = 0.99, dim = 8)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
    val pairs = r.map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(r.forall(_._3 >= 0.99))
  }

  test("LSH near-dups are deterministic across runs") {
    def run() = Similarity.cosineNearDups(emb, "vec_id", "embedding", 0.99, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().sortBy(identity).toSeq
    assert(run() == run())
  }

  test("semantic dedup keeps the smallest id of each near-dup group and all singletons") {
    // vecs 0/1/2 form a near-dup group at 0.99 (1 = scaled 0, 2 = perturbed
    // 0); keep-first must drop 1 and 2, keep 0, and keep every other row
    val survivors = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.99, dim = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == (Set(0L) ++ (3L until 40L)))
    // survivors carry their original columns (id + vector)
    val cols = Similarity.semanticDedup(emb, "vec_id", "embedding", 0.99, dim = 8)
      .columns.toSeq
    assert(cols == Seq("vec_id", "embedding"))
    // NULL embeddings survive (near nothing)
    val withNull = emb.unionByName(
      Seq((99L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val s2 = Similarity.semanticDedup(withNull, "vec_id", "embedding", 0.99, dim = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(s2.contains(99L))
  }

  test("semantic dedup keep-first invariant over many interleaved dup groups") {
    // 10 direction groups x 3 scaled copies, ids interleaved across
    // groups — scaled copies sit at cosine 1.0 (guaranteed candidate
    // recall: identical sign bits), distinct directions stay far below
    // the threshold, so keep-first must keep exactly the min id of
    // every group
    val groups = (0 until 10).map(g => mkVec(1000 + g))
    val vecs2 = for (g <- 0 until 10; c <- 0 until 3)
      yield (c * 10L + g, groups(g).map(x => x * (c + 1).toFloat))
    val survivors = Similarity.semanticDedup(
        vecs2.toDF("vec_id", "embedding"), "vec_id", "embedding",
        threshold = 0.99, dim = 8)
      .select("vec_id").as[Long].collect().toSet
    // min id of group g is g itself (copy 0)
    assert(survivors == (0L until 10L).toSet)
    // and the survivor set is independent: no surviving pair is a near-dup
    val sv = vecs2.filter(v => survivors(v._1))
    for (Seq((ia, va), (ib, vb)) <- sv.combinations(2)) {
      val cos = {
        val dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(va.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(vb.map(x => x.toDouble * x.toDouble).sum)
        dot / (na * nb)
      }
      assert(cos < 0.99, s"survivors $ia and $ib are near-dups (cos $cos)")
    }
  }

  test("ann recall harness reports full recall on an exact-duplicate probe") {
    // probe = v0; ids 0 and 1 are exact-direction copies, so with k=2 the
    // exact top-2 is {0, 1} and both indexes find it (identical sign bits
    // / same cluster) -> recall exactly 1.0 on both
    val r = Similarity.annRecall(emb, "vec_id", "embedding", v0, k = 2,
        nClusters = 4, nProbe = 2)
      .as[(Long, Long, Double, Double)].collect().head
    assert(r._1 == 2L && r._2 == 2L)
    assert(r._3 == 1.0 && r._4 == 1.0)
  }

  test("knn join matches brute force on tight clusters (full recall regime)") {
    // 4 clusters of 5 scaled copies each: every cluster-mate shares all
    // sign bits, so every true neighbor IS a candidate and the LSH result
    // must equal the exact brute-force top-k
    val clustered = (0 until 20).map { i =>
      val c = mkVec(500 + i / 5)
      (i.toLong, c.map(_ * (1.0f + 0.5f * (i % 5))))
    }
    val df = clustered.toDF("vec_id", "embedding")
    val got = Similarity.knnJoin(df, "vec_id", "embedding", k = 3)
      .select("qid", "nid", "rank").as[(Long, Long, Long)]
      .collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    clustered.foreach { case (qid, v) =>
      val expect = clustered.filter(_._1 != qid)
        .map { case (nid, w) => (nid, cos(v, w)) }
        .sortBy { case (nid, c) => (-c, nid) }.take(3).map(_._1)
      assert(got(qid) == expect, s"qid=$qid: ${got(qid)} vs $expect")
    }
    // every doc got exactly k ranked neighbors, ranks contiguous from 1
    assert(got.values.forall(_.length == 3))
  }

  test("hard negatives exclude self and near-dups via the ceiling alone") {
    // corpus: v0, its exact copy (cosine 1), its light perturbation
    // (cosine ~0.999+), and 37 random vectors
    val anchors = Seq((0L, v0)).toDF("anchor_id", "avec")
    val r = Similarity.hardNegatives(emb, "vec_id", "embedding",
        anchors, "anchor_id", "avec", k = 3, dupCeiling = 0.95)
      .select("vec_id", "cosine", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    // ids 0 (self), 1 (copy), 2 (perturbed) all sit >= 0.95: excluded
    assert(!r.map(_._1).exists(Set(0L, 1L, 2L)), s"positives leaked: $r")
    assert(r.length == 3 && r.map(_._3).toSeq == Seq(1, 2, 3))
    assert(r.forall(_._2 < 0.95))
    // rank 1 is the true best sub-ceiling neighbor by brute force
    val brute = vecs.filter(v => !Set(0L, 1L, 2L).contains(v._1))
      .map { case (id, v) =>
        val dot = v.zip(v0).map { case (a, b) => a.toDouble * b }.sum
        val na = math.sqrt(v.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(v0.map(x => x.toDouble * x).sum)
        (id, dot / (na * nb))
      }.sortBy { case (id, c) => (-c, id) }
    assert(r.head._1 == brute.head._1)
    // scores descend
    assert(r.map(_._2).toSeq == r.map(_._2).sortBy(-(_: Double)).toSeq)
  }

  test("NULL embeddings are skipped, not fatal; dim is inferred; mismatch raises") {
    val withNull = vecs.map { case (i, v) => (i, Option(v)) } :+ (99L -> None)
    val df = withNull.toDF("vec_id", "embedding")
    // default dim = -1 -> inferred from first non-null vector; the NULL
    // row is filtered, the planted pair still found
    val pairs = Similarity.cosineNearDups(df, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 99L || p._2 == 99L))
    // a vector of the WRONG length must fail fast, not silently bucket
    val bad = (vecs :+ (99L -> Array(1f, 2f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.cosineNearDups(bad, "vec_id", "embedding", 0.99, dim = 8)
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("labelCentroidReport: tight cluster ~1, antipodal pair ~0 mean") {
    // label 0: three near-identical vectors -> mean cosine to centroid
    // near 1; label 1: two exactly opposite vectors -> centroid is the
    // jitter residual, symmetric members land at +/- the same cosine
    val rows = Seq(
      (0L, Array(1f, 0f, 0.01f, 0f), 0),
      (1L, Array(1f, 0.01f, 0f, 0f), 0),
      (2L, Array(0.99f, 0f, 0f, 0.01f), 0),
      (3L, Array(1f, 1f, 0f, 0.02f), 1),
      (4L, Array(-1f, -1f, 0f, 0f), 1))
    val got = Similarity.labelCentroidReport(
        rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", dim = 4)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(0)._2 == 3L && got(0)._3 > 0.99, s"${got(0)}")
    assert(got(1)._2 == 2L && math.abs(got(1)._3) < 0.1, s"${got(1)}")
  }

  test("labelCentroidReport drops wrong-dimension vectors") {
    val rows = Seq((0L, Array(1f, 0f), 0), (1L, Array(1f, 0f, 0f), 0))
    val got = Similarity.labelCentroidReport(
        rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", dim = 2)
      .as[(Int, Long, Double)].collect()
    assert(got.length == 1 && got.head._2 == 1L)
  }

  test("knnClassify: clustered labels classify; a mislabel is outvoted") {
    // two tight clusters on orthogonal axes; vector 5 sits in cluster A
    // but carries cluster B's label — with k=3 its neighbors (all true
    // A) outvote it, so it lands in the (actual=1, predicted=0) cell
    def jitter(base: Array[Float], i: Int) =
      base.zipWithIndex.map { case (v, j) =>
        v + (if (j == i % 4) 0.01f * (i + 1) else 0f) }
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f)
    val rows =
      (0 to 4).map(i => (i.toLong, jitter(a, i), 0)) :+
      (5L, jitter(a, 5), 1) :+ // the mislabel, geometrically in A
      (6L, jitter(b, 6), 1) :+ (7L, jitter(b, 7), 1) :+
      (8L, jitter(b, 8), 1) :+ (9L, jitter(b, 9), 1)
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(df, df, "vec_id", "embedding",
        "label", k = 3)
      .as[(Int, Int, Long)].collect().toSet
    // actual 0 rows all predict 0; actual 1: the four true-B rows
    // predict 1, the planted mislabel predicts 0
    assert(got == Set((0, 0, 5L), (1, 1, 4L), (1, 0, 1L)), s"got $got")
  }

  test("randomProject: deterministic sign matrix, exact integer components") {
    val m1 = Similarity.signMatrix(4, 8)
    val m2 = Similarity.signMatrix(4, 8)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(s => s == 1L || s == -1L))
    // hand-check one projected component: micros-quantized elements
    // times the matrix row, summed
    val vec = Array(0.5f, -0.25f, 1f, 0f, 0.1f, 0.2f, -0.3f, 0.75f)
    val got = Similarity.randomProject(
        Seq((1L, vec)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", inDim = 8, outDim = 4)
      .as[(Long, Seq[Long])].collect().head
    val q = vec.map(x => math.round(x.toDouble * 1e6))
    val want = m1.map(row => row.zip(q).map { case (s, x) => s * x }.sum).toSeq
    assert(got._2 == want)
  }

  test("randomProject preserves pairwise cosine within JL distortion") {
    // three directions: two nearly identical, one orthogonal — after a
    // 64->16 projection the near-pair must stay near and the orthogonal
    // pair must stay far (coarse JL sanity, not a tight bound)
    def unit(axis: Int) = Array.tabulate(64)(i => if (i == axis) 1f else 0f)
    val near = Array.tabulate(64)(i =>
      (if (i == 0) 1f else 0f) + (if (i == 1) 0.05f else 0f))
    val rows = Seq((0L, unit(0)), (1L, near), (2L, unit(32)))
    val proj = Similarity.randomProject(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", 64, 16)
      .as[(Long, Seq[Long])].collect().sortBy(_._1).map(_._2.map(_.toDouble))
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(cos(proj(0), proj(1)) > 0.8,
      s"near pair drifted apart: ${cos(proj(0), proj(1))}")
    assert(math.abs(cos(proj(0), proj(2))) < 0.6,
      s"orthogonal pair collapsed together: ${cos(proj(0), proj(2))}")
  }

  test("randomProject drops NULL and wrong-dimension vectors") {
    val rows = Seq(
      (0L, Array(1f, 2f)), (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array(1f, 2f, 3f)))
    val got = Similarity.randomProject(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", 2, 2)
      .as[(Long, Seq[Long])].collect()
    assert(got.map(_._1).toSeq == Seq(0L))
  }

  test("sign_band_keys (fused) equals the per-plane reference bits") {
    // plain-Scala reference: bit j of band b = sign of plane (b*r+j)
    // dot vec, double accumulation in ascending i — the contract the
    // fused expression must reproduce bit-for-bit (lshTopK computes
    // query keys driver-side with exactly this loop)
    val bands = 4; val r = 6
    val planes = Similarity.hyperplanes(bands * r, 8, seed = 7L)
    def refKeys(v: Array[Float]): Seq[(Int, Long)] =
      (0 until bands).map { b =>
        var key = 0L
        (0 until r).foreach { j =>
          val pl = planes(b * r + j)
          var s = 0.0; var i = 0
          while (i < 8) { s += pl(i).toDouble * v(i).toDouble; i += 1 }
          if (s > 0) key |= 1L << j
        }
        (b, key)
      }
    val got = emb.select(col("vec_id"),
        explode(Similarity.bandKeys(col("embedding"), planes, bands, r))
          .as("bk"))
      .select(col("vec_id"), col("bk.band"), col("bk.key"))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)
        .toSeq).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refKeys(v), s"vec $id keys diverge")
    }
    // fail-fast: NULL vector and wrong dimension both throw
    val bad = Seq((99L, Array(1f, 2f))).toDF("vec_id", "embedding")
    assertThrows[Exception] {
      bad.select(Similarity.bandKeys(col("embedding"), planes, bands, r))
        .collect()
    }
    val nul = Seq((99L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    assertThrows[Exception] {
      nul.select(Similarity.bandKeys(col("embedding"), planes, bands, r))
        .collect()
    }
  }

  test("autoGranularity applies the measured sizing rule") {
    // ceil(log2(2n)) clamped to [8, 30], bands raised to match r
    assert(Similarity.autoGranularity(0L, 8) == (8, 8))
    assert(Similarity.autoGranularity(100L, 8) == (8, 8))       // small: floor
    assert(Similarity.autoGranularity(200L, 8) == (9, 9))       // 2n=400 -> 9
    assert(Similarity.autoGranularity(20050L, 8) == (16, 16))   // the measured
      // sf1-slice config: rule reproduces SCALING.md's 4x-faster (16,16)
    assert(Similarity.autoGranularity(1000000L, 8) == (21, 21))
    assert(Similarity.autoGranularity(Long.MaxValue / 4, 8) == (30, 30)) // cap
    // caller-raised bands are never lowered
    assert(Similarity.autoGranularity(100L, 12) == (12, 8))
    // monotone: more data never coarsens the buckets
    val rs = Seq(1L, 1000L, 100000L, 10000000L)
      .map(n => Similarity.autoGranularity(n, 8)._2)
    assert(rs == rs.sorted)
  }

  test("self-sized LSH (rowsPerBand = -1) finds the planted dups like the fixed path") {
    // exact-direction copies share every band at ANY granularity, so the
    // planted answer is sizing-independent — the property that lets the
    // auto path share the fixed path's oracle
    val auto = Similarity.cosineNearDups(emb, "vec_id", "embedding",
        threshold = 0.99, rowsPerBand = -1, dim = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto.contains((0L, 1L)) && auto.contains((0L, 2L)))
    val survivors = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.99, rowsPerBand = -1, dim = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == (Set(0L) ++ (3L until 40L)))
    // knnJoin honors it too: each planted copy's nearest is its original
    val nn = Similarity.knnJoin(emb, "vec_id", "embedding", k = 1,
        rowsPerBand = -1, dim = 8)
      .where(col("qid") === 1L).select("nid").as[Long].collect()
    assert(nn.toSeq == Seq(0L))
    // explicit nonsense still fails fast
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDups(emb, "vec_id", "embedding", 0.99,
        bands = 0, rowsPerBand = 4, dim = 8).collect()
    }
  }
}
