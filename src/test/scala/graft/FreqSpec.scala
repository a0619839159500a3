package graft

import org.apache.spark.sql.functions._
import graft.ops.Freq

/** Heavy hitters via the Misra-Gries sketch + exact confirm
  * (ops/Freq.scala). The oracle here is brute force: a plain
  * GROUP BY / HAVING over the same data — the sketch path must be
  * EXACTLY equal, not approximately. */
class FreqSpec extends SparkSpec {
  import spark.implicits._

  /** (value, count) pairs expanded to rows, shuffled deterministically
    * so frequent items interleave with noise across partitions. */
  private def corpus(pairs: Seq[(String, Int)], parts: Int) = {
    val rows = pairs.flatMap { case (v, c) => Seq.fill(c)(v) }
    // md5-order interleave: deterministic, but adversarial to any
    // "frequent items arrive contiguously" assumption inside a buffer
    rows.zipWithIndex
      .sortBy { case (v, i) => (v + ":" + i).hashCode }
      .map(_._1).toDF("v").repartition(parts)
  }

  private def brute(pairs: Seq[(String, Int)], num: Long, den: Long) = {
    val n = pairs.map(_._2.toLong).sum
    val threshold = (num * n + den - 1) / den
    pairs.filter(_._2 >= threshold).map { case (v, c) => (v, c.toLong) }.toSet
  }

  test("heavy hitters == brute-force GROUP BY / HAVING on a zipf-ish mix") {
    // 3 clear heavy hitters, 2 borderline, a long tail of uniques
    val pairs = Seq("alpha" -> 400, "beta" -> 250, "gamma" -> 120,
      "edge" -> 20, "below" -> 19) ++ (1 to 1000).map(i => s"t$i" -> 1)
    val df = corpus(pairs, parts = 7)
    // floor 1/100 of 1809 rows -> threshold ceil(18.09) = 19
    val got = Freq.heavyHitters(df, "v", num = 1, den = 100)
      .as[(String, Long)].collect().toSet
    assert(got == brute(pairs, 1, 100))
    assert(got.contains(("edge", 20L)) && got.contains(("below", 19L)))
  }

  test("adversarial: many items just above threshold all survive") {
    // 50 items at exactly the threshold count, heavy tail pressure on
    // the per-partition buffers (k is small relative to distinct count)
    val pairs = (1 to 50).map(i => f"hot$i%02d" -> 40) ++
      (1 to 3000).map(i => s"cold$i" -> 1)
    val df = corpus(pairs, parts = 11)
    val n = pairs.map(_._2).sum // 5000
    val got = Freq.heavyHitters(df, "v", num = 8, den = 1000) // floor = 40
      .as[(String, Long)].collect().toSet
    assert(got == brute(pairs, 8, 1000))
    assert(got.size == 50 && got.forall(_._2 == 40L))
    assert(n == 5000)
  }

  test("NULLs excluded from candidates and from the total n") {
    val df = (Seq.fill(30)(Some("x")) ++ Seq.fill(70)(Option.empty[String]))
      .toDF("v").repartition(3)
    // 30 of 30 non-null rows: x is 100% frequent; NULLs neither count
    // toward n (else threshold would be 50 and x would still pass — so
    // pin it the sharp way: floor just above 30/30 fails only if NULLs
    // inflate n)
    val got = Freq.heavyHitters(df, "v", num = 1, den = 1).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 30L)))
  }

  test("deterministic across partitionings") {
    val pairs = Seq("a" -> 100, "b" -> 60, "c" -> 30) ++
      (1 to 500).map(i => s"z$i" -> 1)
    val a = Freq.heavyHitters(corpus(pairs, 2), "v", 2, 100)
      .as[(String, Long)].collect().toSet
    val b = Freq.heavyHitters(corpus(pairs, 13), "v", 2, 100)
      .as[(String, Long)].collect().toSet
    assert(a == b && a == brute(pairs, 2, 100))
  }

  test("MisraGries buffer stays bounded and undercounts within n/(k+1)") {
    val mg = new Freq.MisraGries(5)
    val stream = Seq.fill(60)("hot") ++ (1 to 240).map(i => s"u$i")
    // interleave hot with uniques so decrements hit it repeatedly
    val interleaved = stream.zipWithIndex
      .sortBy { case (v, i) => (i * 7919) % 300 }.map(_._1)
    val (m, n) = interleaved.foldLeft(mg.zero)(mg.reduce)
    assert(n == 300L && m.size <= 5)
    // undercount bound: est >= freq - n/(k+1) = 60 - 50 = 10
    assert(m.getOrElse("hot", 0L) >= 10L)
    // union merge adds counts and totals
    val (m2, n2) = mg.merge((m, n), (Map("hot" -> 7L, "other" -> 2L), 9L))
    assert(n2 == 309L && m2("hot") == m("hot") + 7L && m2("other") == 2L)
  }

  test("confirm pass plan: broadcast semi-join, no value-domain-wide sort") {
    val pairs = Seq("a" -> 50) ++ (1 to 200).map(i => s"t$i" -> 1)
    val plan = Freq.heavyHitters(corpus(pairs, 4), "v", 1, 10)
      .queryExecution.executedPlan.toString
    // candidates broadcast into the confirm scan (semi-join, pipelined)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"confirm must broadcast-semi-join the candidate set:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"))
  }

  test("illegal frequency floors fail loudly") {
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException](Freq.heavyHitters(df, "v", 0, 10))
    intercept[IllegalArgumentException](Freq.heavyHitters(df, "v", 3, 2))
    intercept[IllegalArgumentException](Freq.heavyHitters(df, "v", 1, -1))
  }

  test("count-min sketch: one-sided guarantee, mass conservation, merge = whole") {
    val data = ((1 to 60).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i")))
      .toDF("v").repartition(7)
    val sk = Freq.cmsSketch(data, "v", width = 1024, depth = 4)
    // every hash row holds the full mass
    val n = data.count()
    val perRow = sk.groupBy("r").sum("cnt").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perRow == (0 until 4).map(_ -> n).toMap)
    // estimates: >= truth for present keys, exact here (1024 cells, 60 keys)
    val exact = data.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = (exact.keys.toSeq :+ "never-seen").toDF("v")
    val est = Freq.cmsEstimate(sk, probes, "v", 1024, 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (k, c) => est(k) >= c })
    assert(est("never-seen") == 0L)
    // merge of disjoint halves equals the whole-table sketch cell-wise
    val even = data.where(length(col("v")) === 2)   // k1..k9
    val odd = data.where(length(col("v")) =!= 2)
    val merged = Freq.cmsMerge(Freq.cmsSketch(even, "v", 1024, 4),
      Freq.cmsSketch(odd, "v", 1024, 4)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = sk.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("CMS join-size estimate: one-sided, exact without collisions, zero when disjoint") {
    val a = Seq("x", "x", "x", "y", "z").toDF("v")       // fa: x3 y1 z1
    val b = Seq("x", "y", "y", "w").toDF("v")            // fb: x1 y2 w1
    // true join size = 3*1 + 1*2 = 5
    val sa = Freq.cmsSketch(a, "v", 1024, 4)
    val sb = Freq.cmsSketch(b, "v", 1024, 4)
    val est = Freq.cmsJoinSize(sa, sb).collect().head.getLong(0)
    assert(est == 5L, s"est $est")                       // no collisions
    // disjoint key sets: estimate 0 (wide sketch, no shared cells)
    val sc = Freq.cmsSketch(Seq("p", "q").toDF("v"), "v", 1024, 4)
    assert(Freq.cmsJoinSize(sa, sc).collect().head.getLong(0) == 0L)
    // narrow sketch forces collisions: still never underestimates
    val na = Freq.cmsSketch(a, "v", 4, 2)
    val nb = Freq.cmsSketch(b, "v", 4, 2)
    assert(Freq.cmsJoinSize(na, nb).collect().head.getLong(0) >= 5L)
    // EMPTY sketch side: min over zero rows is NULL, and least() skips
    // NULLs — without the coalesce the saturation clamp turned "no rows
    // at all" into Long.MaxValue (ADVICE r8); the true size is 0
    val se = Freq.cmsSketch(a.where(lit(false)), "v", 1024, 4)
    assert(Freq.cmsJoinSize(se, sb).collect().head.getLong(0) == 0L)
    assert(Freq.cmsJoinSize(sa, se).collect().head.getLong(0) == 0L)
  }

  test("count-min sketch: collisions overestimate but never underestimate") {
    // tiny width forces collisions: the guarantee direction must hold
    val data = (1 to 200).map(i => s"t${i % 50}").toDF("v")
    val sk = Freq.cmsSketch(data, "v", width = 8, depth = 2)
    val est = Freq.cmsEstimate(sk, (0 until 50).map(i => s"t$i").toDF("v"),
      "v", 8, 2).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.values.forall(_ >= 4L))   // every t* appears 4x
    assert(est.values.exists(_ > 4L))    // 50 keys in 8 columns: must collide
  }

  test("zipfFit recovers the exponent of a planted power law") {
    // exact Zipf with s = 1: count(rank) = round(100000 / rank)
    val planted = (1 to 500)
      .map(r => (f"w$r%04d_${100000 / r}%06d", (100000.0 / r).round))
      .toDF("token", "tf")
    val fit = Freq.zipfFit(planted, "token", "tf", 500).collect().head
    val (n, slope, r2) = (fit.getLong(0), fit.getDouble(1), fit.getDouble(3))
    assert(n == 500)
    assert(math.abs(slope - (-1.0)) < 0.02, s"slope $slope")
    assert(r2 > 0.999, s"r2 $r2")
    // steeper law, steeper slope
    val steep = (1 to 500)
      .map(r => (f"w$r%04d", math.max(1L, (1e7 / (r.toDouble * r)).round)))
      .toDF("token", "tf")
    val s2 = Freq.zipfFit(steep, "token", "tf", 500).collect().head.getDouble(1)
    assert(s2 < -1.8, s"slope $s2")
  }

  test("zipfFitBy: per-group slopes separate natural from templated groups") {
    // group "nat": exact Zipf s=1; group "tpl": flat (every token equal)
    val nat = (1 to 200).map(r =>
      ("nat", f"w$r%04d", (10000.0 / r).round))
    val tpl = (1 to 200).map(r => ("tpl", f"t$r%04d", 50L))
    val fits = Freq.zipfFitBy((nat ++ tpl).toDF("g", "token", "tf"),
        "g", "token", "tf", 200)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(fits("nat")._2 == 200 && fits("tpl")._2 == 200)
    assert(math.abs(fits("nat")._3 - (-1.0)) < 0.05, s"nat ${fits("nat")}")
    // y is constant, but the 9-decimal product quantization leaves
    // ~1e-11 residue rather than an exact zero
    assert(math.abs(fits("tpl")._3) < 1e-9, s"tpl ${fits("tpl")}")
    assert(fits("tpl")._4.isNaN || fits("tpl")._4 < 1e-9)
    // agrees with the global fit when there is one group
    val global = Freq.zipfFit(nat.map(t => (t._2, t._3)).toDF("token", "tf"),
      "token", "tf", 200).collect().head.getDouble(1)
    assert(fits("nat")._3 == global)
  }

  test("heapsFitBy: per-group growth exponents, agreement with the global fit") {
    // group "u": all-unique tokens (beta = 1); "c": constant vocab
    val docs = ((1 to 30).map(d =>
        ("u", d.toLong, (1 to 4).map(j => s"w${d}_$j").mkString(" "))) ++
      (1 to 30).map(d => ("c", 100 + d.toLong, "same same")))
      .toDF("source", "doc_id", "text")
    val fits = Freq.heapsFitBy(docs, "source")
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(math.abs(fits("u")._3 - 1.0) < 1e-6)
    assert(math.abs(fits("c")._3) < 1e-9)
    // single-group agreement with the global heapsFit
    val global = Freq.heapsFit(
      docs.where(col("source") === "u").select("doc_id", "text"))
      .collect().head.getDouble(1)
    assert(fits("u")._3 == global)
  }

  test("heapsFit: slope 1 for all-unique tokens, 0 for a constant vocabulary") {
    // every token globally unique: V(n) = n exactly -> beta = 1, r2 = 1
    val unique = (1 to 40)
      .map(d => (d.toLong, (1 to 5).map(j => s"w${d}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val f1 = Freq.heapsFit(unique).collect().head
    assert(f1.getLong(0) == 40)
    assert(math.abs(f1.getDouble(1) - 1.0) < 1e-6, s"slope ${f1.getDouble(1)}")
    assert(f1.getDouble(3) > 0.999999)
    // one token forever: V constant -> slope 0, r2 degenerate (NaN)
    val const = (1 to 40).map(d => (d.toLong, "same same same"))
      .toDF("doc_id", "text")
    val f0 = Freq.heapsFit(const).collect().head
    assert(f0.getDouble(1) == 0.0)
    assert(f0.getDouble(3).isNaN)
  }

  test("zipfFit: deterministic under count ties and repeated runs") {
    // many tied counts: rank order must break on the token, not on
    // partitioning luck
    val tied = (1 to 300).map(i => (s"t$i", (i % 7 + 1).toLong))
      .toDF("token", "tf").repartition(13)
    val a = Freq.zipfFit(tied, "token", "tf", 100).collect().head
    val b = Freq.zipfFit(tied, "token", "tf", 100).collect().head
    assert(a == b)
    assert(a.getLong(0) == 100)
  }
}
