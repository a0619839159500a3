package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization: the memory-bound ANN answer at 100 TB. A
  * 64-dim float vector is 256 bytes; its PQ code at m=4 subspaces is 4
  * small ints — the whole corpus's codes fit where the vectors never
  * could, and a query scans codes with table lookups (ADC) instead of
  * touching raw vectors. PQ composes with [[Ivf]]: IVF partition-prunes
  * to candidate clusters, PQ scans their codes, exact cosine re-ranks
  * the survivors (the standard IVF-PQ pipeline, each stage independently
  * testable here).
  *
  *  - [[train]]: per-subspace k-means with the same determinism contract
  *    as [[Ivf.train]] (hash-ordered sample, farthest-point init, exact
  *    DECIMAL centroid means) — only m·k·dsub scalars reach the driver.
  *  - [[encode]]: one distributed pass; each subvector scores k
  *    broadcast centroids, argmin with a FIRST-index tie-break. Pure
  *    column expressions (zip_with/aggregate folds), no UDF.
  *  - [[adcTopK]]: the query builds an m×k lookup table driver-side
  *    (scalar work); every row's score is m array lookups + a sum. The
  *    fold orders match DuckDB's `list_reduce(list_prepend(0.0, …))`
  *    convention token for token, so the whole encode+ADC path carries a
  *    full cross-engine oracle (q_pq_adc) on a planted codebook.
  *
  * All distance arithmetic is double (float inputs cast exactly), L2 on
  * subvectors — the standard PQ metric; cosine users L2-normalize
  * upstream ([[Similarity]] `embedNorm`).
  *
  * (Extension surface — the reference engine has no vector support; see
  * SURVEY.md §2.5.)
  */
object Pq {

  /** m codebooks of k centroids of dsub doubles each. */
  final case class PqModel(dim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def dsub: Int = dim / m
    require(dim % m == 0, s"dim $dim not divisible by m ${codebooks.length}")
  }

  /** The deterministic synthetic codebook shared with the q_pq_adc
    * oracle: centroid value (j, i, d) = ((j*31 + i*17 + d*7) % 19 - 9)
    * / 16.0 — dyadic rationals, so the Scala double, the SQL literal and
    * the parquet round-trip are all the same bits. */
  def plantedModel(dim: Int, m: Int, k: Int): PqModel =
    PqModel(dim, Array.tabulate(m, k, dim / m)((j, i, d) =>
      ((j * 31 + i * 17 + d * 7) % 19 - 9) / 16.0))

  /** The m-entry PQ code of a vector column: per subspace, the 0-based
    * index of the nearest centroid, first index winning ties (matches
    * the oracle's `ORDER BY dist, i LIMIT 1`). One fused JIT loop
    * ([[graft.functions.VectorExprs.pqEncode]], round 9) — the
    * m×k `aggregate(zip_with(...))` fold tree this replaces ran every
    * fold through the per-element lambda interpreter (2,048 folds/row
    * at a production m = 8, k = 256); codes are bit-identical (same
    * element-order double accumulation, same first-index argmin,
    * same NULL-propagation — the q_pq_adc oracle pins it). */
  def encodeCol(vec: Column, model: PqModel): Column =
    graft.functions.VectorExprs.pqEncode(vec, model.codebooks)

  /** Distributed encode: (idCol, codes array<int>). Codes are what a
    * 100 TB deployment PERSISTS — m small ints per row in place of the
    * vector. */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    emb.where(col(vecCol).isNotNull)
      .select(col(idCol), encodeCol(col(vecCol), model).as("codes"))

  /** Driver-side ADC lookup table: lut(j)(i) = squared-L2 of the query's
    * j-th subvector to centroid i, summed in element order (mirrors
    * [[subDists]] exactly — same IEEE ops, same order). */
  def lut(query: Array[Float], model: PqModel): Array[Array[Double]] =
    Array.tabulate(model.m, model.k) { (j, i) =>
      var acc = 0.0
      var d = 0
      while (d < model.dsub) {
        val diff = query(j * model.dsub + d).toDouble - model.codebooks(j)(i)(d)
        acc = acc + diff * diff
        d += 1
      }
      acc
    }

  /** Asymmetric-distance top-k: encode (or reuse stored codes via
    * [[codesTopK]]) and score every row as m LUT lookups + an in-order
    * sum. Output: (idCol, codes_joined, adc_dist), ascending distance,
    * id tie-break. */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
      model: PqModel, query: Array[Float], k: Int): DataFrame = {
    require(query.length == model.dim,
      s"Pq.adcTopK: query dim ${query.length} != model dim ${model.dim}")
    codesTopK(encode(emb, idCol, vecCol, model), idCol, model, query, k)
  }

  /** ADC over PRE-ENCODED codes — the production path (codes persisted,
    * vectors cold). Rows with any NULL code entry (a wrong-dimension or
    * null-element vector propagated through [[encode]]) are EXCLUDED
    * up front, mirroring the null-vector convention everywhere else in
    * the ANN surface. The explicit forall guard matters doubly: an
    * ascending sort would otherwise rank corrupt rows first, and
    * `element_at` on a NON-NULLABLE literal array treats a null index
    * as the element type's default (0.0 here) rather than null — a
    * corrupt row would score as a PERFECT match, not even a null one. */
  def codesTopK(codes: DataFrame, idCol: String, model: PqModel,
      query: Array[Float], k: Int): DataFrame = {
    val table = lut(query, model)
    val score = (0 until model.m).map { j =>
      element_at(typedLit(table(j).toSeq),
        element_at(col("codes"), j + 1) + 1)
    }.foldLeft(lit(0.0))((acc, x) => acc + x)
    codes
      .where(col("codes").isNotNull &&
        size(col("codes")) === model.m &&
        // the RANGE term completes the corrupt-row guard: a persisted
        // code from a differently-sized codebook slips NULL/size/
        // forall-notnull, and its out-of-range element_at turns the
        // distance NULL — NULLS FIRST under ascending sort, so corrupt
        // rows would fill the entire top-k (ANSI: the probe aborts
        // instead) — r11 self-review
        forall(col("codes"),
          c => c.isNotNull && c >= 0 && c < model.k))
      .select(col(idCol),
        array_join(col("codes"), "|").as("codes_joined"),
        score.as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
  }

  /** The composed IVF-PQ pipeline — the canonical billion-scale ANN
    * architecture, each stage one of this library's primitives:
    *  1. IVF partition-prunes to the nProbe clusters nearest the query
    *     (at 100 TB on a saved index this is a partition FILTER — the
    *     other clusters' files are never opened);
    *  2. ADC scans only the candidates' PQ codes (m LUT lookups per
    *     row) for a shortlist of `refine`·k;
    *  3. exact codegen'd cosine re-ranks the shortlist to the final k
    *     (PQ distances are approximations; the re-rank touches raw
    *     vectors for only refine·k rows).
    * One-shot form (trains both quantizers in place, like
    * [[Similarity.ivfTopK]]); a production deployment persists the IVF
    * index ([[Ivf.save]]) and the PQ codes ([[encode]] written next to
    * them) and runs the same three stages over the saved artifacts.
    * Probe-cluster selection mirrors [[Ivf.probe]]'s ranking exactly
    * (cosine desc, higher cluster id on ties). */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, nClusters: Int = 16, nProbe: Int = 4,
      m: Int = 4, kSub: Int = 16, refine: Int = 4, iters: Int = 2): DataFrame = {
    require(k > 0 && refine >= 1, "need k > 0 and refine >= 1")
    val ivf = Ivf.index(emb, idCol, vecCol, nClusters, iters)
    require(query.length == ivf.dim,
      s"Pq.ivfPqTopK: query dim ${query.length} != corpus dim ${ivf.dim}")
    val pq = train(emb, idCol, vecCol, m, kSub, iters)
    val probeSet = ivf.centroids.zipWithIndex
      .sortBy { case (c, i) => (-Similarity.cosD(c, query, ivf.dim), -i) }
      .take(math.min(nProbe, ivf.centroids.length)).map(_._2).toSet
    val cand = ivf.index.where(col("cluster").isInCollection(probeSet))
    val shortlist = codesTopK(encode(cand, idCol, vecCol, pq),
      idCol, pq, query, refine * k).select(col(idCol))
    cand.join(shortlist, Seq(idCol), "left_semi")
      .select(col(idCol), graft.functions.VectorExprs.cosineSim(
        col(vecCol), typedLit(query.toSeq)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Per-subspace k-means, deterministic (same contract as
    * [[Ivf.train]]): hash-ordered sample, farthest-point init under
    * squared-L2, Lloyd updates with exact DECIMAL means. m·iters small
    * jobs; only the codebook scalars reach the driver. */
  def train(emb: DataFrame, idCol: String, vecCol: String, m: Int,
      k: Int, iters: Int = 2): PqModel = {
    // validate the WHOLE corpus dimension with one aggregate (the
    // Ivf.addToIndex lesson): a mixed-dimension corpus would otherwise
    // surface as an opaque NPE deep inside the Lloyd update when a
    // short vector's null subspace distances produce a null cluster code
    val dims = emb.where(col(vecCol).isNotNull)
      .agg(min(size(col(vecCol))).as("mn"), max(size(col(vecCol))).as("mx"))
      .head()
    require(!dims.isNullAt(0),
      s"Pq.train: no non-null $vecCol to infer dimension from")
    require(dims.getInt(0) == dims.getInt(1),
      s"Pq.train: mixed vector dimensions [${dims.getInt(0)}, ${dims.getInt(1)}]")
    val dim = dims.getInt(0)
    require(dim % m == 0, s"Pq.train: dim $dim not divisible by m $m")
    val dsub = dim / m
    // ONE hash-ordered sample pass for all subspaces (full vectors,
    // sliced driver-side) — the sort+collect is the expensive stage and
    // is identical per subspace, so paying it m times buys nothing
    val sampleN = math.max(k, math.min(64 * k, 4096))
    val fullSample: Array[Array[Double]] = emb.where(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleN)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(fullSample.nonEmpty, "Pq.train requires a non-empty corpus")
    // k-means++-style seeding per subspace, driver-side over the shared
    // sample (k × dsub scalar work per subspace — never data-sized)
    val seeded: Array[Array[Array[Double]]] = (0 until m).map { j =>
      val sample: Array[Array[Double]] =
        fullSample.map(_.slice(j * dsub, (j + 1) * dsub))
      def l2(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var d = 0
        while (d < dsub) { val x = a(d) - b(d); acc += x * x; d += 1 }
        acc
      }
      val seeds = scala.collection.mutable.ArrayBuffer(sample(0))
      while (seeds.length < math.min(k, sample.length)) {
        var best = -1; var bestD = -1.0
        var i = 0
        while (i < sample.length) {
          var dMin = Double.MaxValue
          seeds.foreach { s => val d = l2(sample(i), s); if (d < dMin) dMin = d }
          if (dMin > bestD) { bestD = dMin; best = i }
          i += 1
        }
        seeds += sample(best)
      }
      seeds.toArray
    }.toArray
    // JOINT Lloyd loop: ONE corpus scan per iteration encodes every
    // subspace against the current books (subspaces are independent —
    // subspace j's argmin depends only on book j, so assignments are
    // bit-identical to training each book alone) and one (subspace,
    // cluster, dim)-keyed aggregation updates all m books at once. The
    // previous per-subspace loops ran m full scans per iteration, each
    // computing the whole fused encode and discarding m−1 of its
    // entries (r11 self-review: m-fold redundant corpus work on the
    // 100 TB-targeted op).
    var books = seeded
    for (_ <- 0 until iters) {
      val model1 = PqModel(dim, books)
      val byCode = emb.where(col(vecCol).isNotNull)
        .select(col(vecCol).as("v"),
          posexplode(encodeCol(col(vecCol), model1)).as(Seq("j", "c")))
        // a vector with null ELEMENTS yields a null code even at the
        // right dimension — skip it here (the null-vector convention)
        // rather than NPE in the centroid update
        .where(col("c").isNotNull)
      val updated = byCode
        .select(col("j"), col("c"),
          posexplode(slice(col("v"),
            col("j") * lit(dsub) + lit(1), lit(dsub))).as(Seq("d", "x")))
        .groupBy("j", "c", "d")
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(30, 15)))
          .cast("double") / count(lit(1))).as("mean"))
        .collect()
      val next = books.map(_.map(_.clone()))
      updated.foreach(r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
      books = next
    }
    PqModel(dim, books)
  }
}
