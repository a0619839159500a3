package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Privacy / data-governance operators for training corpora: re-
  * identification audits (k-anonymity, l-diversity), suppression to a
  * k-anonymity target, and differentially-private aggregate release.
  * (Engine extension — the reference has no governance surface; these
  * complement the PII redaction pass in [[TextOps]].)
  *
  * The audits are one hash-aggregate over the quasi-identifier columns —
  * partial aggregation map-side, one row per equivalence class crosses
  * the wire, so a 100 TB table audits at the cost of its class count.
  * Suppression keeps every row, so it uses an unordered window (count
  * over the full partition frame) instead: one shuffle on the quasi
  * key, no sort, no join back.
  *
  * DP release uses the DISCRETE Laplace mechanism (two-sided geometric,
  * the construction in Google's DP library): integer noise sampled by
  * inverse-CDF from md5-derived uniforms, so the release is
  * deterministic given the seed, reproducible across engines (the
  * DuckDB oracle restates it), and never exposes float-ulp ambiguity —
  * the only floats are inside a floor() whose argument sits ~1e15 ulps
  * from the nearest integer almost surely.
  */
object Privacy {

  /** Per-equivalence-class size audit: one row per distinct combination
    * of the quasi-identifier columns with its row count and a
    * `violating` flag (class smaller than k). The classic k-anonymity
    * check (Sweeney 2002): any violating class re-identifies its
    * members among fewer than k candidates. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k must be at least 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("violating", col("n") < k)
  }

  /** l-diversity audit (Machanavajjhala 2007): k-anonymity's fix for
    * the homogeneity attack — a class where every member shares one
    * sensitive value leaks it even at size >= k. One row per class
    * with its size, the number of DISTINCT sensitive values, and a
    * `violating` flag (< l distinct). Distinct-per-group is Spark's
    * two-phase expand + aggregate; still one logical shuffle on the
    * quasi key. */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2, "l must be at least 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("violating", col("n_sensitive") < l)
  }

  /** Suppress to a k-anonymity target: rows whose quasi-identifier
    * class has fewer than k members get those columns nulled (cell
    * suppression), everything else passes through unchanged — the
    * output is k-anonymous by construction (the suppressed rows form
    * one null-class; when fewer than k rows are suppressed the null
    * class is itself small, which callers accept as fully-redacted).
    * Unordered window count — one shuffle, rows never leave. */
  def suppressToKAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k must be at least 2")
    val w = Window.partitionBy(quasiCols.map(col): _*)
    val sized = df.withColumn("__class_n", count(lit(1)).over(w))
    quasiCols.foldLeft(sized) { (d, c) =>
      d.withColumn(c, when(col("__class_n") < k, lit(null)).otherwise(col(c)))
    }.drop("__class_n")
  }

  /** Uniform in (0, 1) derived from md5(key ++ salt): the first 8 hex
    * digits as a 32-bit integer, shifted into the open interval. Any
    * engine with md5 can restate it — the reproducibility contract all
    * the deterministic sampling in this codebase rides on. */
  private def uniform(key: Column, salt: String): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8),
      16, 10).cast("double") + 0.5) / 4294967296.0

  /** Geometric sample on {0, 1, ...} via inverse CDF: floor(ln(u)/ln(p))
    * with failure probability p = exp(-epsilon), so ln(p) is -epsilon
    * EXACTLY — no exp/ln roundtrip whose engine-specific rounding could
    * perturb the quotient. */
  private def geometric(u: Column, epsilon: Double): Column =
    floor(log(u) / -epsilon).cast("long")

  /** Differentially-private grouped counts: exact count per group plus
    * a discrete-Laplace-noised release at sensitivity 1 (one row added
    * or removed changes any count by at most 1, so noise scale is
    * 1/epsilon). Noise = G1 - G2 with G_i geometric at
    * p = exp(-epsilon) — the two-sided-geometric construction of the
    * discrete Laplace. The seed makes the release deterministic:
    * re-running the job (or a retried stage) publishes the SAME noisy
    * value, which is also what DP composition accounting wants — fresh
    * noise per retry would burn budget invisibly.
    *
    * The exact count is returned alongside for testing/audit plumbing;
    * a real release drops it. One hash-aggregate; noise is a per-GROUP
    * expression after aggregation (work ∝ groups, not rows). */
  def dpNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
      seed: String): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val key = col(groupCol)
    // the NULL group is a real group to groupBy, but md5(concat(NULL,
    // salt)) is NULL and the release would silently publish a NULL
    // noisy count for it (r11 self-review) — hash a sentinel instead
    // (the output group label stays NULL; only the noise seed changes).
    // The sentinel is NON-SPOOFABLE (ADVICE r12): non-null keys seed
    // from the "v:" domain, NULL from "n:" — every non-null seed
    // carries the v-prefix, so no genuine group value (including one
    // spelling the old ":null-group:" literal) can ever share a noise
    // draw with the NULL group; identical draws would weaken the DP
    // guarantee for that pair
    val hkey = when(key.isNull, lit("n:"))
      .otherwise(concat(lit("v:"), key.cast("string")))
    val noise = geometric(uniform(hkey, seed + ":g1"), epsilon) -
      geometric(uniform(hkey, seed + ":g2"), epsilon)
    df.groupBy(key)
      .agg(count(lit(1)).as("exact_n"))
      .withColumn("noisy_n", col("exact_n") + noise)
  }
}
