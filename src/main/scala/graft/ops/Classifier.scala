package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear quality classifier — the fastText-style "does
  * this look like good data" filter trained and applied INSIDE the
  * engine: full-batch gradient descent where each iteration is one
  * aggregation over the corpus (the gradient of a linear model is a
  * sum over rows — exactly the shape a partial+final hash aggregate
  * executes), and scoring is a pure per-row expression.
  *
  * (Extension surface — pairs with TextOps.qualitySignals, which is the
  * hand-written-rules form of the same filter; this learns the rule
  * weights from labels instead.)
  *
  * The squashing function is the RATIONAL sigmoid
  *
  *   s(z) = 0.5 + 0.5 * z / (1 + |z|)
  *
  * — pure IEEE arithmetic, no libm exp whose last-ulp differences
  * across engines/platforms would make training runs disagree. It has
  * the logistic's shape (monotone, s(0)=0.5, saturating to 0/1) and
  * its gradient-descent update uses the same (s(z) - y) * x residual
  * form.
  *
  * Determinism contract (the pageRank fixed-point rule): per-row
  * gradient contributions quantize to integer MICROS and sum as exact
  * BIGINTs — no multi-row double accumulation — and the weight update
  * is a fixed sequence of IEEE ops on those exact sums, re-quantized
  * to 1e-6 each round. Same data, any partitioning, any engine: the
  * identical weight vector, bit for bit.
  *
  * Scale shape: `iterations` passes over the corpus, each one map-side
  * feature evaluation + a 1-row aggregate (no shuffle wider than the
  * partial-agg combine); only the (features+1)-element gradient vector
  * ever reaches the driver. Nothing is cached — each pass re-reads the
  * scan (predictable I/O beats a 100 TB cache footprint; feed a
  * pre-projected parquet of just the feature inputs if the full-row
  * scan dominates). */
object Classifier {

  /** Learned weights: bias first, then one weight per feature column. */
  final case class LinearModel(weights: Seq[Double]) {
    require(weights.nonEmpty, "model needs at least a bias")

    /** The margin z = b + w·x as a column expression (left-associated
      * adds — the exact tree the trainer and both engines use). */
    def margin(features: Seq[Column]): Column = {
      require(features.size == weights.size - 1,
        s"model has ${weights.size - 1} feature weights, got ${features.size} features")
      features.zip(weights.tail).foldLeft(lit(weights.head): Column) {
        case (acc, (x, w)) => acc + lit(w) * x
      }
    }

    /** s(z), the rational sigmoid score in (0, 1). */
    def scoreExpr(features: Seq[Column]): Column = {
      val z = margin(features)
      lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))
    }
  }

  /** Train by full-batch gradient descent: `iterations` rounds of
    *
    *   w_j <- round6( w_j - lr * (sum_rows (s(z) - y) * x_j) / n )
    *
    * with the row sums accumulated in exact micros. `label` must
    * evaluate to 0.0/1.0 doubles; feature expressions should be
    * bounded (normalize to ~[0, 1]) or GD needs a smaller `lr`. */
  def train(docs: DataFrame, features: Seq[Column], label: Column,
      iterations: Int = 5, lr: Double = 1.0): LinearModel = {
    require(iterations > 0, "iterations must be positive")
    var w = Seq.fill(features.size + 1)(0.0)
    for (_ <- 1 to iterations) {
      val sig = LinearModel(w).scoreExpr(features)
      val gradMicros = (lit(1.0) +: features).zipWithIndex.map {
        case (x, j) =>
          sum(round((sig - label) * x * lit(1000000.0), 0).cast("long"))
            .as(s"g$j")
      }
      val row = docs.agg(count(lit(1)).as("n"), gradMicros: _*).head()
      // an empty input yields NULL gradient sums (getLong would NPE)
      // and n = 0 divides to NaN — fail with a named error instead
      require(row.getLong(0) > 0L,
        "Classifier.train: no rows to fit (empty input)")
      val n = row.getLong(0).toDouble
      w = w.zipWithIndex.map { case (wj, j) =>
        round6(wj - lr * ((row.getLong(j + 1).toDouble / 1000000.0) / n))
      }
    }
    LinearModel(w)
  }

  /** Append `score` (rounded 1e-6) and the boolean `pred` (score >=
    * 0.5) for a trained model — a pure per-row expression, pipelining
    * in the scan stage. */
  def score(docs: DataFrame, features: Seq[Column],
      model: LinearModel): DataFrame =
    docs.withColumn("score", round(model.scoreExpr(features), 6))
      .withColumn("pred", col("score") >= 0.5)

  /** Driver-side 1e-6 quantization with Spark round()'s exact HALF_UP
    * decimal semantics, so literal weights re-enter the plan in the
    * same domain the aggregates use. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
