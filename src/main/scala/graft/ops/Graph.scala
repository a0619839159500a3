package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over edge DataFrames — the entity-graph
  * siblings of [[Dedup]]'s connected components: influence scoring over
  * the supplier↔customer transaction graph, link-graph centrality for
  * crawl prioritization, co-occurrence ranking.
  *
  * (Extension surface — the reference engine has no graph operators;
  * the shapes here follow the standard Spark join+aggregate PageRank
  * formulation, kept cross-engine reproducible with the decimal-
  * accumulator convention from [[Profile.covarianceMatrix]].)
  */
object Graph {

  /** PageRank by repeated join+aggregate: each iteration sends every
    * node's damped rank, split evenly across its out-edges, to its
    * neighbors, then re-bases at `1 - damping`. Nodes without out-edges
    * (dangling) contribute nothing — the classic simplified
    * formulation; ranks then sum to less than N, which is fine for the
    * RANKING use (influence ordering), and is what an engine comparing
    * against this must reproduce.
    *
    * Cross-engine determinism: per-edge contributions are computed in
    * doubles (`damping * rank / out_degree` — a fixed per-row IEEE
    * sequence) but ACCUMULATED in DECIMAL(28,8), so the per-node sum is
    * exact and order-independent; the new rank rounds to 9dp each
    * iteration, well above ulp scale. Spark's summation order across
    * shuffle partitions can never leak into the result.
    *
    * Scale shape per iteration: one src-keyed equi-join attaching
    * (rank, out_degree) to edges — both rank and degree tables are
    * node-sized, far below edge-sized, and broadcast when small — then
    * one dst-keyed partial+final aggregation. Nothing ever sits on the
    * driver; `iterations` is a fixed small constant (5–20), so the
    * lineage stays bounded. For 100 TB-scale edge sets the edge table
    * is the only big operand and it is never materialized more than
    * once per iteration.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val dec8 = DecimalType(28, 8)
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    var ranks = nodes.select(col("node"), lit(1.0).as("pr"))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("node"),
          (lit(damping) * col("pr") / col("odeg").cast("double"))
            .cast(dec8).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("csum"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          round(lit(1.0 - damping) +
            coalesce(col("csum").cast("double"), lit(0.0)), 9).as("pr"))
    }
    ranks
  }

  /** Degree table for a directed edge set: one row per node with its
    * out-, in-, and total degree (parallel edges collapse first, the
    * same contract as [[pageRank]]). One distinct pass plus two keyed
    * counts and one full-outer stitch — all node-sized after the
    * dedup. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String):
      DataFrame = {
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        (coalesce(col("out_degree"), lit(0L)) +
          coalesce(col("in_degree"), lit(0L))).as("degree"))
  }
}
