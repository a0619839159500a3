package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: which items appear together more
  * often than chance (recommender candidates, "bought-together" rules,
  * query-expansion pairs). The association strength is lift,
  *
  *   lift(a,b) = P(a,b) / (P(a)·P(b))
  *             = n_baskets · pair(a,b) / (cnt(a) · cnt(b)),
  *
  * emitted in exact fixed-point micros (one BIGINT multiply chain and a
  * truncating divide) so two engines cannot disagree in the last ulp.
  *
  * Scale shape: the only quadratic step is the per-basket self-join, and
  * it is bounded by `maxBasketSize` — a basket over the cap is DROPPED
  * WHOLE (standard in basket mining: a 10k-item "basket" is a bot or a
  * re-used session id, and one such basket alone would contribute 50M
  * pairs). The join is basket-keyed (equi-join, never a cross product),
  * pairs shuffle as ids only, and every aggregate gets map-side partial
  * combine. Support counts and the basket total come from the same
  * capped universe, so probabilities are consistent with the pairs. */
object Baskets {

  /** Co-occurring item pairs with exact lift. Output: (item_a, item_b,
    * pair_cnt, cnt_a, cnt_b, lift_micros), item_a < item_b exactly once,
    * restricted to pairs seen in at least `minPairCount` baskets. */
  def liftPairs(df: DataFrame, basketCol: String, itemCol: String,
      maxBasketSize: Int, minPairCount: Long): DataFrame = {
    require(maxBasketSize >= 2, "maxBasketSize must be at least 2")
    require(minPairCount >= 1, "minPairCount must be at least 1")
    // multiplicity inside a basket is presence, not quantity
    val items = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("b").isNotNull && col("i").isNotNull).distinct()
    val sizes = items.groupBy(col("b")).agg(count(lit(1)).as("n"))
    val ok = items.join(sizes.where(col("n") <= maxBasketSize)
      .select(col("b")), Seq("b"), "left_semi")
    val nBaskets = ok.select(countDistinct(col("b")).as("n_baskets"))
    val sup = ok.groupBy(col("i")).agg(count(lit(1)).as("cnt"))
    val pairs = ok.as("x").join(ok.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .where(col("pair_cnt") >= minPairCount)
    pairs
      .join(sup.select(col("i").as("item_a"), col("cnt").as("cnt_a")),
        Seq("item_a"))
      .join(sup.select(col("i").as("item_b"), col("cnt").as("cnt_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets)) // 1-row scalar attach
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        // DECIMAL(38,0) staging: the BIGINT chain 1e6*n_baskets*pair_cnt
        // overflows (ANSI: job failure) once n_baskets*pair_cnt passes
        // ~9.2e12 — trivially reached at crawl scale (r11 self-review);
        // decimal keeps both products exact to 1e38 and `div` still
        // returns the same truncated BIGINT in the old range
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_baskets * pair_cnt)" +
          " div (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b) AS BIGINT)")
          .as("lift_micros"))
  }
}
