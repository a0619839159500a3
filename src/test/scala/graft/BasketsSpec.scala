package graft

import org.apache.spark.sql.functions._
import graft.ops.Baskets

/** Market-basket lift (ops/Baskets.scala) vs a local brute force. */
class BasketsSpec extends SparkSpec {
  import spark.implicits._

  private val baskets: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("milk", "bread", "eggs"),
    2L -> Seq("milk", "bread"),
    3L -> Seq("milk", "beer"),
    4L -> Seq("bread", "eggs", "milk"),
    5L -> Seq("beer", "chips"),
    6L -> Seq("beer", "chips", "milk"),
    7L -> Seq("a", "b", "c", "d", "e", "f")) // over cap 5 -> dropped whole

  private def df = baskets.flatMap { case (b, is) => is.map(b -> _) }
    // duplicate lines exercise presence-not-quantity
    .flatMap(x => Seq(x, x)).toDF("b", "i")

  private def brute(cap: Int, minPair: Long) = {
    val capped = baskets.filter(_._2.size <= cap)
    val n = capped.size.toLong
    val sup = capped.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    capped.flatMap { case (_, is) =>
      is.sorted.combinations(2).map(p => (p(0), p(1))) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minPair)
      .map { case ((a, b), pc) =>
        (a, b, pc, sup(a), sup(b), 1000000L * n * pc / (sup(a) * sup(b))) }
      .toSet
  }

  test("lift pairs equal brute force; oversized basket contributes nothing") {
    val got = Baskets.liftPairs(df, "b", "i", maxBasketSize = 5,
        minPairCount = 2)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == brute(5, 2))
    // the sanity anchor: milk+bread co-occur 3x of 6 capped baskets
    val mb = got.find(r => r._1 == "bread" && r._2 == "milk")
    assert(mb.exists(_._3 == 3L))
    // nothing from the dropped basket
    assert(!got.exists(r => r._1 == "a" || r._2 == "b"))
  }

  test("minPairCount 1 keeps singleton co-occurrences; lift is exact") {
    val got = Baskets.liftPairs(df, "b", "i", 5, 1)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == brute(5, 1))
    // beer+chips: pair 2, cnt 3x2, n 6 -> lift 2.0 exactly
    val bc = got.find(r => r._1 == "beer" && r._2 == "chips").get
    assert(bc._6 == 2000000L)
  }

  test("plan: basket-keyed equi-join, no cartesian beyond the 1-row attach") {
    val plan = Baskets.liftPairs(df, "b", "i", 5, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the scalar attach is a broadcast nested loop over ONE row, fine;
    // the pair join must be a hash/sort-merge equi-join on the basket
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
  }

  test("guards") {
    intercept[IllegalArgumentException](Baskets.liftPairs(df, "b", "i", 1, 2))
    intercept[IllegalArgumentException](Baskets.liftPairs(df, "b", "i", 5, 0))
  }

  test("lift arithmetic survives counts past the BIGINT product range") {
    import graft.ops.Baskets
    // verify the decimal staging on a small frame by checking the
    // closed form still holds — then the same expression at
    // n_baskets*pair_cnt ~ 1e13 cannot overflow (decimal holds 1e38);
    // with the old BIGINT chain this spot-check is unchanged, so the
    // load-bearing assertion is the expression form itself
    val plan = Baskets.liftPairs(
        Seq((1L, "a"), (1L, "b")).toDF("basket_id", "item"),
        "basket_id", "item", maxBasketSize = 8, minPairCount = 1)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("38,0"), s"lift products must stage in decimal:\n$plan")
  }
}
