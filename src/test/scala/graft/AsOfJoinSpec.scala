package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right row at or before the left time") {
    val left = Seq((1L, 10L, "p1"), (1L, 25L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 8L, 100L), (1L, 20L, 200L), (1L, 30L, 300L),
      (3L, 1L, 999L)).toDF("k", "t", "rid")
    val r = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"))
      .select("name", "asof_rid").as[(String, Option[Long])]
      .collect().toMap
    assert(r("p1") == Some(100L)) // t=10 -> right at 8 (not 20)
    assert(r("p2") == Some(200L)) // t=25 -> right at 20 (not 30)
    assert(r("p3") == None)       // key 2 has no right rows -> null
  }

  test("as-of join matches a right row at exactly the left time") {
    val left = Seq((1L, 20L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 20L, 7L)).toDF("k", "t", "rid")
    val r = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"))
      .select("asof_rid").as[Option[Long]].collect().head
    assert(r == Some(7L)) // >= semantics: equal time matches
  }

  test("a null in the latest right row is carried, not an older value") {
    val left = Seq((1L, 30L, "p")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, Some(5L), Some(50L)),
                    (1L, 20L, None, Some(60L))) // latest row: rid is null
      .toDF("k", "t", "rid", "other")
    val r = AsOfJoin.asOf(left, right, "k", "t", Seq("rid", "other"))
      .select("asof_rid", "asof_other")
      .as[(Option[Long], Option[Long])].collect().head
    // the t=20 row is the match: rid must be null (not resurrect 5 from
    // t=10), and both fields must come from the SAME right row
    assert(r == (None, Some(60L)))
  }

  test("null right keys/times never match; equal-time ties are deterministic") {
    val left = Seq((1L, 5L, "p")).toDF("k", "t", "name")
    val right = Seq((Some(1L), None, Some(9L)), (Some(1L), Some(10L), Some(2L)),
      (None, Some(1L), Some(7L)))
      .toDF("k", "t", "rid")
    val r = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"))
      .select("asof_rid").as[Option[Long]].collect().head
    assert(r == None) // the null-time and null-key rows must not leak in
    // equal-time duplicates resolve deterministically (max payload struct)
    val right2 = Seq((1L, 10L, 100L), (1L, 10L, 200L)).toDF("k", "t", "rid")
    val left2 = Seq((1L, 10L, "p")).toDF("k", "t", "name")
    val picks = (1 to 3).map(_ => AsOfJoin.asOf(left2, right2, "k", "t",
      Seq("rid")).select("asof_rid").as[Long].collect().head).toSet
    assert(picks == Set(200L))
  }

  test("as-of join equals brute force on random inputs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      // distinct times per key on the right so the expected match is unique
      val leftRows = (1 to 60).map(i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val rightRows = rnd.shuffle(
        (for (k <- 0L until 5L; t <- 0L until 1000L by 7L) yield (k, t)).toList
      ).take(120).map { case (k, t) => (k, t, k * 10000 + t) }
      val left = leftRows.toDF("k", "t", "lid")
      val right = rightRows.toDF("k", "t", "rid")
      val got = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"))
        .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
      val byKey = rightRows.groupBy(_._1)
      leftRows.foreach { case (k, t, lid) =>
        val expect = byKey.getOrElse(k, Nil).filter(_._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got(lid) == expect, s"seed=$seed key=$k t=$t")
      }
    }
  }

  test("time-range salted as-of equals the unsalted result on a skewed fixture") {
    // one hot key carrying ~90% of all rows — exactly the shape the
    // salting targets — plus normal keys, equal-time ties, a key with
    // right rows only in early buckets (carry must cross empty buckets),
    // and a left-only key
    val rnd = new scala.util.Random(7)
    val leftRows =
      (1 to 400).map(i => (0L, rnd.nextInt(2000).toLong, i.toLong)) ++ // hot
      (1 to 40).map(i => (1L + rnd.nextInt(3), rnd.nextInt(2000).toLong, 1000L + i)) ++
      Seq((9L, 1999L, 9001L), (9L, 3L, 9002L)) // key 9: rights only at t<10
    val rightRows =
      (1 to 300).map(_ => (0L, rnd.nextInt(2000).toLong, rnd.nextInt(50).toLong)) ++
      (1 to 30).map(_ => (1L + rnd.nextInt(3), rnd.nextInt(2000).toLong, 100L + rnd.nextInt(9))) ++
      Seq((9L, 2L, 900L), (9L, 7L, 901L))
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "rid")
    val plain = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"))
      .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
    for (buckets <- Seq(2, 7, 64)) {
      val salted = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
        saltBuckets = buckets)
        .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
      assert(salted == plain, s"saltBuckets=$buckets diverged from unsalted")
    }
  }

  test("salted as-of handles degenerate spans (all times equal, empty right)") {
    val left = Seq((1L, 5L, "a"), (2L, 5L, "b")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, 42L)).toDF("k", "t", "rid")
    val r = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), saltBuckets = 8)
      .select("name", "asof_rid").as[(String, Option[Long])].collect().toMap
    assert(r == Map("a" -> Some(42L), "b" -> None))
    val empty = right.where(org.apache.spark.sql.functions.col("rid") < 0)
    val r2 = AsOfJoin.asOf(left, empty, "k", "t", Seq("rid"), saltBuckets = 4)
      .select("asof_rid").as[Option[Long]].collect().toSeq
    assert(r2 == Seq(None, None))
  }

  test("forward direction picks the earliest right row at or after the left time") {
    val left = Seq((1L, 10L, "p1"), (1L, 25L, "p2"), (1L, 31L, "p3"),
      (2L, 5L, "p4")).toDF("k", "t", "name")
    val right = Seq((1L, 8L, 100L), (1L, 20L, 200L), (1L, 30L, 300L),
      (1L, 25L, 250L)).toDF("k", "t", "rid")
    val r = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
        direction = "forward")
      .select("name", "asof_rid").as[(String, Option[Long])]
      .collect().toMap
    assert(r("p1") == Some(200L)) // t=10 -> right at 20 (not 8 or 25)
    assert(r("p2") == Some(250L)) // equal time matches (>= semantics)
    assert(r("p3") == None)       // nothing at or after 31
    assert(r("p4") == None)       // key 2 has no right rows
  }

  test("forward equals brute force on random inputs, salted and not") {
    val rnd = new scala.util.Random(11)
    val leftRows = (1 to 80).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rightRows = rnd.shuffle(
      (for (k <- 0L until 5L; t <- 0L until 1000L by 7L) yield (k, t)).toList
    ).take(120).map { case (k, t) => (k, t, k * 10000 + t) }
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "rid")
    val byKey = rightRows.groupBy(_._1)
    for (buckets <- Seq(1, 8)) {
      val got = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
          saltBuckets = buckets, direction = "forward")
        .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
      leftRows.foreach { case (k, t, lid) =>
        val expect = byKey.getOrElse(k, Nil).filter(_._2 >= t)
          .sortBy(_._2).headOption.map(_._3)
        assert(got(lid) == expect, s"buckets=$buckets key=$k t=$t")
      }
    }
  }

  test("tolerance nulls matches farther than the band, both directions") {
    val left = Seq((1L, 100L, "near"), (1L, 500L, "far")).toDF("k", "t", "name")
    val right = Seq((1L, 90L, 9L)).toDF("k", "t", "rid")
    val back = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
        tolerance = Some(50L))
      .select("name", "asof_rid").as[(String, Option[Long])].collect().toMap
    assert(back == Map("near" -> Some(9L), "far" -> None)) // 410 > 50
    val fwd = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
        direction = "forward", tolerance = Some(50L))
      .select("name", "asof_rid").as[(String, Option[Long])].collect().toMap
    assert(fwd == Map("near" -> None, "far" -> None)) // no right >= either
    // tolerance survives the salted path (the matched time rides the carry)
    val salted = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
        saltBuckets = 4, tolerance = Some(50L))
      .select("name", "asof_rid").as[(String, Option[Long])].collect().toMap
    assert(salted == back)
  }

  test("left payload columns pass through unchanged") {
    val left = Seq((1L, 10L, 3.5)).toDF("k", "t", "v")
    val right = Seq((1L, 5L, 1L)).toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"))
    assert(out.columns.toSeq == Seq("k", "t", "v", "asof_rid"))
    assert(out.select("v").as[Double].collect().head == 3.5)
  }

  test("forward is exact at sub-second timestamp precision (review r12: " +
      "the long-cast reduction truncated to whole seconds)") {
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // all within ONE wall-clock second: the old -cast(t as long) flip
    // collapsed them, matching a right row strictly BEFORE the left time
    val left = Seq((1L, ts(900), "l1"), (1L, ts(150), "l2"))
      .toDF("k", "t", "name")
    val right = Seq((1L, ts(100), 10L), (1L, ts(800), 80L))
      .toDF("k", "t", "rid")
    for (buckets <- Seq(1, 4)) {
      val fwd = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
          saltBuckets = buckets, direction = "forward")
        .select("name", "asof_rid").as[(String, Option[Long])]
        .collect().toMap
      // l1 at .900: nothing at or after it (both rights are earlier);
      // l2 at .150: the EARLIEST right at or after is .800, not .100
      assert(fwd == Map("l1" -> None, "l2" -> Some(80L)),
        s"buckets=$buckets: $fwd")
      // backward still exact on the same data
      val back = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
          saltBuckets = buckets)
        .select("name", "asof_rid").as[(String, Option[Long])]
        .collect().toMap
      assert(back == Map("l1" -> Some(80L), "l2" -> Some(10L)),
        s"buckets=$buckets: $back")
    }
  }

  test("forward equals brute force on FRACTIONAL double times, salted " +
      "and not") {
    val rnd = new scala.util.Random(13)
    val leftRows = (1 to 60).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(100) / 7.0, i.toLong))
    val rightRows = (1 to 80).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(100) / 3.0, 1000L + i))
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "rid")
    val byKey = rightRows.groupBy(_._1)
    for (buckets <- Seq(1, 6)) {
      val got = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
          saltBuckets = buckets, direction = "forward")
        .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
      leftRows.foreach { case (k, t, lid) =>
        // earliest right at or after; ties (same k, same t) by MAX rid
        // (the deterministic struct tie-break)
        val cand = byKey.getOrElse(k, Nil).filter(_._2 >= t)
        val expect = cand.sortBy(r => (r._2, -r._3)).headOption.map(_._3)
        assert(got(lid) == expect, s"buckets=$buckets key=$k t=$t")
      }
    }
  }

  test("caller errors fail fast: negative tolerance, reserved payload names") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 5L, 1L)).toDF("k", "t", "rid")
    intercept[IllegalArgumentException](
      AsOfJoin.asOf(left, right, "k", "t", Seq("rid"),
        tolerance = Some(-5L)))
    // a payload column named after an internal would be clobbered by the
    // tagging withColumns before the payload struct resolves
    val rightTag = Seq((1L, 5L, 1L)).toDF("k", "t", "_tag")
    intercept[IllegalArgumentException](
      AsOfJoin.asOf(left, rightTag, "k", "t", Seq("_tag")))
  }
}
