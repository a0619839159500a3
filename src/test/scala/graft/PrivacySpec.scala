package graft

import org.apache.spark.sql.functions._
import graft.ops.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // 3 classes: (US, A) x4 rows, (US, B) x2, (DE, A) x1
  private def people = Seq(
    (1L, "US", "A", 100), (2L, "US", "A", 100), (3L, "US", "A", 200),
    (4L, "US", "A", 300), (5L, "US", "B", 100), (6L, "US", "B", 100),
    (7L, "DE", "A", 400))
    .toDF("id", "country", "segment", "salary")

  test("kAnonymityAudit flags classes smaller than k") {
    val audit = Privacy.kAnonymityAudit(people, Seq("country", "segment"), 3)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(audit == Map(
      ("US", "A") -> (4L, false),
      ("US", "B") -> (2L, true),
      ("DE", "A") -> (1L, true)))
  }

  test("lDiversityAudit flags homogeneous classes even when k-anonymous") {
    // (US, A) has 4 rows but only 3 distinct salaries; (US, B) is
    // homogeneous (both rows salary 100) — the homogeneity attack case
    val audit = Privacy.lDiversityAudit(people, Seq("country", "segment"),
        "salary", 2)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(audit(("US", "A")) == (4L, 3L, false))
    assert(audit(("US", "B")) == (2L, 1L, true))   // size-2 but 1 value
    assert(audit(("DE", "A")) == (1L, 1L, true))
  }

  test("suppressToKAnonymity nulls quasi-identifiers of small classes only") {
    val out = Privacy.suppressToKAnonymity(people, Seq("country", "segment"), 3)
      .select("id", "country", "segment", "salary")
      .as[(Long, Option[String], Option[String], Int)].collect().sortBy(_._1)
    assert(out.length == 7)                        // every row survives
    assert(out.filter(_._1 <= 4).forall(r =>       // big class untouched
      r._2.contains("US") && r._3.contains("A")))
    assert(out.filter(_._1 >= 5).forall(r =>       // small classes nulled
      r._2.isEmpty && r._3.isEmpty))
    assert(out.map(_._4).sum == 1300)              // non-quasi cols intact
  }

  test("dpNoisyCounts: deterministic given seed, noise matches closed form") {
    val run1 = Privacy.dpNoisyCounts(people, "country", 0.5, "s")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val run2 = Privacy.dpNoisyCounts(people, "country", 0.5, "s")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(run1.toSeq == run2.toSeq)               // retry-stable release
    assert(run1.map(r => r._1 -> r._2).toMap == Map("US" -> 6L, "DE" -> 1L))
    // replay the mechanism driver-side: md5-uniform -> geometric pair
    def u(key: String, salt: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((key + salt).getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"${b & 0xFF}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    }
    def geom(uu: Double, eps: Double): Long =
      math.floor(math.log(uu) / -eps).toLong
    // non-null keys seed from the "v:"-prefixed domain (non-spoofable
    // sentinel split, ADVICE r12)
    for ((k, exact, noisy) <- run1) {
      val expect = exact + geom(u("v:" + k, "s:g1"), 0.5) -
        geom(u("v:" + k, "s:g2"), 0.5)
      assert(noisy == expect, s"group $k")
    }
    // epsilon sweep: tighter epsilon (more noise) must not change the
    // exact counts, and a huge epsilon gives (almost surely) zero noise
    val tight = Privacy.dpNoisyCounts(people, "country", 20.0, "s")
      .as[(String, Long, Long)].collect()
    assert(tight.forall(r => r._2 == r._3))        // p = e^-20: noise 0
  }

  test("dpNoisyCounts noises the NULL group instead of publishing NULL") {
    import graft.ops.Privacy
    val df = (Seq.fill(5)(Option.empty[String]) ++
      Seq.fill(3)(Some("g"))).toDF("grp")
    val got = Privacy.dpNoisyCounts(df, "grp", epsilon = 0.5, seed = "s")
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getString(0))) ->
          ((r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got(None)._1 == 5L)
    assert(got(None)._2.isDefined, "NULL group released a NULL noisy count")
    assert(got(Some("g"))._2.isDefined)
  }

  test("dpNoisyCounts NULL-group sentinel is non-spoofable: no string " +
      "value can share the NULL group's noise draws") {
    import graft.ops.Privacy
    // adversarial group values: the legacy sentinel literal and the new
    // "n:" tag itself — each must draw from the v:-domain, never from
    // the NULL group's n:-domain
    val df = (Seq.fill(4)(Option.empty[String]) ++
      Seq.fill(4)(Some(":null-group:")) ++ Seq.fill(4)(Some("n:")))
      .toDF("grp")
    val got = Privacy.dpNoisyCounts(df, "grp", epsilon = 0.5, seed = "s")
      .collect().map(r =>
        (if (r.isNullAt(0)) "NULL" else r.getString(0)) -> r.getLong(2))
      .toMap
    def u(key: String, salt: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((key + salt).getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"${b & 0xFF}%02x").mkString
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    }
    def noise(seedKey: String): Long = {
      def geom(uu: Double): Long = math.floor(math.log(uu) / -0.5).toLong
      geom(u(seedKey, "s:g1")) - geom(u(seedKey, "s:g2"))
    }
    // each group's draw comes from ITS OWN disjoint seed domain
    assert(got("NULL") == 4L + noise("n:"))
    assert(got(":null-group:") == 4L + noise("v::null-group:"))
    assert(got("n:") == 4L + noise("v:n:"))
  }
}
