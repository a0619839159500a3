package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions path: a FRESH session configured with
  * spark.sql.extensions=graft.GraftExtensions resolves the custom
  * functions from SQL text with no Graft.init call. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session resolves custom functions in SQL") {
    // extensions only apply to a NEWLY built session — getOrCreate would
    // silently reuse the shared test session, so tear any session down
    // first (subsequent suites lazily getOrCreate a fresh one)
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT
          |  dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |  simhash64(array('a','b')) = simhash64(array('b','a')) AS bag,
          |  size(shingle_hash64('w1 w2 w3 w4', 3)) AS nsh,
          |  size(minhash_sig(shingle_hash64('w1 w2 w3 w4', 3), 8)) AS k,
          |  unicode_normalize('café', 'NFC') AS norm,
          |  bpe_encode('abab cab', concat('a', chr(0), 'b')) AS toks
          |""".stripMargin).collect().head
      assert(r.getDouble(0) == 11.0)
      assert(r.getBoolean(1)) // simhash is bag-of-words
      assert(r.getInt(2) == 2) // two 3-grams in 4 words
      assert(r.getInt(3) == 8)
      assert(r.getString(4) == "café" && r.getString(4).length == 4)
      // one rule (a,b): "abab" -> [ab, ab], "cab" -> [c, ab]
      assert(r.getSeq[String](5) == Seq("ab", "ab", "c", "ab"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
