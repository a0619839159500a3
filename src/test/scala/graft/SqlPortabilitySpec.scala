package graft

/** One query text, two engines, two routes: every TPC-H oracle string is
  * written in the ANSI subset BOTH Spark and DuckDB parse, so the exact
  * text the driver runs in DuckDB must also run verbatim through
  * `spark.sql` and produce the Frame-built query's answer. The driver
  * already proves text-vs-Frame agreement for Q1/Q3/Q6/Q12 (the
  * registered q_sql_tpch_* rows); this spec extends the claim to the
  * whole 22-query suite — a user can lift any of these oracle strings
  * into their own Spark session unchanged.
  *
  * Equality is exact: the texts accumulate through DECIMAL and round
  * before the double cast precisely so results are plan-order
  * independent. */
class SqlPortabilitySpec extends SparkSpec {

  private lazy val catalog = engine.Catalog.forTestdata(spark, sfDir)

  for (n <- 1 to 22) {
    val name = s"q_tpch_q$n"
    test(s"TPC-H Q$n oracle text runs verbatim through spark.sql") {
      catalog // force registration of the fixture views
      val sqlRows = spark.sql(SparkEntry.oracleSql(name))
      val frameRows = SparkEntry.queries(name)(spark, sfDir)
      assert(sqlRows.columns.toSeq == frameRows.columns.toSeq,
        s"$name: column mismatch")
      val a = sqlRows.collect().map(_.toString).sorted.toSeq
      val b = frameRows.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name: verbatim SQL result differs from the Frame plan")
    }
  }
}
