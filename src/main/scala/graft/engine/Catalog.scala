package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-table registry mirroring the reference's `Catalog`
  * (reference: src/catalog/catalog.rs:11-43): register a source by name,
  * get a query-able Frame back.
  *
  * Differences by design:
  *  - the reference EAGERLY parses the whole CSV into memory at
  *    registration (csv_table.rs:44-72); here registration is lazy — the
  *    scan happens distributed at action time, with Catalyst pushing
  *    filters/projections into the (splittable) file scan. At 100 TB,
  *    eager driver-side load is a non-starter.
  *  - Parquet is first-class (the reference's `Table` trait mentions other
  *    sources as an extension point, table.rs:9, but only CSV exists).
  *  - tables are also published as Spark temp views, so `spark.sql` works
  *    against them for free — a frontend the reference lacks entirely.
  */
final class Catalog(val spark: SparkSession) {
  import scala.collection.concurrent.TrieMap
  private val tables = TrieMap.empty[String, DataFrame]
  // file-backed registrations (format, path, options) — what [[save]]
  // persists; DataFrames registered directly have no durable source and
  // are deliberately excluded
  private val sources = TrieMap.empty[String, Seq[String]]
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Register a header'd, schema-inferred CSV (reference:
    * catalog.rs:16-22 + csv_table.rs:44-72). The reference infers from the
    * first 3 rows; Spark's inference scans the file — strictly better. */
  def addCsvTable(name: String, path: String): Catalog = {
    sources.put(name, Seq("csv", path))
    register(name, spark.read
      .option("header", "true").option("inferSchema", "true").csv(path))
  }

  /** Register a parquet table (extension beyond the reference's CSV-only
    * source surface — table.rs:9). */
  def addParquetTable(name: String, path: String): Catalog = {
    sources.put(name, Seq("parquet", path))
    register(name, spark.read.parquet(path))
  }

  /** Register a JSON-lines table (schema inferred). */
  def addJsonTable(name: String, path: String): Catalog = {
    sources.put(name, Seq("json", path))
    register(name, spark.read.json(path))
  }

  /** Register an ORC table. */
  def addOrcTable(name: String, path: String): Catalog = {
    sources.put(name, Seq("orc", path))
    register(name, spark.read.orc(path))
  }

  /** Register a line-oriented TEXT table (one row per line, single
    * `value` column) — the rawest corpus ingest format (WET extracts,
    * log shipping, one-doc-per-line dumps). No parsing, no inference:
    * splitting/typing is the query's job downstream, which is exactly
    * right for 100 TB of lines you haven't profiled yet. */
  def addTextTable(name: String, path: String): Catalog = {
    sources.put(name, Seq("text", path))
    register(name, spark.read.text(path))
  }

  /** Register a JSON-lines table with an ENFORCED schema and an explicit
    * malformed-record policy — the shape real crawl ingestion needs
    * (inference on dirty data at 100 TB is both a full extra pass and a
    * correctness hazard). `mode` is Spark's reader contract:
    * PERMISSIVE (nulls + `_corrupt_record` when the schema declares it),
    * DROPMALFORMED (skip bad lines), FAILFAST (error out). */
  def addJsonTableStrict(name: String, path: String, schemaDdl: String,
      mode: String = "DROPMALFORMED"): Catalog = {
    require(Seq("PERMISSIVE", "DROPMALFORMED", "FAILFAST")
      .contains(mode.toUpperCase(java.util.Locale.ROOT)),
      s"unknown malformed-record mode: $mode")
    sources.put(name, Seq("json-strict", path, schemaDdl, mode))
    register(name, spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
      .option("mode", mode).json(path))
  }

  /** Persist the file-backed registrations (format + path + options per
    * table) so a fresh session can [[Catalog.load]] the same catalog —
    * the registry is metadata-only (a few strings per table), never data.
    * Tables registered from in-memory DataFrames have no durable source
    * and are skipped with a warning. Tab-separated, one table per line. */
  def save(path: String): Catalog = {
    (tables.keySet -- sources.keySet).toSeq.sorted.foreach(n =>
      log.warn(s"catalog save: '$n' was registered from a DataFrame, " +
        "not a file source — skipped"))
    val lines = sources.toSeq.sortBy(_._1).map { case (n, fields) =>
      val all = n +: fields
      require(all.forall(f => !f.contains('\t') && !f.contains('\n')),
        s"catalog save: field with tab/newline in table '$n'")
      all.mkString("\t")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    this
  }

  /** Register an arbitrary DataFrame (memory-table analogue). The temp
    * view is created FIRST so an invalid identifier fails before the
    * engine map is touched (no half-registered state). */
  def register(name: String, df: DataFrame): Catalog = {
    df.createOrReplaceTempView(name)
    tables.put(name, df)
    this
  }

  /** Lookup (reference: catalog.rs:24-29 `get_table_by_name`). */
  def table(name: String): Frame = Frame(tables.getOrElse(name,
    throw new NoSuchElementException(s"no such table: $name")))

  /** Reference: catalog.rs:31-42 `get_table_df`. */
  def getTableDf(name: String): Frame = table(name)

  def tableNames: Seq[String] = tables.keys.toSeq.sorted

  /** Materialize `df` as a bucketed+sorted table (hash-bucketed on
    * `bucketCol` into `nBuckets` files per partition). Two tables bucketed
    * the same way equi-join on that column with NO shuffle on either side
    * — the shuffle is paid once at write time instead of on every join,
    * the standard layout for repeatedly-joined 100 TB fact tables. */
  def addBucketedTable(name: String, df: DataFrame, bucketCol: String,
      nBuckets: Int): Catalog = {
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
      .toAbsolutePath.normalize
    val loc = wh.resolve(name).toAbsolutePath.normalize
    // name guard first, on EVERY path: a name containing separators or
    // ".." must fail identically whether or not the table already exists
    // (a live-table overwrite with a bad name must not reach saveAsTable)
    require(loc.getParent == wh && loc.getFileName.toString == name,
      s"addBucketedTable: illegal table name '$name' (resolves outside the warehouse)")
    // a table directory left behind by a PREVIOUS session (in-memory
    // metastore gone, files still in the warehouse) is an orphan that
    // mode("overwrite") refuses with LOCATION_ALREADY_EXISTS — remove it,
    // but ONLY when the catalog genuinely has no such table (never
    // delete data a live catalog entry owns)
    if (!spark.catalog.tableExists(name) && Files.isDirectory(loc)) {
      // reclaim only when Spark-output markers sit DIRECTLY under the
      // directory: a data/commit marker buried deeper belongs to a nested
      // output inside a user-owned directory, which we must not reap.
      // Markers: _SUCCESS, part-* data files of any format, and the
      // _temporary/_committed/_started droppings of an aborted write.
      val topLevel = {
        val s = Files.list(loc)
        try s.iterator().asScala.map(_.getFileName.toString).toSeq
        finally s.close()
      }
      val sparkWritten = topLevel.exists { fn =>
        fn == "_SUCCESS" || fn == "_temporary" || fn.startsWith("part-") ||
          fn.startsWith("_committed") || fn.startsWith("_started")
      }
      if (sparkWritten) {
        val files = {
          val s = Files.walk(loc)
          try s.iterator().asScala.toSeq finally s.close()
        }
        files.reverse.foreach(Files.deleteIfExists(_))
      } else {
        log.warn(s"addBucketedTable: existing directory $loc has no " +
          "Spark-output marker at its top level; leaving it in place — " +
          "the write below will fail with LOCATION_ALREADY_EXISTS")
      }
    }
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(name)
    // a lingering same-named temp view would shadow the new table for
    // BOTH the SQL frontend and an unqualified read-back — drop it, then
    // read back qualified with the CURRENT database (saveAsTable writes
    // there, not necessarily `default`)
    spark.catalog.dropTempView(name)
    val db = spark.catalog.currentDatabase
    tables.put(name, spark.table(s"`$db`.`$name`"))
    this
  }

  /** UDF registration passthrough (SURVEY.md §7.3) — exposes Spark's UDF
    * surface through the engine facade. Prefer built-in functions / native
    * Expressions (codegen'd) for hot paths; a Scala UDF is the documented
    * escape hatch, not the default. */
  def registerUdf[RT: scala.reflect.runtime.universe.TypeTag,
      A1: scala.reflect.runtime.universe.TypeTag](
      name: String, f: A1 => RT): Catalog = {
    spark.udf.register(name, f)
    this
  }

  def registerUdf2[RT: scala.reflect.runtime.universe.TypeTag,
      A1: scala.reflect.runtime.universe.TypeTag,
      A2: scala.reflect.runtime.universe.TypeTag](
      name: String, f: (A1, A2) => RT): Catalog = {
    spark.udf.register(name, f)
    this
  }

  /** Typed UDAF registration (the user-facing form of the reference's
    * internal `AggrOperator` trait — reference: aggr/mod.rs:22-32, which
    * has no registration API). A Spark `Aggregator[IN, BUF, OUT]` gets
    * full partial+final distributed execution: `reduce` runs map-side,
    * `merge` combines per-partition buffers, so a custom aggregate
    * scales exactly like a built-in. Same escape-hatch guidance as
    * [[registerUdf]]: prefer built-ins / native expressions where one
    * exists — a UDAF's buffer serializes through the encoder on every
    * exchange. */
  def registerUdaf[IN: scala.reflect.runtime.universe.TypeTag, BUF, OUT](
      name: String,
      agg: org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT]): Catalog = {
    spark.udf.register(name, org.apache.spark.sql.functions.udaf(agg))
    this
  }
}

/** Convenience loaders for the driver-provided synthetic star schema
  * (TESTDATA.md): `tables(spark, sfDir)` registers all ten tables. */
object Catalog {
  val tableNamesAll: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Rebuild a catalog saved by [[Catalog.save]] on a (possibly new)
    * session. Registration is lazy, so loading is metadata-only. */
  def load(spark: SparkSession, path: String): Catalog = {
    val c = new Catalog(spark)
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    content.split("\n").filter(_.nonEmpty).foreach { line =>
      line.split("\t").toSeq match {
        case Seq(n, "csv", p) => c.addCsvTable(n, p)
        case Seq(n, "parquet", p) => c.addParquetTable(n, p)
        case Seq(n, "json", p) => c.addJsonTable(n, p)
        case Seq(n, "orc", p) => c.addOrcTable(n, p)
        case Seq(n, "text", p) => c.addTextTable(n, p)
        case Seq(n, "json-strict", p, ddl, mode) =>
          c.addJsonTableStrict(n, p, ddl, mode)
        case other => throw new IllegalArgumentException(
          s"catalog load: unrecognized registry line: $other")
      }
    }
    c
  }

  def forTestdata(spark: SparkSession, sfDir: String): Catalog = {
    val c = new Catalog(spark)
    tableNamesAll.foreach(n => c.addParquetTable(n, s"$sfDir/$n.parquet"))
    c
  }
}
