package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.types.StructType

/** S8 — the one-time dump→snapshot ingest utility (the last §2.1 row):
  * the reference restores the AACT monthly dump into its warehouse
  * before anything else runs (`docker/aact/docker-entrypoint-initdb.d/
  * init-user-db.sh:27-28` — `pg_restore` of `postgres.dmp`, fetched at
  * monthly cadence by `docker/aact/Dockerfile:20-22`). This is the
  * Spark-native analogue over the dump format a warehouse can't import
  * directly but every database can EXPORT: a directory of delimited
  * text files, one per table (AACT itself publishes exactly this as
  * its "pipe-delimited flat files" distribution). Each table is read
  * with a DECLARED schema and written as `<out>/<table>.parquet` — the
  * snapshot layout [[graft.Tables]] serves every query from.
  *
  * Design choices, all scale-driven:
  *  - schemas are required, never inferred: inference is a full extra
  *    pass over the dump before the real one (same stance as
  *    [[WarehouseWriter.readJsonl]]), and a declared schema pins types
  *    against a drifting upstream export.
  *  - the read is a distributed CSV scan — a table split across many
  *    files (or one large UNCOMPRESSED file, which is splittable)
  *    parallelizes across executors; gzip'd exports are whole-file
  *    units, so prefer many moderate files per table.
  *  - `FAILFAST` by default: a load is the one place silent row loss
  *    is never acceptable (`pg_restore -e` is the same stance). Pass
  *    `mode = "PERMISSIVE"` plus a `_corrupt_record` column in the
  *    schema to triage a dirty dump instead.
  *  - output goes through the parquet writer, so layout knobs
  *    compose: `partitions` re-buckets a table whose export came as
  *    one giant file; for join/scan-optimized layouts load first, then
  *    [[WarehouseWriter.saveBucketed]]/[[WarehouseWriter.saveSorted]].
  */
object SnapshotIngest {

  /** One table of the dump: reads `<dumpDir>/<file>` (default
    * `<name>.csv`), writes `<outDir>/<name>.parquet`. */
  final case class TableSpec(name: String, schema: StructType,
      file: Option[String] = None)

  /** Read one delimited export with its declared schema. Defaults match
    * the common warehouse export shape (and AACT's flat files): pipe
    * delimiter, header row, empty string as NULL. */
  def readDelimited(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = "|", header: Boolean = true,
      nullValue: String = "", mode: String = "FAILFAST"): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", delimiter)
      .option("header", header.toString)
      .option("nullValue", nullValue)
      .option("mode", mode)
      .csv(path)

  /** What a table's exported header says relative to its declared
    * schema. `reordered` is only meaningful when both diff lists are
    * empty (same names, different positions). */
  final case class HeaderDrift(table: String, declared: Seq[String],
      actual: Seq[String]) {
    def missing: Seq[String] = declared.diff(actual)
    def added: Seq[String] = actual.diff(declared)
    def reordered: Boolean =
      missing.isEmpty && added.isEmpty && declared != actual
    def isClean: Boolean = declared == actual
  }

  /** The column names a delimited export's header row declares — ONE
    * line read on the driver through the Hadoop filesystem, zero Spark
    * jobs (a 100-table restore preflight should not launch 100 header
    * jobs; `ingestTable`'s one-action audit pin holds). Multi-file
    * exports share one header shape, so the first file answers for the
    * table; compressed files route through the Hadoop codec factory.
    * Outer quotes are stripped per field — a delimiter INSIDE a quoted
    * header name is not supported (no warehouse export does this). */
  def headerOf(spark: SparkSession, path: String,
      delimiter: String = "|"): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(_.getPath).sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(
            s"no data files under $path"))
      else p
    val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      .getCodec(file)
    val raw = fs.open(file)
    val in = if (codec == null) raw else codec.createInputStream(raw)
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        in, java.nio.charset.StandardCharsets.UTF_8))
      Option(reader.readLine()).getOrElse("")
        .split(java.util.regex.Pattern.quote(delimiter), -1).toSeq
        .map(_.stripPrefix("\"").stripSuffix("\""))
    } finally in.close()
  }

  /** Diff a dump table's header against its declared schema — the
    * monthly-drift preflight. THE TRAP this exists for: Spark maps a
    * declared CSV schema to columns BY POSITION, not by header name —
    * an upstream export that gains a column mid-table silently shifts
    * every later column's data one slot left, types permitting (the
    * reference's upstream does evolve: AACT revises its table layouts
    * between monthly dumps). `_corrupt_record` is excluded from the
    * declared side (it is Spark's triage column, never in the file). */
  def headerDrift(spark: SparkSession, dumpDir: String, spec: TableSpec,
      delimiter: String = "|"): HeaderDrift = {
    val src = s"$dumpDir/${spec.file.getOrElse(spec.name + ".csv")}"
    HeaderDrift(spec.name,
      spec.schema.fieldNames.toSeq.filterNot(_ == "_corrupt_record"),
      headerOf(spark, src, delimiter))
  }

  /** Load a DRIFTED export by NAME instead of position: declared
    * columns are picked out of the file's own header wherever they
    * moved, columns the export dropped come back as typed NULLs, and
    * columns it gained are ignored — the read every schema-evolution
    * story needs between "the dump changed" and "the specs caught up".
    * The raw read is all-string with the file's header (no inference
    * pass); declared types apply as explicit casts, so a type-hostile
    * cell becomes NULL rather than a job failure — pair with a
    * follow-up NOT-NULL audit where that matters. */
  def readDelimitedByName(spark: SparkSession, path: String,
      schema: StructType, delimiter: String = "|",
      nullValue: String = ""): DataFrame = {
    val raw = spark.read
      .option("sep", delimiter)
      .option("header", "true")
      .option("inferSchema", "false")
      .option("nullValue", nullValue)
      .csv(path)
    val have = raw.columns.toSet
    val cols: Seq[Column] = schema.fields.toSeq
      .filterNot(_.name == "_corrupt_record")
      .map { f =>
        if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
    raw.select(cols: _*)
  }

  /** Ingest one table; returns the row count actually written (the
    * load-audit number a restore log records). The count rides the
    * write itself via `observe` — rows are tallied in-flight as the
    * load streams through, so the audit number costs ZERO extra I/O
    * (a post-write re-read would double the read volume of a 100 TB
    * restore just to produce one long). */
  def ingestTable(spark: SparkSession, dumpDir: String, outDir: String,
      spec: TableSpec, delimiter: String = "|", header: Boolean = true,
      nullValue: String = "", mode: String = "FAILFAST",
      partitions: Int = 0, byName: Boolean = false): Long = {
    val src = s"$dumpDir/${spec.file.getOrElse(spec.name + ".csv")}"
    // positional schema application + a drifted export = silent column
    // shift, the one corruption FAILFAST cannot see (every cell still
    // parses) — so a headered ingest verifies the header first and
    // names the remedy in the failure. byName opts into the aligned
    // read instead.
    if (header && !byName) {
      val drift = headerDrift(spark, dumpDir, spec, delimiter)
      require(drift.isClean,
        s"dump header for '${spec.name}' drifted from the declared " +
          s"schema (missing=${drift.missing.mkString(",")} " +
          s"added=${drift.added.mkString(",")} " +
          s"reordered=${drift.reordered}) — update the TableSpec, or " +
          "ingest with byName = true to align by column name")
    }
    val df =
      if (byName) readDelimitedByName(spark, src, spec.schema, delimiter,
        nullValue)
      else readDelimited(spark, src, spec.schema, delimiter, header,
        nullValue, mode)
    val shaped = if (partitions > 0) df.repartition(partitions) else df
    val audit = Observation(s"ingest_${spec.name}")
    shaped.observe(audit, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/${spec.name}.parquet")
    audit.get.apply("rows").asInstanceOf[Long]
  }

  /** Ingest a whole dump tree → snapshot dir. Tables load sequentially
    * (each load is itself distributed across the cluster; the
    * bottleneck is executor I/O, not table count), and a failing table
    * fails the ingest — half a snapshot is worse than none. Returns
    * per-table row counts. */
  def ingest(spark: SparkSession, dumpDir: String, outDir: String,
      specs: Seq[TableSpec], delimiter: String = "|",
      header: Boolean = true, nullValue: String = "",
      mode: String = "FAILFAST", partitions: Int = 0,
      byName: Boolean = false): Map[String, Long] =
    specs.map { spec =>
      spec.name -> ingestTable(spark, dumpDir, outDir, spec, delimiter,
        header, nullValue, mode, partitions, byName)
    }.toMap
}
