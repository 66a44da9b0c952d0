package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{count, lit}
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

  /** Ingest one table; returns the row count actually written (the
    * load-audit number a restore log records). The count rides the
    * write itself via `observe` — rows are tallied in-flight as the
    * load streams through, so the audit number costs ZERO extra I/O
    * (a post-write re-read would double the read volume of a 100 TB
    * restore just to produce one long). */
  def ingestTable(spark: SparkSession, dumpDir: String, outDir: String,
      spec: TableSpec, delimiter: String = "|", header: Boolean = true,
      nullValue: String = "", mode: String = "FAILFAST",
      partitions: Int = 0): Long = {
    val src = s"$dumpDir/${spec.file.getOrElse(spec.name + ".csv")}"
    val df = readDelimited(spark, src, spec.schema, delimiter, header,
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
      mode: String = "FAILFAST", partitions: Int = 0): Map[String, Long] =
    specs.map { spec =>
      spec.name -> ingestTable(spark, dumpDir, outDir, spec, delimiter,
        header, nullValue, mode, partitions)
    }.toMap
}
