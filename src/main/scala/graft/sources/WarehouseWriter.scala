package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The engine's sink layer — the reference's materialization surface
  * re-expressed (SURVEY §2.1 S3/S4/S5/S6/S7/S9).
  *
  *  - pipe-delimited dashboard extract: psql `-A --field-separator="|"`
  *    dump + sed cleanup (reference db2wh-etl.sh:73-107,158-159)
  *  - warehouse table: DB2 `CREATE TABLE` + bulk `db2 load`
  *    (db2wh-etl.sh:124-163) → `saveAsTable` on the session catalog
  *  - header CSV of the feature frame: pandas `to_csv`
  *    (reference ct_data.py:148)
  *
  * All writers are distributed `df.write` paths — no driver-side
  * collect; output parallelism = partition count of the frame.
  */
object WarehouseWriter {

  /** S4 sed semantics applied to every string column pre-write:
    * `"` → `'` and ` | ` → ` - ` (protects the delimiter and quote
    * char of the downstream loader). Kept as explicit regexp_replace
    * columns — same relation the reference loads, mechanism columnar. */
  def sedCleanup(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == StringType).foldLeft(df) {
      (acc, f) =>
        acc.withColumn(f.name,
          regexp_replace(regexp_replace(col(f.name), "\"", "'"), " \\| ", " - "))
    }

  /** S3: pipe-delimited, header-less flat-file export (the dashboard
    * extract's on-disk shape). Applies the S4 cleanup so the delimiter
    * can never appear inside a field. */
  def pipeDelimited(df: DataFrame, path: String): Unit =
    sedCleanup(df).write
      .mode(SaveMode.Overwrite)
      .option("sep", "|")
      .option("header", "false")
      .option("emptyValue", "")
      .csv(path)

  /** S9: header CSV export (feature-frame shape). */
  def headerCsv(df: DataFrame, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("emptyValue", "")
      .csv(path)

  /** S5+S6+S7: typed warehouse table — create-or-replace semantics of
    * the reference's DROP TABLE / CREATE TABLE / bulk-load sequence,
    * collapsed into one atomic overwrite of a catalog parquet table.
    * At cluster scale this is the seam where a JDBC/Delta target
    * would plug in. */
  def saveTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)

  /** S7 standalone: idempotent drop (rerun hygiene). */
  def dropIfExists(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
