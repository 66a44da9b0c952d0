package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The engine's JDBC INGRESS seam — the read-side twin of
  * [[WarehouseWriter.saveJdbc]] and the Spark mapping of the reference's
  * primary extract path: a server-side-filtered client query against a
  * live warehouse (reference src/main/py/ct_data.py:69-97 runs one SQL
  * statement in Postgres via psycopg2 and pulls only its result set).
  *
  * Scale stance: a JDBC source is a single-cursor pull unless told
  * otherwise — fine for dimension-sized extracts, a non-starter for
  * facts. [[readTablePartitioned]] is the fact-table shape: Spark opens
  * `numPartitions` cursors, each bounded by a disjoint predicate on the
  * partition column, so ingress parallelism (and retry granularity)
  * equals the partition count instead of 1. Predicates and projections
  * on any of these frames push down to the database (`PushedFilters` on
  * the JDBCRelation scan — spec-pinned), which is exactly the
  * reference's contract of running its WHERE clauses in Postgres rather
  * than client-side.
  */
object JdbcIngress {

  /** Whole-table scan seam (S1's "or" leg). Filters/projections applied
    * by the caller push down to the database — the frame is a plan over
    * the remote table, not a pulled copy. */
  def readTable(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Query-driven extract — the literal ct_data.py shape: the ENTIRE
    * statement (joins, aggregates, CASE ladders) executes server-side
    * and only its result set crosses the wire. Use when the warehouse
    * should do the reduction; use [[readTable]] +
    * DataFrame ops when Spark should (e.g. the result is fact-sized and
    * the cluster out-muscles the database). */
  def readQuery(spark: SparkSession, url: String, sql: String,
      props: Properties = new Properties()): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("query", sql)
    props.stringPropertyNames().toArray(Array.empty[String])
      .foldLeft(reader)((r, k) => r.option(k, props.getProperty(k)))
      .load()
  }

  /** Parallel fact-table ingress: `numPartitions` concurrent cursors,
    * each reading `[lower, upper]` stripes of `partCol`. This is the
    * 100-TB-adjacent shape — a single-cursor pull of a large table
    * serializes the whole extract through one connection and one task;
    * striping makes ingress scale with the cluster until the database
    * itself saturates. `partCol` wants an indexed numeric key (the
    * reference schema's `id`/`nct_id`-style keys). */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, props)

  /** [[readTable]] through an [[IniConfig]] — the properties-file-driven
    * connection of the reference (`aact.properties`,
    * ct_data.py:32-40): url/user/password come from the config file,
    * not code. */
  def readConfigured(spark: SparkSession, cfg: IniConfig,
      table: String): DataFrame =
    readTable(spark, cfg.jdbcUrl, table, cfg.connectionProperties)

  /** The extract HOP: pull each named table from the warehouse and lay
    * it down as the parquet snapshot [[graft.Tables.load]] serves —
    * the reference's psycopg2-extract-then-process flow with the
    * process half decoupled behind the snapshot contract. Dimension
    * tables pull single-cursor; pass stripe specs in `striped` for the
    * fact-sized ones. */
  def snapshotFromJdbc(spark: SparkSession, url: String,
      tables: Seq[String], outDir: String,
      props: Properties = new Properties(),
      striped: Map[String, (String, Long, Long, Int)] = Map.empty): Unit =
    tables.foreach { t =>
      val df = striped.get(t) match {
        case Some((c, lo, hi, n)) =>
          readTablePartitioned(spark, url, t, c, lo, hi, n, props)
        case None => readTable(spark, url, t, props)
      }
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    }
}
