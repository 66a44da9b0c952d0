package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated star-schema snapshot (TESTDATA.md).
  *
  * One parquet file per table. At cluster scale these would be partitioned
  * catalog tables; the loader is the single seam where that swap happens
  * (mirrors the snapshot-reader role of the reference's psycopg2 extract,
  * see reference src/main/py/ct_data.py:69-97).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright — read it as raw nanos (legacy conf) and convert to
    * a TIMESTAMP_NTZ of microseconds. The testdata carries no
    * sub-microsecond components, so `div 1000` is lossless (cross-checked
    * by the DuckDB oracle, which reads the nanos natively). Integer `div`
    * keeps the arithmetic exact — a double division would lose precision
    * above 2^53 ns.
    *
    * The nanos flag must come from the session builder
    * ([[GraftSession.defaults]]) — it is consulted again at execution
    * time, so a loader can neither scope-and-restore it nor pass it as
    * a per-read option (execution overwrites the option from session
    * conf). This loader only VERIFIES it, failing fast with the remedy
    * rather than mutating shared session state (ContractSpec pins
    * both). */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    GraftSession.requireNanosConf(spark)
    // timestampadd against an NTZ epoch keeps the naive micros naive —
    // a timestamp_micros→ntz cast would shift them by the session TZ
    // offset (ScaleOpsSpec pins q51 equal across UTC and a DST zone)
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        expr("""timestampadd(MICROSECOND, ts div 1000,
                TIMESTAMP_NTZ '1970-01-01 00:00:00')"""))
  }
}
