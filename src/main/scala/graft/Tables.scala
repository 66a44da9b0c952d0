package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$dir/$name.parquet")
}
