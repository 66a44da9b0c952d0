package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Config, WarehouseWriter}

/** Round-trip contracts for the sink layer (SURVEY S3/S4/S5/S6/S7/S9):
  * write → re-read → exact match against the (cleaned) source frame.
  */
class WarehouseWriterSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def fixture = Seq(
    (1L, "plain text", "Completed", 10),
    (2L, "has \"quotes\" inside", "Terminated", 20),
    (3L, "pipe | in | the middle", "Recruiting", 30),
    (4L, "both \" and | mixed", "Withdrawn", 40))
    .toDF("id", "note", "status", "n")

  test("sed cleanup: quotes become apostrophes, padded pipes become dashes") {
    val got = WarehouseWriter.sedCleanup(fixture)
      .orderBy($"id").select($"note").as[String].collect()
    assert(got(1) == "has 'quotes' inside")
    assert(got(2) == "pipe - in - the middle")
    assert(got(3) == "both ' and - mixed")   // bare | (no padding) untouched by ' | ' rule
  }

  test("pipe-delimited sink round-trips the cleaned frame (S3+S4)") {
    val dir = tmp("graft-pipe")
    WarehouseWriter.pipeDelimited(fixture, dir)
    val back = spark.read
      .schema(StructType(Seq(
        StructField("id", LongType), StructField("note", StringType),
        StructField("status", StringType), StructField("n", IntegerType))))
      .option("sep", "|").option("header", "false").csv(dir)
    val exp = WarehouseWriter.sedCleanup(fixture)
    assert(back.count() == 4)
    assert(back.exceptAll(exp).isEmpty && exp.exceptAll(back).isEmpty)
  }

  test("header CSV sink round-trips with inferred header (S9)") {
    val dir = tmp("graft-csv")
    WarehouseWriter.headerCsv(fixture, dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir)
    assert(back.columns.toSeq == fixture.columns.toSeq)
    assert(back.count() == 4)
    // quoted CSV preserves raw content exactly — no sed needed on this path
    val note2 = back.filter($"id" === 2).select($"note").as[String].head()
    assert(note2 == "has \"quotes\" inside")
  }

  test("warehouse table: overwrite + drop-if-exists semantics (S5/S6/S7)") {
    WarehouseWriter.saveTable(fixture, "ctgov_test")
    val first = spark.table("ctgov_test")
    assert(first.count() == 4)
    // rerun with different content must fully replace (DROP+CREATE+load)
    WarehouseWriter.saveTable(fixture.filter($"id" <= 2), "ctgov_test")
    assert(spark.table("ctgov_test").count() == 2)
    WarehouseWriter.dropIfExists(spark, "ctgov_test")
    assert(!spark.catalog.tableExists("ctgov_test"))
    WarehouseWriter.dropIfExists(spark, "ctgov_test") // idempotent
  }

  test("jdbc sink round-trips through an embedded Derby warehouse (S5)") {
    // Derby ships with Spark's jar set; an in-memory DB exercises the
    // exact write path (batched INSERT stream per partition) the
    // reference's `db2 load` maps to — swap the URL for a real
    // warehouse in production.
    val url = "jdbc:derby:memory:graftwh;create=true"
    WarehouseWriter.saveJdbc(fixture, url, "CTGOV_JDBC")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "CTGOV_JDBC").load()
    assert(back.count() == 4)
    assert(back.columns.sorted.toSeq == fixture.columns.sorted.toSeq)
    val note2 = back.filter($"id" === 2).select($"note").as[String].head()
    assert(note2 == "has \"quotes\" inside")
    // overwrite semantics hold on the jdbc path too (S7)
    WarehouseWriter.saveJdbc(fixture.filter($"id" <= 1), url, "CTGOV_JDBC")
    assert(spark.read.format("jdbc")
      .option("url", url).option("dbtable", "CTGOV_JDBC").load().count() == 1)
  }

  test("jdbc scan seam (S1): filters push down to the external database") {
    // the reference's S1 is a server-side-filtered client query
    // (ct_data.py:84-88 — every predicate runs in Postgres); Spark's
    // jdbc source keeps that contract: the filter must appear as a
    // pushed predicate on the scan, not a Spark-side Filter over a full
    // table pull
    val url = "jdbc:derby:memory:graftscan;create=true"
    WarehouseWriter.saveJdbc(fixture, url, "CTGOV_SCAN")
    val scanned = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "CTGOV_SCAN").load()
      .filter($"n" > 15).select($"id", $"n")
    assert(scanned.count() == 3)
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [*IsNotNull(n), *GreaterThan(n,15)]") ||
      (plan.contains("PushedFilters") && plan.contains("GreaterThan(n,15)")),
      s"jdbc scan lost its pushed filter:\n$plan")
  }

  test("jsonl corpus sink/source round-trips the documents table, plain and gzip") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    for (codec <- Seq("none", "gzip")) {
      val dir = tmp(s"graft-jsonl-$codec")
      WarehouseWriter.saveJsonl(docs, dir, codec)
      val back = WarehouseWriter.readJsonl(spark, dir, docs.schema)
      assert(back.count() == docs.count())
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
        s"jsonl round-trip drifted under codec=$codec")
    }
  }

  test("jsonl source surfaces malformed lines as _corrupt_record, not a job failure") {
    val dir = tmp("graft-jsonl-bad")
    Files.writeString(java.nio.file.Paths.get(dir, "part-000.jsonl"),
      """{"doc_id": 1, "text": "good line"}
        |not json at all {{{
        |{"doc_id": 2, "text": "also good"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val back = WarehouseWriter.readJsonl(spark, dir, schema).cache()
    assert(back.count() == 3)
    assert(back.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(back.filter($"doc_id".isNotNull).count() == 2)
  }

  test("properties config seam parses and renders k=v pairs (S2)") {
    val f = Files.createTempFile("graft", ".properties")
    Files.writeString(f, "host=localhost\nport=5432\ndbname=aact\n")
    val conf = Config.fromFile(f.toString)
    assert(conf == Map("host" -> "localhost", "port" -> "5432", "dbname" -> "aact"))
    assert(Config.render(conf) == "dbname=aact host=localhost port=5432")
  }
}
