package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotIngest
import graft.sources.SnapshotIngest.TableSpec

class SnapshotIngestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dump tree -> parquet snapshot round-trips through the engine's own loader") {
    // full circle: export two real tables as a pipe-delimited dump tree
    // (the shape a database export / AACT flat-file distribution hands
    // an ingest), run the S8 ingest, and require the restored snapshot
    // to serve IDENTICAL relations through Tables.load — the same
    // loader every declared query reads from
    val dumpDir = Files.createTempDirectory("graft_dump").toString
    val outDir = Files.createTempDirectory("graft_snapshot").toString
    val nation = Tables.load(spark, sf0001, "nation")
    val orders = Tables.load(spark, sf0001, "orders") // date/double/int types
    Seq("nation" -> nation, "orders" -> orders).foreach { case (n, df) =>
      df.write.option("sep", "|").option("header", "true")
        .option("emptyValue", "").csv(s"$dumpDir/$n.csv")
    }

    val counts = SnapshotIngest.ingest(spark, dumpDir, outDir, Seq(
      TableSpec("nation", nation.schema),
      TableSpec("orders", orders.schema)))
    assert(counts("nation") == nation.count())
    assert(counts("orders") == orders.count())

    Seq("nation" -> nation, "orders" -> orders).foreach { case (n, src) =>
      val restored = Tables.load(spark, outDir, n)
      assert(restored.schema == src.schema, s"$n schema drifted")
      assert(restored.exceptAll(src).count() == 0 &&
        src.exceptAll(restored).count() == 0, s"$n rows drifted")
    }
  }

  test("declared schema: empty fields load as NULL, types are pinned") {
    val dumpDir = Files.createTempDirectory("graft_dump_nulls")
    Files.write(dumpDir.resolve("t.csv"),
      "id|name|score\n1|alpha|1.5\n2||\n".getBytes("UTF-8"))
    val outDir = Files.createTempDirectory("graft_snap_nulls").toString
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val n = SnapshotIngest.ingestTable(spark, dumpDir.toString, outDir,
      TableSpec("t", schema, file = Some("t.csv")))
    assert(n == 2)
    val got = spark.read.parquet(s"$outDir/t.parquet")
    assert(got.schema == schema)
    val row2 = got.filter($"id" === 2).collect().head
    assert(row2.isNullAt(1) && row2.isNullAt(2))
  }

  test("FAILFAST: a corrupt row fails the load instead of silently dropping") {
    // pg_restore -e semantics: half a snapshot is worse than none
    val dumpDir = Files.createTempDirectory("graft_dump_bad")
    Files.write(dumpDir.resolve("t.csv"),
      "id|name|score\n1|alpha|1.5\n2|beta|notanumber\n".getBytes("UTF-8"))
    val outDir = Files.createTempDirectory("graft_snap_bad").toString
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("score", DoubleType)))
    intercept[Exception] {
      SnapshotIngest.ingestTable(spark, dumpDir.toString, outDir,
        TableSpec("t", schema, file = Some("t.csv")))
    }
  }
}
