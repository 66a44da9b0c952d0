package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.DocumentQueries
import graft.operators.{Dedup, Similarity}

/** Degenerate-input behavior: empty corpora, single rows, null text.
  * At pipeline scale these are not hypotheticals — a partition filter
  * that matches nothing, a source whose first snapshot is empty, a
  * crawler row with a null payload — and an operator that throws (or
  * silently mis-counts) on them takes the whole job down. Contract:
  * empty in → empty out, null text behaves as an empty document, no
  * exceptions anywhere.
  */
class DegenerateInputSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Stage a documents fixture dir (same shape as the testdata). */
  private def stageDocs(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft_degen").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private lazy val emptyDir = stageDocs(Seq.empty)
  private lazy val oneDocDir = stageDocs(Seq((7L, "just one document here", "en", "s0")))
  private lazy val nullTextDir = stageDocs(Seq(
    (1L, "real text with several tokens inside it", "en", "s0"),
    (2L, null, "en", "s0"),
    (3L, "", "en", "s0")))

  test("document queries return empty (not throw) on an empty corpus") {
    for (name <- Seq("q17_dedup_exact", "q20_ngram_jaccard", "q21_minhash_lsh",
      "q22_simhash", "q36_winnow_fingerprints", "q45_quality_keep",
      "q46_token_chunks", "q49_hash_split", "q53_repetition",
      "q54_source_mix", "q56_tfidf_topk", "q57_source_overlap",
      "q63_exact_index_screen", "q64_epoch_shuffle",
      "q65_bigram_surprise", "q66_eval_sample", "q69_text_clean",
      "q73_token_budget", "q74_quality_keep")) {
      val n = SparkEntry.queries(name)(spark, emptyDir).count()
      assert(n == 0L, s"$name returned $n rows on an empty corpus")
    }
  }

  test("pair-producing dedup is empty on a single-document corpus") {
    for (name <- Seq("q20_ngram_jaccard", "q21_minhash_lsh", "q22_simhash",
      "q57_source_overlap")) {
      assert(SparkEntry.queries(name)(spark, oneDocDir).count() == 0L,
        s"$name invented a pair from one document")
    }
  }

  test("null and empty text behave as empty documents, not errors") {
    // the real doc survives every per-doc query; null/empty rows either
    // drop out (token queries) or carry zero counts — never throw
    val fp = DocumentQueries.queries("q36_winnow_fingerprints")(spark, nullTextDir)
    assert(fp.filter($"doc_id" === 1L).count() > 0)
    assert(fp.filter($"doc_id" =!= 1L).count() == 0)
    val tfidf = DocumentQueries.queries("q56_tfidf_topk")(spark, nullTextDir)
    assert(tfidf.select($"doc_id").distinct().count() == 1)
    // token-based per-doc scorers CONTRACT: docs with no tokenizable
    // text drop out of the report (a keep-policy would drop them
    // anyway); they must not crash the query or corrupt other rows
    val rep = DocumentQueries.queries("q53_repetition")(spark, nullTextDir)
    assert(rep.count() == 1)
    assert(rep.select($"doc_id").as[Long].head() == 1L)
  }

  test("index screens handle empty batches and degenerate corpora") {
    val docs = Tables.load(spark, sf0001, "documents")
    val emptyBatch = docs.limit(0)
    // empty BATCH against a real index: empty result, no exception
    val mhIdx = Dedup.minhashBandIndex(docs, 5, 32, 8)
    assert(Dedup.nearDupAgainstIndex(emptyBatch, mhIdx, 0.4).count() == 0L)
    val wfIdx = Dedup.winnowIndex(docs, k = 3, w = 4, algo = "md5_60")
    assert(Dedup.contaminationAgainstIndex(emptyBatch, wfIdx).count() == 0L)
    assert(Dedup.dedupAgainstIndex(emptyBatch,
      Dedup.exactHashIndex(docs)).count() == 0L)
    // null/empty-text batch rows behave as empty documents (drop out of
    // the shingle-based screens, exact screen keeps them as content)
    val degenerate = Seq((900L, null.asInstanceOf[String], "en", "s0"),
      (901L, "", "en", "s0")).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text"))
    assert(Dedup.nearDupAgainstIndex(degenerate, mhIdx, 0.4).count() == 0L)
    assert(Dedup.contaminationAgainstIndex(degenerate, wfIdx).count() == 0L)
  }

  test("bloom-screened exact dedup: empty and null-text batches, both routes") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    val index = Dedup.exactHashIndex(docs)
    val bloom = Dedup.exactIndexBloom(index, expectedItems = 1000)
    // empty batch: In(empty) folds the index leg away entirely
    assert(Dedup.dedupAgainstIndexScreened(docs.limit(0), index, bloom)
      .count() == 0L)
    assert(Dedup.dedupAgainstIndexScreened(docs.limit(0), index, bloom,
      inListLimit = 0).count() == 0L)
    // null/empty text: md5(null) is null — null hashes can never match
    // an index row, so both rows keep (as dedupAgainstIndex does); the
    // screened path must agree on BOTH routes
    val degenerate = Seq((900L, null.asInstanceOf[String]), (901L, ""))
      .toDF("doc_id", "text")
    val want = Dedup.dedupAgainstIndex(degenerate, index)
      .collect().map(_.toSeq).toSet
    assert(Dedup.dedupAgainstIndexScreened(degenerate, index, bloom)
      .collect().map(_.toSeq).toSet == want)
    assert(Dedup.dedupAgainstIndexScreened(degenerate, index, bloom,
      inListLimit = 0).collect().map(_.toSeq).toSet == want)
  }

  test("compactParquet no-ops on a directory with no data files") {
    val dir = Files.createTempDirectory("graft_degen_compact").toString
    assert(graft.sources.WarehouseWriter.compactParquet(spark, dir)
      == ((0, 0, 0L)))
  }

  test("q59/q61 return empty (not throw) on empty inputs") {
    // empty documents corpus → zero packs
    assert(DocumentQueries.queries("q61_sequence_packing")(spark, emptyDir)
      .count() == 0L)
    // events table with no view/click rows → outer attribution is empty
    val dir = Files.createTempDirectory("graft_degen_ev").toString
    Seq.empty[(Long, Long, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(SparkEntry.queries("q59_attributed_outer")(spark, dir)
      .count() == 0L)
    // no events at all → no hours to score, not a window error
    assert(SparkEntry.queries("q68_ingest_anomaly")(spark, dir)
      .count() == 0L)
  }

  test("dedup clustering of an empty pair list is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.dedupClusters(empty).count() == 0L)
    assert(Dedup.dedupClustersStar(empty).count() == 0L)
  }

  test("similarity search over an empty embeddings table is empty") {
    val empty = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.bruteForceTopK(empty, lit(true), k = 5).count() == 0L)
    assert(Similarity.blockedNearest(empty, Seq(0, 1)).count() == 0L)
  }
}
