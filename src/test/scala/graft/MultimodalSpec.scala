package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("batched mapPartitions decode agrees with the expression form") {
    val docs = Tables.load(spark, sf0001, "documents")
    val media = Multimodal.toMediaTable(docs)
    val viaPartitions = Multimodal.extractFeatures(media.as[Multimodal.MediaRow])
      .toDF()
    val viaExpr = Multimodal.featuresExpr(media)
    assert(viaPartitions.count() == 500)
    assert(viaPartitions.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.exceptAll(viaPartitions).count() == 0)
  }

  test("both paths agree on non-ASCII and empty payloads") {
    val media = Multimodal.toMediaTable(Seq(
      (1L, "plain ascii text"),
      (2L, "naïve café — résumé"),      // multi-byte UTF-8
      (3L, "日本語のテキスト"),           // 3-byte sequences
      (4L, ""))                          // empty payload
      .toDF("doc_id", "text"))
    val viaPartitions = Multimodal.extractFeatures(media.as[Multimodal.MediaRow])
      .toDF()
    val viaExpr = Multimodal.featuresExpr(media)
    assert(viaPartitions.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.exceptAll(viaPartitions).count() == 0)
  }

  test("decode stub is deterministic and total") {
    val (w1, h1, b1) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val (w2, h2, b2) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert((w1, h1, b1) == (w2, h2, b2))
    val (_, _, b0) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(b0 == 0.0)
  }
}
