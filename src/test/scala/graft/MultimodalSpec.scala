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

  test("real javax.imageio decoder: PNG bytes through the same seam") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // paint a solid-gray w×h PNG: mean luma is exactly gray/255 (BT.601
    // weights sum to 1), so the expected features are known in closed form
    def png(w: Int, h: Int, gray: Int): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
      val out = new ByteArrayOutputStream()
      ImageIO.write(im, "png", out)
      out.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, png(7, 5, 0), "image/png"),     // black
      Multimodal.MediaRow(2L, png(16, 9, 255), "image/png"),  // white
      Multimodal.MediaRow(3L, png(3, 3, 128), "image/png"),   // mid-gray
      Multimodal.MediaRow(4L, "not an image".getBytes("UTF-8"),
        "application/octet-stream"))                          // undecodable
      .toDS().repartition(2)
    val got = Multimodal.extractImageFeatures(media)
      .collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).width == 7 && got(1L).height == 5 && got(1L).ok)
    assert(got(1L).mean_luma == 0.0)
    assert(got(2L).width == 16 && got(2L).height == 9)
    assert(got(2L).mean_luma == 1.0)
    assert(got(3L).width == 3 && got(3L).height == 3)
    // 128/255 with BT.601 weights (which sum to 1) = 0.50196...
    assert(math.abs(got(3L).mean_luma - 128.0 / 255.0) < 1e-3)
    assert(!got(4L).ok && got(4L).width == 0 && got(4L).mean_luma == 0.0)
    assert(got(4L).n_bytes == "not an image".length)
  }

  test("frame sampling: batched path equals the expression twin, corpus + edge payloads") {
    val organic = Multimodal.toMediaTable(Tables.load(spark, sf0001, "documents"))
    val edges = Multimodal.toMediaTable(Seq(
      (9001L, "naïve café — résumé"),   // multi-byte UTF-8
      (9002L, "日本語のテキスト"),
      (9003L, "tiny"),                   // shorter than one frame window
      (9004L, ""))                       // empty payload -> 1 empty frame
      .toDF("doc_id", "text"))
    Seq(organic, edges).foreach { media =>
      val viaPartitions = Multimodal
        .sampleFrames(media.as[Multimodal.MediaRow], maxFrames = 4).toDF()
      val viaExpr = Multimodal.frameSampleExpr(media, maxFrames = 4)
      assert(viaPartitions.count() > 0)
      assert(viaPartitions.exceptAll(viaExpr).count() == 0)
      assert(viaExpr.exceptAll(viaPartitions).count() == 0)
    }
  }

  test("frame geometry: 1..maxFrames frames per doc, offsets strided, windows bounded") {
    val media = Multimodal.toMediaTable(Tables.load(spark, sf0001, "documents"))
    val frames = Multimodal.sampleFrames(
      media.as[Multimodal.MediaRow], maxFrames = 4).cache()
    val perDoc = frames.groupBy($"doc_id").count()
    assert(perDoc.filter($"count" < 1 || $"count" > 4).count() == 0)
    assert(frames.filter($"frame_len" > 16 || $"frame_len" < 0).count() == 0)
    assert(frames.filter($"frame_brightness" < 0 || $"frame_brightness" > 1)
      .count() == 0)
  }

  test("resize: payload truncated or zero-padded to the target budget") {
    val media = Multimodal.toMediaTable(Seq(
      (1L, "x" * 100),   // longer than 8x8=64 -> truncated
      (2L, "short"))     // shorter -> zero-padded
      .toDF("doc_id", "text"))
    val resized = Multimodal.resize(media.as[Multimodal.MediaRow], 8, 8)
      .collect().map(r => r.doc_id -> r.content).toMap
    assert(resized(1L).length == 64 && resized(2L).length == 64)
    assert(resized(1L).sameElements(("x" * 64).getBytes("UTF-8")))
    assert(resized(2L).take(5).sameElements("short".getBytes("UTF-8")))
    assert(resized(2L).drop(5).forall(_ == 0))
  }

  test("decode stub is deterministic and total") {
    val (w1, h1, b1) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val (w2, h2, b2) = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert((w1, h1, b1) == (w2, h2, b2))
    val (_, _, b0) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(b0 == 0.0)
  }
}
