package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The Spark-side shape is real and tested — schema, encoders, batch
  * iteration, partitioning. The codec seam carries TWO decoders: a
  * deterministic STUB ([[Multimodal.decodeStub]], oracle-checkable, no
  * external libraries) and a REAL `javax.imageio` image decoder
  * ([[Multimodal.decodeImage]]) proving the same `mapPartitions`
  * plumbing holds for a non-synthetic codec. Video/audio decoders slot
  * in the same way (JNI / process-per-partition) without touching the
  * plan shape.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte], mime: String)

  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, brightness: Double)

  /** Wrap a text corpus as a media table: payload becomes an opaque
    * binary column + mime metadata (stand-in for image/audio bytes). */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"))

  /** STUB decode — deterministic fake in place of a real image decode.
    * Derives pseudo-dimensions/brightness from the payload bytes so the
    * pipeline is testable end-to-end. A production decoder replaces ONLY
    * the body of this function. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val width = 64 + (n % 577)
    val height = 64 + ((n * 31) % 411)
    val brightness =
      if (n == 0) 0.0
      else bytes.iterator.map(b => (b & 0xff).toDouble).sum / (255.0 * n)
    (width, height, brightness)
  }

  /** Batched feature extraction: partition-local iteration (the
    * `mapInPandas` shape in Scala — one decoder context per partition,
    * rows streamed through it). No shuffle; parallelism = input
    * partitioning. Brightness rounds HALF_UP to match Spark's `round`,
    * so the two paths agree on any payload (asserted in
    * MultimodalSpec, incl. non-ASCII). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder context would be initialized here
      rows.map { r =>
        val (w, h, b) = decodeStub(r.content)
        MediaFeatures(r.doc_id, r.content.length, w, h,
          BigDecimal(b).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
    }
  }

  case class ImageFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, mean_luma: Double, ok: Boolean)

  /** REAL image decode — `javax.imageio` (present on every JVM, no
    * extra dependency): actual pixel dimensions and mean luma
    * (ITU-R BT.601: 0.299 R + 0.587 G + 0.114 B, normalized to [0,1])
    * over the decoded raster. Returns None for payloads no registered
    * reader accepts — a corpus-scale pipeline must carry decode
    * failures as data (a dropped-silently row is a lost audit trail),
    * so [[extractImageFeatures]] flags rather than filters them.
    * Proves the [[decodeStub]] seam holds for a non-synthetic codec:
    * same signature shape, same partition-local batching. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    Option(img).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      (w, h, sum / (255.0 * w * h))
    }
  }

  /** [[extractFeatures]] with the REAL decoder: identical
    * `mapPartitions` plumbing (one codec context per partition, rows
    * streamed through, no shuffle), `javax.imageio` in place of the
    * stub. Undecodable payloads come out as `ok = false` with zeroed
    * features so downstream can count/quarantine them. */
  def extractImageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder context: ImageIO scans its reader
      // registry once per JVM; nothing per-row beyond the decode
      rows.map { r =>
        decodeImage(r.content) match {
          case Some((w, h, luma)) =>
            ImageFeatures(r.doc_id, r.content.length, w, h,
              BigDecimal(luma).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble, ok = true)
          case None =>
            ImageFeatures(r.doc_id, r.content.length, 0, 0, 0.0, ok = false)
        }
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_off: Long,
                      frame_len: Long, frame_brightness: Double)

  /** STUB frame extraction — deterministic fake in place of a real video
    * frame sampler: frame count varies with payload size (1..maxFrames),
    * frames are evenly-strided byte windows of ≤ 16 bytes, and the
    * "feature" is the window's mean byte value. A production sampler
    * replaces ONLY this body (seek + decode per frame); the 1→N row fan
    * and per-frame byte-range reads are the real plumbing. */
  def frameStub(bytes: Array[Byte], maxFrames: Int): Seq[(Long, Long, Long, Double)] = {
    val n = bytes.length.toLong
    val fcount = 1 + (n % maxFrames)
    val stride = n / fcount
    (0L until fcount).map { j =>
      val off = j * stride
      val len = math.min(16L, n - off)
      val brightness =
        if (len == 0) 0.0
        else {
          val s = (off until off + len)
            .map(i => (bytes(i.toInt) & 0xff).toDouble).sum
          BigDecimal(s / (255.0 * len))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      (j, off, len, brightness)
    }
  }

  /** Batched frame sampling through the decoder seam: the `mapInPandas`
    * shape in Scala — one (stub) codec context per partition, each media
    * row fanning into its frame rows. No shuffle; output rows ≈
    * maxFrames × input. */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec context would be initialized here
      rows.flatMap { r =>
        frameStub(r.content, maxFrames).map { case (j, off, len, b) =>
          FrameRow(r.doc_id, j, off, len, b)
        }
      }
    }
  }

  /** Frame sampling as pure Column expressions — the oracle twin of
    * [[sampleFrames]] (same geometry and byte math, asserted equal in
    * MultimodalSpec): frames built with `transform(sequence(...))` and
    * exploded with `inline`, per-frame brightness folded over the raw
    * bytes via the hex-pair decode. */
  def frameSampleExpr(media: DataFrame, maxFrames: Int): DataFrame = {
    val n = octet_length(col("content")).cast("long")
    val fcount = (lit(1L) + n % maxFrames).cast("long")
    val stride = floor(n / fcount).cast("long")
    val hx = hex(col("content"))
    def frameOf(j: Column) = {
      val off = j * stride
      val len = least(lit(16L), n - off)
      val byteSum = aggregate(
        transform(
          sequence(lit(0L), len - 1),
          i => conv(hx.substr(((off + i) * 2 + 1).cast("int"), lit(2)), 16, 10)
            .cast("double")),
        lit(0.0), (acc, x) => acc + x)
      struct(
        j.as("frame_idx"),
        off.as("frame_off"),
        len.as("frame_len"),
        when(len === 0, lit(0.0))
          .otherwise(round(byteSum / (lit(255.0) * len), 4))
          .as("frame_brightness"))
    }
    media.select(
      col("doc_id"),
      inline(transform(sequence(lit(0L), fcount - 1), frameOf(_))))
  }

  /** STUB resize — deterministic fake in place of a real image resize:
    * output payload is the input truncated or zero-padded to the target
    * byte budget (w×h bytes, one per pseudo-pixel). A production
    * implementation swaps ONLY this body; the payload→payload binary
    * Dataset transform around it is the real plumbing. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = w * h
    if (bytes.length >= target) bytes.take(target)
    else bytes ++ Array.fill[Byte](target - bytes.length)(0)
  }

  /** Batched resize through the decoder seam: binary in, binary out,
    * partition-local, no shuffle — the payload transform every
    * image-normalization stage of a training-data pipeline needs. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(content = resizeStub(r.content, w, h)))
    }
  }

  /** The same features as pure Column expressions (for oracle checks and
    * for engines where the payload maths is expressible in SQL). Must
    * agree with [[extractFeatures]] — asserted in MultimodalSpec.
    * Brightness folds over the RAW BYTES (hex-pair decode of the binary
    * column), exactly like [[decodeStub]] — not over decoded characters,
    * which would diverge on multi-byte UTF-8. */
  def featuresExpr(media: DataFrame): DataFrame = {
    val hx = hex(col("content"))
    val byteSum = aggregate(
      transform(
        sequence(lit(1), octet_length(col("content")) * 2 - 1, lit(2)),
        i => conv(hx.substr(i, lit(2)), 16, 10).cast("double")),
      lit(0.0), (acc, x) => acc + x)
    media.select(
      col("doc_id"),
      octet_length(col("content")).as("n_bytes"),
      (lit(64) + octet_length(col("content")) % 577).as("width"),
      (lit(64) + (octet_length(col("content")) * 31) % 411).as("height"),
      when(octet_length(col("content")) === 0, lit(0.0))
        .otherwise(round(byteSum / (lit(255.0) * octet_length(col("content"))), 4))
        .as("brightness"))
  }
}
