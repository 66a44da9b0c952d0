package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed in partition-local batches.
  *
  * The Spark-side shape is real and tested — schema, encoders, batch
  * iteration, partitioning — while the actual codec call is STUBBED with
  * a deterministic fake (image/audio libraries are not available in this
  * environment). Swap [[Multimodal.decodeStub]] for a real decoder (JNI /
  * process-per-partition) without touching the plan shape.
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
