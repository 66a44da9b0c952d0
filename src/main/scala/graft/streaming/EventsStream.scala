package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY §2.10): the batch
  * queries in [[graft.jobs.EventQueries]] re-expressed as unbounded
  * plans. File-source parquet drives local verification; in production
  * the same plan reads Kafka/object-store streams — only `readStream`
  * options change.
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // parquet TIMESTAMP(NANOS) read as raw nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events parquet DIRECTORY (Spark's file source
    * requires a directory it can watch for new files; schema must be
    * declared). ts arrives as nanos → converted exactly as the batch
    * loader does, but to TimestampType for watermark support. */
  def readEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventSchema)
      .parquet(eventsDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Stage the single-file `events.parquet` of a testdata sf dir into a
    * temp directory so the file stream source can consume it. */
  def stageEventsDir(sfDir: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory("graft_events_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      tmp.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    tmp.toString
  }

  /** Tumbling 1-hour windows with a 2-hour watermark: the streaming twin
    * of q16 (late data beyond the watermark is dropped; state is bounded
    * by watermark horizon × window count — safe at unbounded scale). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessions via session_window — the streaming twin of q15's
    * lag/cumsum formulation (same 30-minute inactivity gap). State per
    * open session only; watermark closes and emits sessions. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Run a streaming frame to completion against the bounded file source
    * and return the materialized result (memory sink, complete/append
    * chosen by the query shape). */
  def runToBatch(streamed: DataFrame, name: String, outputMode: String): DataFrame = {
    val q = streamed.writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .start()
    q.processAllAvailable()
    val out = streamed.sparkSession.table(name)
    q.stop()
    out
  }
}
