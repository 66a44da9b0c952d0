package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.EventQueries
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite with SparkSpec {

  private lazy val eventsDir = EventsStream.stageEventsDir(sf0001)

  test("streaming tumbling windows equal the batch q16 result") {
    import spark.implicits._
    val streamed = EventsStream.runToBatch(
      EventsStream.tumblingCounts(EventsStream.readEvents(spark, eventsDir)),
      "tumbling_test", "complete")
      .select($"window_start".cast("timestamp_ntz").as("window_start"),
        $"event_type", $"n_events", $"sum_value")
    val batch = EventQueries.q16TumblingWindow(spark, sf0001)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming session counts match the batch q15 sessionization") {
    import spark.implicits._
    val streamed = EventsStream.runToBatch(
      EventsStream.sessionCounts(EventsStream.readEvents(spark, eventsDir)),
      "sessions_test", "complete")
      .select($"session_start".cast("timestamp_ntz").as("session_start"),
        $"user_id", $"n_events", $"sum_value")
    val batch = EventQueries.q15Sessionize(spark, sf0001)
      .select($"session_start", $"user_id", $"n_events", $"sum_value")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
