package graft

import graft.streaming.{EventStream, StreamEvent}
import org.apache.spark.sql.functions._

/** Stream/batch parity: the streaming operators must produce exactly the
  * batch results (which are themselves DuckDB-oracle-checked) on the bounded
  * sf0.001 events table.
  */
class StreamingSpec extends SparkSpec {

  // the file stream source wants a *directory* to watch — stage the bounded
  // events table into one (prod points this at the landing dir)
  private lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling daily agg equals the batch (oracle-checked) result") {
    val stream = EventStream.readEvents(spark, eventsPath)
    val got = EventStream.runToMemory(spark,
        EventStream.tumblingDaily(stream), "stream_tumbling")
      .orderBy("day", "event_type").collect().map(_.toSeq).toSeq
    val expected = ops.EventOps.tumblingDaily(spark, sfDir)
      .select("day", "event_type", "n_events", "sum_value")
      .orderBy("day", "event_type").collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("watermark drops late data beyond the delay in update mode") {
    // structural check: the plan carries the 30-minute watermark
    val agg = EventStream.tumblingDaily(EventStream.readEvents(spark, eventsPath))
    assert(agg.queryExecution.analyzed.toString.contains("30 minutes"))
  }

  test("stateful flatMapGroupsWithState sessionization equals batch session_window") {
    import spark.implicits._
    val stream = EventStream.readEvents(spark, eventsPath)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamEvent]
    val sessions = EventStream.sessionize(stream).toDF()
    val got = EventStream.runToMemory(spark, sessions, "stream_sessions",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .orderBy("user_id", "session_start_epoch")
      .collect().map(_.toSeq).toSeq
    // batch twin (oracle-checked), values re-expressed in exact cents
    val expected = ops.EventOps.sessionize(spark, sfDir)
      .select(col("user_id"), col("session_start_epoch"), col("n_events"),
        round(col("sum_value") * 100).cast("long").as("sum_value_cents"))
      .orderBy("user_id", "session_start_epoch")
      .collect().map(_.toSeq).toSeq
    assert(got.size == expected.size)
    assert(got == expected)
  }
}
