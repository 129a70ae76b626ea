package graft

import graft.streaming.EventStream
import org.apache.spark.sql.streaming.OutputMode

/** Testdata-schema canary (round-8 verdict #3). The driver regenerates the
  * parquet testdata between rounds and has already flipped `events.ts`
  * between TIMESTAMP(NANOS) (read as epoch-nanos LongType under
  * `nanosAsLong`) and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
  * TIMESTAMP_NTZ) — a flip that silently broke the streaming family in r7
  * because only the batch path adapted. These tests pin the contract that
  * can never split again: BOTH read paths (`Registry.events` and
  * `EventStream.readEvents`) flow through `Registry.normalizeEventTs`, so
  * on the SAME file — in either encoding — they must yield identical
  * instants, and an unknown third encoding must fail loudly, not miscast.
  */
class EventsSchemaCanarySpec extends SparkSpec {

  private def streamToRows(path: String, name: String): Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val stream = EventStream.readEvents(spark, path)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    EventStream.runToMemory(spark, stream, name, OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  private def batchRows(path: String): Seq[(Long, Long)] = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    Registry.prepareEventConfs(spark)
    Registry.normalizeEventTs(spark.read.parquet(path))
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
  }

  test("batch and streaming reads agree on ts for the CURRENT driver encoding") {
    val dir = java.nio.file.Files.createTempDirectory("events_canary_real")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val batch = batchRows(dir.toString)
    val streamed = streamToRows(dir.toString, "canary_current_encoding")
    assert(batch.nonEmpty && streamed == batch,
      "streaming read path diverged from the batch path on the driver's " +
        "current events encoding — normalizeEventTs is not shared correctly")
  }

  test("a nanos<->micros re-encoding flip cannot split the two read paths") {
    import spark.implicits._
    // instants with a non-zero microsecond component so a wrong unit
    // conversion (the r7 bug: micros div 1000) cannot cancel out
    val micros = Seq(1700000000123456L, 1700003600654321L, 1700007200000001L)
    val rows = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }

    // nanos era: ts surfaces as epoch-nanos LongType (what a
    // TIMESTAMP(NANOS) file looks like under nanosAsLong)
    val nanosDir = java.nio.file.Files.createTempDirectory("events_canary_nanos")
    rows.map { case (id, us) => (id, us * 1000L, id, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$nanosDir/d")

    // micros era: ts written as TIMESTAMP_NTZ → TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) in the footer, the current driver encoding
    val ntzDir = java.nio.file.Files.createTempDirectory("events_canary_ntz")
    rows.map { case (id, us) =>
      (id, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, ((us % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC), id, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$ntzDir/d")

    val expected = rows.sortBy(_._1)
    for ((dir, tag) <- Seq((s"$nanosDir/d", "nanos"), (s"$ntzDir/d", "ntz"))) {
      assert(batchRows(dir) == expected,
        s"batch path mis-read the $tag encoding")
      assert(streamToRows(dir, s"canary_flip_$tag") == expected,
        s"streaming path mis-read the $tag encoding")
    }
  }

  test("NTZ conversion is timezone-independent on a non-UTC session") {
    // the ADVICE r7 scenario: a caller-provided vanilla session with a
    // non-UTC timezone must read the SAME instants — prepareEventConfs
    // pins UTC before the NTZ→timestamp cast, so bucketing/oracle hashes
    // can't shift by the session offset
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    val utc = batchRows(sfDirStaged)
    try {
      spark.conf.set(tzKey, "America/New_York")
      assert(batchRows(sfDirStaged) == utc,
        "events read shifted instants under a non-UTC session timezone")
    } finally spark.conf.set(tzKey, prev)
  }

  private lazy val sfDirStaged: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_canary_tz")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("an unknown third ts encoding fails loudly instead of miscasting") {
    import spark.implicits._
    val bad = Seq((1L, "2024-01-01T00:00:00")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException] { Registry.normalizeEventTs(bad) }
    assert(e.getMessage.contains("StringType"))
  }
}
