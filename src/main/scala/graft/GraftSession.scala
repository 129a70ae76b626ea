package graft

import org.apache.spark.sql.SparkSession

/** The engine's session posture in ONE place (SURVEY.md §7.4.7): AQE on,
  * UTC, shuffle parallelism sized to the machine (never the 200-partition
  * default), dynamic partition overwrite for idempotent partitioned loads,
  * and the graft Catalyst extensions (functions + as-of strategy + pushdown
  * rule) registered at build time. `Verify`/`Bench`/`Main` and library
  * users all start here, so a tuning change lands everywhere at once.
  *
  * Note the queries themselves never *require* this posture: each one
  * registers the functions it needs idempotently, so they also run on a
  * caller-provided vanilla session (the driver's smoke test does exactly
  * that).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
}
