package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: the Spark plan plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  *
  * @param headline include in Bench's timed set (heavy exploratory queries
  *                 can opt out; correctness still checks them via Verify).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = true)

/** Central query registry. Each operator module under `graft.ops` contributes
  * a map of named queries; SparkEntry/Verify/Bench all read from here.
  */
object Registry {
  lazy val all: Map[String, QueryDef] = Seq(
    ops.EventBars.queries,
    ops.CoreRelational.queries,
    ops.EventOps.queries,
    ops.TextOps.queries,
    ops.Dedup.queries,
    ops.Similarity.queries,
    ops.Multimodal.queries,
    ops.StatsOps.queries,
    ops.ScalePatterns.queries,
    ops.CollectionOps.queries,
    ops.Curation.queries,
    ops.DedupClusters.queries,
    ops.SamplingOps.queries,
    ops.RelationalExtras.queries,
    ops.TpchShapes.queries,
    ops.ChunkingOps.queries,
    ops.PipelineOps.queries,
    ops.QualityOps.queries,
    ops.SearchOps.queries,
    ops.LayoutOps.queries,
    ops.TimeSeriesOps.queries,
    ops.PartSuppOps.queries,
    ops.CurriculumOps.queries,
    ops.GraphOps.queries
  ).reduce(_ ++ _)

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with `ts` normalized to TimestampType (microseconds).
    *
    * The driver's parquet has stored `ts` two ways across rounds, so the
    * conversion is schema-adaptive:
    *  - TIMESTAMP(NANOS), which Spark 4 rejects by default
    *    (PARQUET_TYPE_ILLEGAL); with `nanosAsLong` it surfaces as a LongType
    *    of epoch-nanos, converted via `timestamp_micros`. Integer `div`, NOT
    *    `/`: double division at epoch-nano magnitude (~1.7e18 > 2^53) is off
    *    by 1ns-truncation for ~1.6% of values. The data carries no
    *    sub-microsecond component (ns % 1000 == 0), so this is lossless.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    *    TIMESTAMP_NTZ; cast to TimestampType (session tz pinned to UTC in
    *    GraftSession, so the wall-clock instant is unchanged) to keep every
    *    downstream plan and oracle identical to the nanos-era behavior.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
