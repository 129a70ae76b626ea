package graft

import org.apache.spark.sql.functions._

/** Z-order layout quality: every file a z-ordered write produces must have
  * a bounding box that is small in BOTH clustering dimensions — that is
  * the property min/max stats pruning rests on, and the one a single-key
  * sort cannot give (its files span the full range of the second key).
  */
class LayoutSpec extends SparkSpec {

  test("z-ordered files bound both dimensions; single-key sort does not") {
    val o = Registry.table(spark, sfDir, "orders").select(
      col("o_custkey"),
      datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("long").as("day"))
    val globalCust = o.agg(max("o_custkey") - min("o_custkey"))
      .head().getLong(0).toDouble
    val globalDay = o.agg(max("day") - min("day")).head().getLong(0).toDouble

    def avgSpans(dir: String): (Double, Double) = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      val spans = files.map { f =>
        val d = spark.read.parquet(f.getPath)
          .agg(max("o_custkey") - min("o_custkey"), max("day") - min("day"))
          .head()
        (d.getLong(0).toDouble, d.getLong(1).toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }

    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    ops.LayoutOps.writeZOrdered(o, zDir, 8, col("o_custkey"), col("day"))
    val (zCust, zDay) = avgSpans(zDir)

    val sortDir = java.nio.file.Files.createTempDirectory("sortkey").toString
    o.repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(sortDir)
    val (_, sortDay) = avgSpans(sortDir)

    // z-order: both dims bounded well below the global extent
    assert(zCust / globalCust < 0.6, s"cust span $zCust vs global $globalCust")
    assert(zDay / globalDay < 0.6, s"day span $zDay vs global $globalDay")
    // single-key layout: the second dimension is NOT bounded (≈ full range)
    assert(sortDay / globalDay > 0.9,
      s"single-key layout unexpectedly bounded day: $sortDay vs $globalDay")
  }
}
