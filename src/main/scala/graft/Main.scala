package graft

import java.time.Clock

import graft.config.Configs
import graft.jobs.Report1Job
import org.apache.spark.sql.SparkSession

/** CLI entry point — reference `run.py`: config path in, one incremental
  * report run out. `graft.Main <config.yaml> [master]`.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.yaml> [master]")
    val cfg = Configs.load(args(0))
    // reference run.py:28-29 — the config's logging section drives the
    // process's log level/format before any job work starts
    graft.config.LogSetup.configure(cfg.logging)
    val master = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_MASTER", "local[*]")
    val spark = GraftSession
      .builder(master, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      .appName("graft-report1")
      .getOrCreate()
    try {
      val job = new Report1Job(spark, cfg, Clock.systemUTC())
      job.run()
    } finally spark.stop()
  }
}
