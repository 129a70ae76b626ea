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
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // BloomFilterAggregate (surfaced as `bloom_agg`, and the sketch the
      // InjectRuntimeFilter rule plants) silently clamps its numItems/numBits
      // args to these confs via Math.min — the defaults (4M items / 64M bits)
      // cut an explicitly-sized 8-bits/key sketch to ~2 bits/key at the 30M-key
      // sf100 shape (~35-40% FPP instead of 2%). Raise the ceilings to the
      // 32 MB broadcastable cap ScalePatterns.bloomPrunedJoin sizes against;
      // queries still pass exact sizes, these only stop the silent truncation.
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        (32L << 20).toString)
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        (256L << 20).toString)
      // Static conf, so it must be set at session build. The default (100)
      // thrashes on a ~200-query suite: the warmup pass alone cycles more
      // codegen classes than the cache holds, so every timed query
      // recompiles its whole-stage code — a fixed ~0.3s/query inflation
      // that grows with suite size (the r5→r6 mid-pack slowdown). Sized so
      // one full suite's classes stay resident.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
    // Single-JVM local mode shares RPC dispatcher threads with the 32
    // executor threads: under full CPU saturation on a 1000×-scale
    // corpus the 10 s default heartbeat can time out 60 consecutive
    // times, the executor exits, and the context dies mid-suite (the
    // r16 sf100 re-measure hit exactly this). Heartbeats between a
    // driver and an executor in the SAME process carry no liveness
    // signal worth killing the JVM over — make them patient. Gated on
    // local masters: on a real cluster a 20-minute network timeout would
    // delay dead-executor detection, and the defaults are right there.
    if (master.startsWith("local"))
      b.config("spark.executor.heartbeatInterval", "60s")
        .config("spark.network.timeout", "1200s")
    else b
  }
}
