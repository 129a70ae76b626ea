package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the at-scale answer to
  * repeated large joins on the same key (SURVEY.md §7.4.7 posture). Writing
  * both sides bucketed by the join key lets the join run with ZERO
  * exchanges; this spec pins that plan shape.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs without a shuffle") {
    // warehouse.dir is static config -> use the default ./spark-warehouse
    // (gitignored) with throwaway table names
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    s.sql("DROP TABLE IF EXISTS orders_b")
    s.sql("DROP TABLE IF EXISTS lineitem_b")

    Registry.table(s, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Registry.table(s, sfDir, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = s.table("lineitem_b")
      .join(s.table("orders_b"), "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val joinSection = plan.split("HashAggregate").last // below the agg
    assert(joinSection.contains("SortMergeJoin") ||
      joinSection.contains("ShuffledHashJoin"))
    // the join itself must consume the bucketed layout directly: no
    // exchange between the join and the scans
    val betweenJoinAndScan = plan
      .substring(plan.indexOf("Join"))
    assert(!betweenJoinAndScan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles on the key:\n${plan.take(3000)}")

    // correctness unchanged vs the plain (shuffling) join
    val plain = Registry.table(s, sfDir, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .join(Registry.table(s, sfDir, "orders"), "o_orderkey")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq ==
      plain.orderBy("o_orderpriority").collect().map(_.toSeq).toSeq)
    s.sql("DROP TABLE IF EXISTS orders_b")
    s.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("json and orc round-trips preserve schema and rows") {
    val tmp = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = Registry.table(spark, sfDir, "nation")
    src.write.mode("overwrite").json(s"$tmp/nation_json")
    src.write.mode("overwrite").orc(s"$tmp/nation_orc")
    val viaJson = spark.read.schema(src.schema).json(s"$tmp/nation_json")
    val viaOrc = spark.read.orc(s"$tmp/nation_orc")
    val want = src.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(viaJson.orderBy("n_nationkey").collect().map(_.toSeq).toSeq == want)
    assert(viaOrc.orderBy("n_nationkey").collect().map(_.toSeq).toSeq == want)
    assert(viaOrc.schema == src.schema)
  }
}
