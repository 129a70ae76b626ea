package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — ScalaTest
  * suites run sequentially in the forked test JVM, and getOrCreate reuses it).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    // same extension posture as GraftSession: plan-quality tests must see
    // the engine's own optimizer rules (derived predicates, as-of pushdown)
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  /** sf0.001 testdata dir (driver-generated; TESTDATA.md). */
  val sfDir = "/root/testdata/sf0.001"
}
