package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Codegen-vs-interpreted parity for `vec_dot_long` (LongArrayDot) — the
  * ONE graft expression that carries both a hand-written `doGenCode` and a
  * separate `nullSafeEval` path. Every other custom expression here is
  * CodegenFallback (a single eval implementation, so divergence is
  * impossible by construction); LongArrayDot's two implementations can
  * drift independently, which is the classic custom-expression bug class.
  * This pins them to each other on the edge inputs: null arrays on either
  * side, empty arrays, length mismatch (min-length contract), and Long
  * overflow (both paths must wrap identically — two's-complement, no
  * Math.addExact anywhere).
  *
  * The interpreted side forces `spark.sql.codegen.factoryMode=NO_CODEGEN`
  * and disables whole-stage codegen, so the projection evaluates
  * `nullSafeEval`; the default side keeps codegen on. DeterminismSpec /
  * JoinStrategySpec perturb shuffles and join strategies; this perturbs
  * the expression compiler itself.
  */
class CodegenParitySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("a", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("b", ArrayType(LongType, containsNull = false), nullable = true)))

  private val rows = Seq(
    Row(0, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),              // plain: 32
    Row(1, Seq.empty[Long], Seq(7L, 8L)),                   // empty left: 0
    Row(2, Seq(1L, 2L, 3L, 4L), Seq(10L, 20L)),             // mismatch: min-length
    Row(3, null, Seq(1L)),                                  // null left → null
    Row(4, Seq(1L), null),                                  // null right → null
    Row(5, null, null),                                     // both null → null
    Row(6, Seq(Long.MaxValue, Long.MaxValue), Seq(2L, 2L)), // overflow wraps
    Row(7, Seq(-3L, 5L), Seq(7L, -11L)))                    // negatives: -76

  private def canon(rs: Array[Row]): Seq[(Int, Any)] =
    rs.map(r => (r.getInt(0), r.get(1))).toSeq.sortBy(_._1)

  test("vec_dot_long: interpreted eval equals generated code on edge inputs") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    functions.VectorFunctions.register(spark)
    def run(): Seq[(Int, Any)] =
      canon(df.selectExpr("id", "vec_dot_long(a, b) AS d").collect())

    val keys = Seq(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    val generated = run()
    val interpreted =
      try { keys.foreach { case (k, v) => spark.conf.set(k, v) }; run() }
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }

    assert(generated == interpreted,
      s"codegen and interpreted paths diverged: $generated vs $interpreted")
    // and both match the independently-computed expectation
    val expected = Seq[(Int, Any)](
      0 -> 32L, 1 -> 0L, 2 -> 50L, 3 -> null, 4 -> null, 5 -> null,
      6 -> (Long.MaxValue * 2L + Long.MaxValue * 2L), 7 -> -76L)
    assert(generated == expected, s"values wrong: $generated")
  }
}
