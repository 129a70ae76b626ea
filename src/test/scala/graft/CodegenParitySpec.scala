package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Codegen-vs-interpreted parity for the graft expressions that carry both
  * a hand-written codegen path and a separate `nullSafeEval` path:
  * `vec_dot_long` (LongArrayDot) and `md5_prefix60`/`md5_prefix48`
  * (Md5Prefix). Every other custom expression here is CodegenFallback (a
  * single eval implementation, so divergence is impossible by
  * construction); a two-path expression's implementations can drift
  * independently, which is the classic custom-expression bug class.
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

  /** Md5Prefix (r14 optimization) is the second two-path expression: a
    * static-helper `defineCodeGen` plus `nullSafeEval`. Its contract is
    * bit-identity with the built-in chain it replaced —
    * `conv(substring(md5(CAST(x AS STRING)), 1, nHex), 16, 10) CAST LONG`,
    * the cross-engine hash every sampling/dedup oracle keys on — so this
    * pins all three implementations (codegen, interpreted, built-in chain)
    * to each other over longs, text, unicode, the empty string and null,
    * for both deployed widths (15 and 12 hex digits).
    */
  test("md5_prefix: codegen == interpreted == conv(substring(md5)) chain") {
    val data = Seq(
      Row(0, "0"), Row(1, "1"), Row(2, "4999"), Row(3, "-17"),
      Row(4, ""), Row(5, "hello world"), Row(6, "héllо wörld ☃"),
      Row(7, null), Row(8, "a" * 1000), Row(9, Long.MaxValue.toString))
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
    functions.VectorFunctions.register(spark)

    def run(): Seq[(Int, Any, Any, Any, Any)] =
      df.selectExpr(
          "id",
          "md5_prefix60(s) AS f60",
          "CAST(conv(substring(md5(CAST(s AS STRING)), 1, 15), 16, 10) AS BIGINT) AS c60",
          "md5_prefix48(s) AS f48",
          "CAST(conv(substring(md5(CAST(s AS STRING)), 1, 12), 16, 10) AS BIGINT) AS c48")
        .collect().map(r => (r.getInt(0), r.get(1), r.get(2), r.get(3), r.get(4)))
        .toSeq.sortBy(_._1)

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
    generated.foreach { case (id, f60, c60, f48, c48) =>
      assert(f60 == c60, s"row $id: md5_prefix60 $f60 != conv chain $c60")
      assert(f48 == c48, s"row $id: md5_prefix48 $f48 != conv chain $c48")
    }
    // non-null rows produce non-negative values strictly under 2^60 / 2^48
    generated.filter(_._2 != null).foreach { case (id, f60, _, f48, _) =>
      val v60 = f60.asInstanceOf[Long]; val v48 = f48.asInstanceOf[Long]
      assert(v60 >= 0L && v60 < (1L << 60), s"row $id: f60 out of range $v60")
      assert(v48 >= 0L && v48 < (1L << 48), s"row $id: f48 out of range $v48")
    }
  }
}
