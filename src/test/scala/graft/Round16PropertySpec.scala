package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-16 laws: the predicate-derivation optimizer rules
  * (`graft.plans.DerivedPredicates`). The rules are pure plan
  * optimizations, so the governing law is result identity with the rules
  * excluded — checked on the two queries that now rely on them (q4/q7
  * state the naive form and the engine derives the pushed bounds) and on
  * synthetic frames built to sit exactly on the soundness edges the rules
  * must respect: comparison strictness (a non-strict bound through a
  * non-strict comparison must stay non-strict) and null attributes (the
  * derived conjunct may only drop rows the original predicate already
  * dropped).
  */
class Round16PropertySpec extends SparkSpec {

  private val bothRules =
    "graft.plans.DeriveNonEquiJoinBounds,graft.plans.DeriveDisjunctiveDomains"

  /** Runs `q` twice on a fresh session — rules on, rules off — and asserts
    * identical sorted results.
    */
  private def ruleOnOffLaw(q: (SparkSession, String) => DataFrame): Unit = {
    val s = spark.newSession()
    val on = q(s, sfDir).collect().map(_.toString).sorted.toSeq
    s.conf.set("spark.sql.optimizer.excludedRules", bothRules)
    try {
      val off = q(s, sfDir).collect().map(_.toString).sorted.toSeq
      assert(on.nonEmpty && on === off,
        s"derived predicates changed results: on=${on.take(3)} off=${off.take(3)}")
    } finally s.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("q4: derived non-equi bound preserves results (rule-on == rule-off)") {
    ruleOnOffLaw(ops.TpchShapes.q4OrderPriority)
  }

  test("q7: derived disjunctive domains preserve results (rule-on == rule-off)") {
    ruleOnOffLaw(ops.TpchShapes.q7VolumeShipping)
  }

  test("non-equi bound strictness: boundary row survives a non-strict chain") {
    // x >= y ∧ y >= 5 must derive x >= 5 (NOT x > 5): the row x = 5,
    // y = 5 is a legitimate match and the derived scan filter must keep
    // it. A strictness bug here silently loses boundary rows — the law
    // pins the exact edge.
    import spark.implicits._
    val left = Seq((1, 5), (2, 7), (3, 4)).toDF("id", "x")
    val right = Seq((10, 5), (11, 6)).toDF("rid", "y").filter($"y" >= 5)
    val joined = left.join(right, $"x" >= $"y").select("id", "rid")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    // matches: x=5 ⋈ y=5 (the boundary), x=7 ⋈ y∈{5,6}
    assert(joined === Seq((1, 10), (2, 10), (2, 11)),
      s"boundary row lost or extra rows: $joined")
  }

  test("non-equi bound null law: null x rows are dropped by join, not by the rule") {
    // A null x never satisfies x > y, so the derived x > c filter drops
    // only rows the join already dropped — inner-join results identical
    // with and without the rule on a null-bearing frame.
    import spark.implicits._
    val left = Seq(Some(8), None, Some(2)).zipWithIndex
      .map { case (x, i) => (i, x) }.toDF("id", "x")
    val right = Seq((10, 5), (11, 7)).toDF("rid", "y").filter($"y" >= 5)
    def run(s: String): Seq[(Int, Int)] = {
      if (s.nonEmpty) spark.conf.set("spark.sql.optimizer.excludedRules", s)
      try left.join(right, $"x" > $"y").select("id", "rid")
        .collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
      finally if (s.nonEmpty) spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    val on = run("")
    assert(on === Seq((0, 10), (0, 11)), s"unexpected matches: $on")
    assert(on === run(bothRules), "rule changed null-row semantics")
  }

  test("disjunctive domain null law: null attrs fail the Or and the derived In alike") {
    import spark.implicits._
    val df = Seq(
      (0, Some("a"), Some("p")), (1, Some("b"), Some("q")),
      (2, None: Option[String], Some("p")), (3, Some("a"), None: Option[String]),
      (4, Some("c"), Some("p"))).toDF("id", "u", "v")
    def run(excl: String): Seq[Int] = {
      if (excl.nonEmpty) spark.conf.set("spark.sql.optimizer.excludedRules", excl)
      try df.filter(($"u" === "a" && $"v" === "p") || ($"u" === "b" && $"v" === "q"))
        .select("id").collect().map(_.getInt(0)).sorted.toSeq
      finally if (excl.nonEmpty) spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    assert(run("") === Seq(0, 1))
    assert(run("") === run(bothRules), "derived In changed null semantics")
  }

  test("q19: derived range envelope preserves results (rule-on == rule-off)") {
    ruleOnOffLaw(ops.RelationalExtras.disjunctiveJoin)
  }

  test("range envelope strictness: a strict and a non-strict branch at the same bound") {
    // (x > 5 ∧ …) ∨ (x >= 5 ∧ …): the envelope must be x >= 5 — taking
    // the strict bound would wrongly drop the second branch's x = 5 rows.
    import spark.implicits._
    val df = Seq((0, 5, "a"), (1, 5, "b"), (2, 6, "a"), (3, 4, "a")).toDF("id", "x", "t")
    def run(excl: String): Seq[Int] = {
      if (excl.nonEmpty) spark.conf.set("spark.sql.optimizer.excludedRules", excl)
      try df.filter(($"x" > 5 && $"t" === "a") || ($"x" >= 5 && $"t" === "b"))
        .select("id").collect().map(_.getInt(0)).sorted.toSeq
      finally if (excl.nonEmpty) spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    assert(run("") === Seq(1, 2), s"strictness bug dropped a boundary row: ${run("")}")
    assert(run("") === run(bothRules))
  }

  test("range envelope: one-sided branches derive only the shared side") {
    // (x > 10) ∨ (x = 3 ∧ t='b'): every branch bounds x below (3 via the
    // equality), no branch bounds it above in common — envelope is x >= 3
    // only, and the x = 3 row must survive.
    import spark.implicits._
    val df = Seq((0, 11, "a"), (1, 3, "b"), (2, 3, "a"), (3, 2, "b")).toDF("id", "x", "t")
    val got = df.filter(($"x" > 10) || ($"x" === 3 && $"t" === "b"))
      .select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(got === Seq(0, 1), s"envelope over- or under-derived: $got")
  }

  test("disjunctive domains derive nothing when a branch leaves the attribute free") {
    // (u='a') ∨ (v='q'): neither attribute is pinned in EVERY branch, so
    // no domain exists — the rule must not invent one (it would wrongly
    // drop id=4's (c,q) row).
    import spark.implicits._
    val df = Seq((0, "a", "p"), (4, "c", "q")).toDF("id", "u", "v")
    val got = df.filter(($"u" === "a") || ($"v" === "q"))
      .select("id").collect().map(_.getInt(0)).sorted.toSeq
    assert(got === Seq(0, 4), s"rule over-derived a domain: $got")
  }
}
