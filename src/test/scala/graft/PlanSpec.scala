package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: the scale properties the engine claims
  * (predicate pushdown, column pruning, broadcast joins, whole-stage
  * codegen, top-k without full sort) hold in the actual plans.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    // AQE wraps the plan and hides codegen spans until execution; turn
    // it off for static plan assertions (it stays on in production)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries(q)(spark, sf)
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q06: all three predicates push down to the parquet scan") {
    val p = planOf("q06_filter_pushdown_revenue")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("GreaterThanOrEqual(l_discount"))
    // column pruning: scan reads only the needed columns
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("q01: aggregation runs inside whole-stage codegen with partial agg") {
    val p = planOf("q01_agg_pricing")
    assert(p.contains("[codegen id :"))  // stages run inside WholeStageCodegen
    assert(p.contains("HashAggregate"))
    // two-phase: partial (map-side) then final after one exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q02: the dimension side broadcasts") {
    val p = planOf("q02_join_brand_revenue")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
  }

  test("q09: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = planOf("q09_top_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q19: as-of join plans as window over union — no nested-loop join") {
    val p = planOf("q19_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("Window"))
  }

  test("q26: sketch agg has no Expand and no exact distinct (round-2 fix)") {
    val p = planOf("q26_approx_sketches")
    // mixing countDistinct into the sketch agg forced Expand×3 + sort
    // fallback (52 s); sketches alone are one two-phase object agg
    assert(!p.contains("Expand"))
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"))
  }

  test("q32: minhash signatures are one bit-parallel agg, no x16 explode") {
    val p = planOf("q32_dedup_minhash_lsh")
    // one Generate for the shingle explode is expected; the per-function
    // explode(sequence(0, 15)) (shuffle = shingles×16 rows) must be gone
    assert(!p.contains("sequence(0, 15"))
    // the 16 permutations are min-aggregate columns in a hash agg
    assert(p.contains("min(") && p.contains("HashAggregate"))
  }

  test("q31: shingle postings are DF-capped before the pair self-join") {
    val p = planOf("q31_dedup_ngram_jaccard")
    // the hot-shingle guard is an anti-join against the over-cap set —
    // without it one boilerplate shingle in k docs makes k² join rows
    assert(p.contains("LeftAnti"))
  }

  test("q41/q43/q44/q34: pairing is equi-join only — no cross product anywhere") {
    for (q <- Seq("q41_ann_lsh_bucket", "q43_ann_ivf", "q44_ann_ivf_multiprobe",
        "q34_dedup_embedding_cosine")) {
      val p = planOf(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q plans a cross product")
      // codebook/norm lookups broadcast; pairing shuffles only on keys
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast joins")
    }
  }

  test("q55: PII scan is one pass — single scan, two-phase agg, tiny shuffle") {
    val p = planOf("q55_pii_scan")
    // formatted explain prints each node twice (tree + detail): one scan
    // node ⇒ exactly 2 mentions; a double-scan plan would show 4
    assert("Scan parquet".r.findAllIn(p).size <= 2, "documents scanned more than once")
    assert("HashAggregate".r.findAllIn(p).size >= 2)  // partial + final
    assert(p.contains("codegen id"))
  }
}
