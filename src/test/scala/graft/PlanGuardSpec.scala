package graft

import graft.SparkSpec

/** Scale guard over the whole driver-query surface: no query may plan a
  * CartesianProduct or BroadcastNestedLoopJoin — the two operators whose
  * cost explodes quadratically at cluster scale — except the documented
  * single-row/broadcast-bounded cases. Catches a scale-killer the moment a
  * refactor (or a Spark upgrade changing join selection) introduces one,
  * without waiting for a bench regression.
  */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose nested-loop piece is bounded by construction — every
    * entry must name the bound. */
  private val allowed: Map[String, String] = Map(
    // three single-row aggregate legs combined into one KPI row
    "q6_daily_kpis" -> "1x1 crossJoin of single-row aggregates",
    // near/far gate statistics: two single-row aggregates combined
    "q23_simhash" -> "1x1 crossJoin of single-row aggregates",
    // exact-ANN baseline: the q<<n query side is broadcast by design
    "q25_ann_cosine_topk" -> "broadcast query-side crossJoin, O(n*q)",
    // binary-ANN Hamming scan: same broadcast query-side shape as q25,
    // but over 1-bit codes (the 32x-cheaper coarse tier); the rerank join
    // is an equi-join on candidate ids
    "q71_binary_ann" -> "broadcast query-side Hamming scan, O(n*q) on packed bits",
    // ADC scoring joins each code row to the broadcast O(m*k) codebook
    "q58_pq_adc" -> "broadcast sub-codebook crossJoin, O(rows)",
    // vocabulary size joins in as a broadcast single-row aggregate
    "q64_perplexity" -> "1-row broadcast vocab crossJoin, O(rows)",
    // same LM machinery as q64 (the vocab-size single row), tier window on top
    "q102_perplexity_tiers" -> "1-row broadcast vocab crossJoin, O(rows)",
    // hard negatives: q25's broadcast query-side shape with the label
    // disjointness fused into the join predicate (non-equi by nature)
    "q78_hard_negatives" -> "broadcast query-side label-disjoint scan, O(n*q)")
  // q104_hybrid_rrf is deliberately NOT allowed here (round 10): its dense
  // leg moved from the exact-cosine crossJoin to the q39 trained-codebook
  // IVF tier — a broadcast EQUI-join on the probed cell — and its BM25 leg
  // broadcasts query terms into the postings, so a refactor reintroducing
  // either nested-loop scan fails this guard.
  // q84_margin_mining is deliberately NOT allowed here: its candidate join
  // is a broadcast EQUI-join on the sign-bit cell (the pruned LASER shape),
  // so a refactor reintroducing the all-candidates nested-loop scan fails
  // this guard.

  test("no unbounded CartesianProduct / BroadcastNestedLoopJoin in any driver query") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      // planning only — building the frame runs any setup side effects at
      // sf0.001, which is what keeps this spec honest end-to-end
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val loops = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
      if (loops.isEmpty || allowed.contains(name)) None
      else Some(s"$name -> ${loops.mkString(",")}")
    }
    withClue(s"scale-killer join operators in: ${offenders.mkString("; ")}\n") {
      offenders shouldBe empty
    }
  }
}
