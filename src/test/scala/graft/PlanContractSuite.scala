package graft

/** Plan-shape regression gate: the scale-design claims in PLANS.md as
  * executable assertions over the REAL gate queries at sf0.001. A
  * refactor that silently degenerates a bucketed join into a nested
  * loop, loses a rank-limit pushdown, or plans a single-partition sort
  * fails here, not in a bench eyeball.
  *
  * Notes: `SparkEntry.t` round-robin-repartitions the single-row-group
  * testdata tables, so a `RoundRobinPartitioning` exchange is expected
  * in most plans — contracts forbid the *harmful* shapes instead
  * (nested loops, cartesians, single-partition exchanges, sort-merge
  * where a broadcast is the design).
  */
class PlanContractSuite extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** (query, must-contain, must-NOT-contain) over the executed-plan string. */
  private val contracts: Seq[(String, Seq[String], Seq[String])] = Seq(
    ("fuzzy_join_acctbal", Seq("PushedFilters"),
      Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    ("fuzzy_join_ts", Seq.empty,
      Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    ("fuzzy_join_decimal", Seq.empty,
      Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    ("interval_join_orders", Seq.empty,
      Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    ("asof_join_events", Seq("WindowGroupLimit"),
      Seq("BroadcastNestedLoopJoin", "CartesianProduct")),
    ("topk_orders", Seq("TakeOrderedAndProject"), Seq.empty),
    ("sample_capped_source", Seq("WindowGroupLimit"), Seq.empty),
    ("window_top_suppliers", Seq("WindowGroupLimit"), Seq.empty),
    ("mix_sources", Seq("BroadcastHashJoin"),
      Seq("CartesianProduct", "SortMergeJoin")),
    // upsampled copies materialize as Generate in the scan projection;
    // the factor join must broadcast, kept rows never hash-shuffle
    ("mix_temperature", Seq("BroadcastHashJoin", "Generate"),
      Seq("CartesianProduct", "SortMergeJoin", "Exchange hashpartitioning")),
    ("shuffle_corpus", Seq.empty, Seq("Exchange SinglePartition")),
    ("chunk_documents", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning")),
    ("dedup_minhash", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    ("dedup_ngram_jaccard", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    ("decontaminate_docs", Seq("BroadcastExchange"),
      Seq("CartesianProduct")),
    ("heavy_hitters_tokens", Seq("HashAggregate"),
      Seq("CartesianProduct")),
    ("agg_pricing", Seq("HashAggregate"), Seq.empty))

  for ((name, required, forbidden) <- contracts)
    test(s"plan contract: $name") {
      assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      for (r <- required)
        assert(plan.contains(r), s"$name plan lost `$r`:\n$plan")
      for (f <- forbidden)
        assert(!plan.contains(f), s"$name plan degenerated to `$f`:\n$plan")
    }
}
