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
    // BPE chunking keeps chunk_documents' zero-shuffle scan shape —
    // tokens, chunk ids and slices are all projections
    ("chunk_documents_bpe", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning")),
    // sentence chunking: extraction/prefix-sums/assembly are all array
    // HOFs in the scan projection — no shuffle (overlap included)
    ("chunk_documents_sentences", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning")),
    ("chunk_documents_sentences_overlap", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning")),
    // subword token counting is one scan projection: no join with a
    // merge table, no data-movement shuffle (round-robin from
    // SparkEntry.t excepted, as everywhere)
    ("tokenize_bpe", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "BroadcastExchange", "Join")),
    // unigram Viterbi segmentation is likewise one scan projection:
    // the vocabulary rides as a plan reference, never a join
    ("tokenize_unigram", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "BroadcastExchange", "Join")),
    // the ingest gate is a STATELESS scan projection + filter: the
    // whole eval side rides as plan references (bloom + sorted set),
    // so a join / aggregate / shuffle means the shape regressed to a
    // plan that couldn't serve a stream without state
    ("stream_decontaminate", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "BroadcastExchange", "Join",
        "HashAggregate")),
    // gate -> chunk (whitespace and BPE): still pure scan-side plans
    ("stream_ingest_pipeline", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    ("stream_ingest_pipeline_bpe", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    // the semantic IVF gate necessarily joins the index cells, but a
    // `Window [` operator would mean the stream-safe in-row cell
    // choice regressed to probeCells' stateful window
    ("stream_embedding_dedup", Seq.empty,
      Seq("Window [", "Exchange SinglePartition", "CartesianProduct")),
    // LM quality gate: one in-row kernel call — the model is a plan
    // reference, so any join/agg means scoring regressed to the
    // count-table joins of the batch path (stateful on a stream)
    ("stream_lm_gate", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    // order-3 gate: same stateless contract — the trigram model rides
    // as plan references into ONE in-row kernel call
    ("stream_lm_gate3", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    // HTML extraction is eight codegen'd regexp passes in ONE scan
    // projection: any exchange or join means it left the scan
    ("extract_html", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "BroadcastExchange", "Join",
        "HashAggregate")),
    // NB classifier gate: same stateless serving contract as the LM
    // gates — the pruned model rides as plan references into one
    // in-row kernel call
    ("stream_nb_gate", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    // multiclass language gate: same stateless serving contract
    ("stream_lang_gate", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    // the selection pipeline ends in a top-k heap, and neither the
    // gate, the profile broadcasts, nor the score join may degenerate
    // to an unblocked quadratic
    ("pipeline_dsir_select", Seq("TakeOrderedAndProject"),
      Seq("CartesianProduct", "SortMergeJoin", "ShuffledHashJoin")),
    // SemDeDup: the pair search must stay blocked by the cluster-id
    // equi-join (the method's whole point) — a cartesian or nested
    // loop means the blocking degenerated to all-pairs
    ("semdedup_embeddings", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // DSIR scoring: the two ≤4096-row profiles must BROADCAST onto the
    // exploded gram stream (a sort-merge or shuffled join there would
    // shuffle the corpus-sized gram relation by bucket — the hot keys
    // are Zipfian, so that shape is a skew bomb at scale); the one-row
    // totals ride as broadcast cross joins
    ("dsir_score", Seq("BroadcastHashJoin"),
      Seq("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct")),
    // resampling adds deterministic Gumbel keys and must plan the
    // global top-k as a heap, never a full sort of the scored corpus
    ("dsir_resample", Seq("TakeOrderedAndProject", "BroadcastHashJoin"),
      Seq("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct")),
    // the DSIR gate is a stateless scan projection: the dense ratio
    // array rides as a literal into one in-row aggregate, so any
    // join/agg/exchange means serving regressed to the batch scorer
    ("stream_dsir_gate", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    // the per-group gate keeps the same stateless shape: the
    // group→array MAP rides as one literal, the lookup is element_at
    // in the row — a join/agg means the map serving regressed to the
    // grouped batch scorer
    ("stream_dsir_gate_by_lang", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    // grouped scoring: the per-group profiles broadcast onto the gram
    // stream exactly like the ungrouped scorer (joined on (grp,
    // bucket)); a sort-merge/shuffled join there shuffles the
    // corpus-sized gram relation by Zipfian keys
    ("dsir_score_by_lang", Seq("BroadcastHashJoin"),
      Seq("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // stratified resampling: the per-group top-k must plan as
    // WindowGroupLimit group heaps, never a global sort of the scored
    // corpus (no TakeOrderedAndProject here — the limit is per group)
    ("dsir_resample_by_lang", Seq("WindowGroupLimit", "BroadcastHashJoin"),
      Seq("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
        "Exchange SinglePartition")),
    // the whole web-ingest path (extract -> scrub -> NB gate -> chunk)
    // is scan projections + one in-row kernel: ANY exchange or join
    // means a stage regressed out of the stateless stream-safe shape
    ("pipeline_web_ingest", Seq.empty,
      Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
        "Exchange SinglePartition", "Join", "HashAggregate")),
    // trained language ID: hash-keyed aggregates + model equi-join,
    // never a nested loop
    ("lang_id_nb", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // crawl dedup keeps the rank-limit pushdown on the keep-first rule
    ("dedup_by_url", Seq("WindowGroupLimit"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // snapshot diff: one equi-join of two slim (id, hash) projections —
    // a nested-loop/cartesian means the fingerprint equi-key was lost
    ("corpus_diff", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // top-fraction keeps the rank-limitable tie window and must never
    // collapse the per-group threshold walk into a single partition
    ("sample_top_fraction", Seq.empty,
      Seq("Exchange SinglePartition", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    ("dedup_minhash", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // the perceptual pair joins must stay equi-joins on the distinct-
    // signature pigeonhole keys (a cartesian means the chunk keys or
    // the expansion equi-keys were lost)
    ("multimodal_image_dedup_phash", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    ("multimodal_video_dedup", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // shift-robust audio dedup: the subfingerprint kernel runs as a
    // native expression in the scan projection (no object fences), and
    // candidates meet ONLY on the fingerprint equi-join
    ("multimodal_audio_dedup_shift", Seq("graft_audiosubfp"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "SerializeFromObject", "MapPartitions")),
    // scene segmentation: pHash in the scan projection, one
    // video-keyed window, partial-agg rollup — no joins at all
    ("multimodal_video_scenes", Seq("graft_phash64"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "SerializeFromObject", "MapPartitions")),
    // scene near-dup keeps the pigeonhole equi-keys over keyframes
    ("multimodal_video_scene_dedup", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // score calibration: one source-keyed rank window — never a
    // single-partition funnel of the corpus
    ("normalize_scores_by_source", Seq.empty,
      Seq("Exchange SinglePartition", "CartesianProduct",
        "BroadcastNestedLoopJoin")),
    // outlier monitor: ONE group agg, the one-row-per-group centroid
    // table comes back on a BROADCAST equi-join, the exact cosine is
    // the per-row codegen kernel — never a shuffled join of the data
    // against itself
    ("embedding_outliers", Seq("graft_grid_cos", "BroadcastExchange"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "SortMergeJoin", "ShuffledHashJoin")),
    ("stream_embedding_outliers", Seq("graft_grid_cos", "BroadcastExchange"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "SortMergeJoin", "ShuffledHashJoin")),
    // line-template boilerplate: detection is two partial-aggregable
    // equi-keyed aggs; application joins the one-row-per-group template
    // array back on the group equi-key — never a nested loop
    ("strip_source_boilerplate_lines", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "Exchange SinglePartition")),
    // the windowed drift monitor is ONE stateful-aggregation shape:
    // a single window agg, no per-event UDF fences, no single-partition
    // funnel, cosine evaluated post-aggregation per window row
    ("stream_embedding_drift", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "Exchange SinglePartition")),
    // boilerplate stripping is two (agg + equi-join + projection)
    // rounds — the per-group LCP row must come back on an equi-key
    ("strip_source_boilerplate", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "Exchange SinglePartition")),
    ("dedup_cross_corpus_lsh", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // suffix-span seeds are in-row codegen builtins (no UDF, no
    // object serialization) and the seed join is the gram-hash
    // equi-join, never a cartesian
    ("dedup_suffix_spans", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "BatchEvalPython", "SerializeFromObject")),
    ("dedup_suffix_spans_self", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "BatchEvalPython", "SerializeFromObject")),
    // the remover rejoins the slim cut lists to the corpus on the id —
    // an equi-join — and the text surgery is one in-row fold
    ("dedup_strip_spans", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "BatchEvalPython", "SerializeFromObject")),
    ("dedup_ngram_jaccard", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    ("decontaminate_docs", Seq("BroadcastExchange"),
      Seq("CartesianProduct")),
    // A-ES weighted sampling rides the same rank-limit pushdown as the
    // uniform cap: each partition prunes to its local top-n pre-shuffle
    ("sample_weighted", Seq("WindowGroupLimit"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // hybrid retrieval: the dense side is per-partition top-k heaps
    // (TakeOrderedAndProject), never a global sort of the corpus; the
    // two rank windows run over <= fetchK rows by construction, so
    // their single-partition exchanges are bounded and allowed, and so
    // is BM25's deliberate one-row corpus-stats crossJoin (the only
    // nested-loop in the plan — a CartesianProduct of DATA is still
    // forbidden)
    ("hybrid_search_rrf", Seq("TakeOrderedAndProject"),
      Seq("CartesianProduct")),
    // index-served hybrid retrieval: the dense leg must resolve from
    // the IVF×PQ index artifact (cells/codes + vectors side-file),
    // NEVER a scan of the embedding table — the whole point of the
    // serving form (the centroid/stats broadcasts are tiny model
    // relations, so nested-loop-of-data stays forbidden)
    ("hybrid_search_rrf_indexed", Seq.empty,
      Seq("embeddings.parquet", "CartesianProduct")),
    // FULLY index-served hybrid: NEITHER corpus table may appear in
    // the query plan — the lexical leg reads BM25 posting buckets, the
    // dense leg IVF×PQ cells + the vectors side-file, nothing else
    ("hybrid_search_rrf_both_indexed", Seq.empty,
      Seq("documents.parquet", "embeddings.parquet", "CartesianProduct")),
    // stateless hybrid decontamination gate: candidate generation is
    // equi-joins only (prefix postings on term, termset card on
    // eval_id, IVF cells on the probed cell) — never an all-pairs plan
    ("stream_hybrid_decontaminate", Seq.empty,
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // phrase retrieval: postings restrict to the phrase terms via a
    // broadcast equi-join before any shuffle; top-k is per-partition
    // heaps, never a global sort
    ("phrase_search", Seq("TakeOrderedAndProject"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // the index probe must read posting buckets (pushed term filter),
    // never rescan the corpus text
    ("phrase_search_indexed", Seq("TakeOrderedAndProject"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin",
        "documents.parquet")),
    // group-score propagation: one partial aggregate over |groups|
    // rows joined back on the group key — never a nested loop
    ("filter_by_source_quality", Seq("HashAggregate"),
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")),
    // batched BM25: per-query top-k must ride the rank-limit pushdown;
    // the 1-row stats crossJoin is the only permitted nested loop
    ("bm25_search_batch", Seq("WindowGroupLimit"),
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

  test("plan contract: a pinned serve plans exactly like the pre-append serve") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("graft_pin_plan").toString
    graft.operators.Search.buildBm25Index(
      d.filter(col("doc_id") % 3 =!= 2), "doc_id", "text", idx)
    val v = graft.sources.IndexIO.currentVersionId(spark, idx)
    def planOf(path: String): String = graft.operators.Search
      .bm25SearchIndex(spark, path, Seq("vector", "stream"), k = 10)
      .queryExecution.executedPlan.toString
    // operator-name skeleton: tree glyphs, plan ids, partition counts,
    // and version-dir paths all stripped — only the op sequence remains
    def shape(p: String) = p.linesIterator
      .map(_.replaceAll("^[^A-Za-z]+", "").takeWhile(_.isLetter))
      .filter(_.nonEmpty).mkString("\n")
    // capture the pre-append plan NOW (the "training run at launch") …
    val preAppend = shape(planOf(idx))
    graft.operators.Search.appendToBm25Index(
      d.filter(col("doc_id") % 3 === 2), "doc_id", "text", idx)
    // … the audit's pinned serve after the append must plan exactly
    // like it: time travel is a resolve-time choice, not an operator —
    // no union growth, no extra exchanges, same join/top-k shape (the
    // 1-row stats crossJoin is the only nested loop, as everywhere)
    val pinned = planOf(graft.sources.IndexIO.pin(idx, v))
    assert(shape(pinned) == preAppend,
      s"pinned serve changed plan shape:\nPINNED:\n$pinned\nPRE-APPEND SHAPE:\n$preAppend")
    assert(!pinned.contains("CartesianProduct"))
  }

  test("plan contract: perceptual hashes evaluate in the scan projection") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    // the expression rewrite's point: no object-serialization boundary,
    // no exchange — the hash is a projection over the scan, so it
    // composes with streaming gates and pushdown like the text kernels
    import graft.multimodal.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val withBin = Multimodal.withBinaryPayload(docs, "text")
    for ((marker, df) <- Seq(
        ("graft_ahash64(", Multimodal.withAHash(withBin, "payload", Seq("doc_id"))),
        ("graft_phash64(", Multimodal.withPHash(withBin, "payload", Seq("doc_id"))),
        ("graft_audiohash64(", Multimodal.withAudioHash(withBin, "payload", Seq("doc_id"))))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(marker), s"plan lost `$marker`:\n$plan")
      for (f <- Seq("SerializeFromObject", "DeserializeToObject",
          "MapPartitions", "Exchange"))
        assert(!plan.contains(f), s"perceptual-hash plan carries `$f`:\n$plan")
    }
  }

  test("plan contract: LM gates evaluate the scoring kernel ONCE per row") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    // the Generate fence (explode(array(kernel))) keeps the kernel out
    // of the Filter condition AND the survivors' Project — without it,
    // pushdown + projection collapse plant a full scoring call in each
    for ((name, marker) <- Seq(
        ("stream_lm_gate", "graft_lm_score("),
        ("stream_lm_gate3", "graft_lm_score3("),
        ("stream_nb_gate", "graft_nb_score("),
        ("stream_lang_gate", "graft_nb_predict("))) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val count = plan.sliding(marker.length).count(_ == marker)
      assert(count == 1,
        s"$name plan calls the kernel $count times (want 1):\n$plan")
    }
  }

  // ---- ANN top-k shapes --------------------------------------------------
  // The registered ann_topk_* gate queries wrap the search in
  // recallSummary (whose localCheckpoint truncates the plan), so the
  // load-bearing shapes are asserted on the underlying search plans
  // directly. Every ANN top-k depends on Spark's rank-limit pushdown
  // (WindowGroupLimit) to avoid shuffling the full |Q|x|C| scored-pair
  // stream, and the persisted-IVF probe depends on dynamic partition
  // pruning to skip unprobed cell directories.

  import org.apache.spark.sql.functions.col
  import graft.operators.SimilaritySearch

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("plan contract: ann_topk (brute force) keeps WindowGroupLimit") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val plan = SimilaritySearch.bruteForceTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"ann_topk plan lost rank-limit pushdown:\n$plan")
  }

  test("plan contract: ann_topk_pq keeps WindowGroupLimit") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val plan = SimilaritySearch.pqTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", k = 5,
        m = 32, kCodes = 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"ann_topk_pq plan lost rank-limit pushdown:\n$plan")
  }

  test("plan contract: searchIvf keeps WindowGroupLimit + dynamic cell pruning") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val idx = java.nio.file.Files.createTempDirectory("graft_plan_ivf").toString
    SimilaritySearch.buildIvfIndex(emb, "vec_id", "embedding", idx)
    val plan = SimilaritySearch.searchIvf(
        spark, idx, emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"ann_topk_ivf_persisted plan lost rank-limit pushdown:\n$plan")
    assert(plan.contains("dynamicpruning"),
      s"ann_topk_ivf_persisted probe lost dynamic cell pruning:\n$plan")
  }

  test("plan contract: searchIvfPqWhere keeps WindowGroupLimit, allowlist is a semi-join") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val idx = java.nio.file.Files.createTempDirectory("graft_plan_ivfpq_w").toString
    SimilaritySearch.buildIvfPqIndex(emb, "vec_id", "embedding", idx,
      nCentroids = 4, iters = 3, m = 4, kCodes = 16, sampleN = 256)
    val plan = SimilaritySearch.searchIvfPqWhere(
        spark, idx, emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5,
        allowed = emb.filter(col("vec_id") % 3 =!= 0).select("vec_id"), nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"filtered search lost rank-limit pushdown:\n$plan")
    assert(plan.contains("LeftSemi"),
      s"allowlist did not plan as a semi-join:\n$plan")
    // the only nested-loop allowed is the k-row centroid broadcast
    // cross (cell choice); a CartesianProduct would mean the allowlist
    // or candidate join lost its equi keys
    assert(!plan.contains("CartesianProduct"),
      s"filtered search degenerated to an unbounded join:\n$plan")
  }
}
