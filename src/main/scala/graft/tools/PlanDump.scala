package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for representative queries into
  * PLANS.md — the evidence trail for the scale-design claims (pushdown,
  * join strategy, no nested loops, rank-limit pushdown).
  */
object PlanDump {

  private val annotated: Seq[(String, String)] = Seq(
    "fuzzy_join_acctbal" ->
      """Band join as a bucketed equi-join: both scans carry `PushedFilters`
        |(null/NaN/Inf pre-filters reach parquet) and prune to the two used
        |columns; the join is a hash join on the synthetic bucket key — a
        |shuffled SMJ/SHJ at cluster scale, BroadcastHashJoin here because
        |the exploded supplier side is small. No nested loop anywhere.""".stripMargin,
    "asof_join_events" ->
      """As-of = bucketed band join + per-left-row `row_number`. Spark plans
        |the rank filter as `WindowGroupLimit` BEFORE the final sort: each
        |shuffle partition keeps only the best candidate per left row, so
        |full candidate lists are never materialized through the exchange.""".stripMargin,
    "interval_join_orders" ->
      """Interval overlap via grid buckets: `sequence(floor(start/w),
        |floor(end/w))` explodes each side to the buckets it touches, the
        |join is pure equi on the bucket id, and the `greatest(start)`
        |anchor makes each overlapping pair survive in exactly one bucket —
        |no dropDuplicates shuffle.""".stripMargin,
    "dedup_minhash" ->
      """MinHash LSH: one UDF pass computes signature AND band keys (no
        |projection-collapse re-evaluation); banding shuffles only
        |(id, band, key); shingle arrays are re-joined onto the already-
        |deduplicated candidate pairs for exact verification.""".stripMargin,
    "topk_orders" ->
      """Global top-k: `TakeOrderedAndProject` — per-partition heaps then a
        |driver-side merge of k rows per partition; the full sort never
        |happens.""".stripMargin,
    "agg_pricing" ->
      """Aggregation with map-side partial aggregation (`HashAggregate`
        |before and after the exchange): the shuffle carries one row per
        |(group, partition), not one per input row.""".stripMargin,
    "ineq_join_acctbal" ->
      """Inequality join on the custom `BroadcastRangeJoinExec` (via
        |GraftExtensions, the same session the gate runs): build side
        |broadcast once, sorted per task, probed by binary search — the
        |reference's sort+bisect algorithm per task, O(n log m + output)
        |instead of the BroadcastNestedLoopJoin compare loop.""".stripMargin,
    "ineq_join_shuffled" ->
      """Large x large range join with broadcasting disabled: the
        |`ShuffledRangeJoinExec` samples the right side's keys once for
        |BOTH range-bucket bounds and per-bucket salt sub-slots (hot
        |equal keys split proportionally — round-4 skew fix), shuffles
        |right rows to their slot, replicates left rows only across the
        |contiguous slot run that can match, and sort+probes per
        |partition. No broadcast, no nested loop.""".stripMargin,
    "asof_join_unbounded" ->
      """Unbounded as-of (merge_asof): union-tag + range repartition (the
        |engine's scalable global sort), one running-window pass per
        |partition, and a one-row-per-partition carry for cross-boundary
        |matches. The range exchange is materialized once so the window
        |and the carry share one sampled partitioning.""".stripMargin,
    "fuzzy_join_sql" ->
      """The FUZZY JOIN SQL syntax end to end: GraftSqlParser desugars
        |`ON a NEAR b WITHIN tol` to `abs(a-b) <= tol`, the optimizer
        |rule buckets it — same hash-join-on-bucket shape as the operator
        |API, no nested loop, scans pushed down.""".stripMargin,
    "stream_asof_events" ->
      """Streaming as-of's batch form: equi-join on the key + band
        |residual, then the latest-ref rank as `WindowGroupLimit` before
        |the exchange — candidates collapse to one row per probe on the
        |map side.""".stripMargin,
    "heavy_hitters_tokens" ->
      """Two-pass Misra-Gries heavy hitters: pass 1 is ObjectHashAggregate
        |with PARTIAL mode before the single-row exchange (k-entry maps
        |cross the shuffle, not tokens); pass 2 re-scans with the <= k
        |candidates as an `In` filter and exact-counts only those.""".stripMargin,
    "dedup_incremental" ->
      """Incremental dedup against the persisted band index: the delta
        |bands itself with the index's stored parameters and equi-joins
        |the co-clustered postings parquet on (band, key); candidates
        |collapse to bare 16-byte id pairs in a partial-agg shuffle;
        |exact verification joins the 8-byte-per-shingle sketch arrays
        |— the corpus TEXT is nowhere in this plan.""".stripMargin,
    "decontaminate_docs" ->
      """Benchmark decontamination: the eval side collapses to distinct
        |64-bit shingle hashes and BROADCASTS (eval benchmarks are MBs,
        |the corpus is the big side); the train side is one scan —
        |explode, hash, broadcast-probe, partial-count — and the only
        |exchange carries one (doc_id, counts) row per doc from the
        |map-side partial HashAggregate. No text and no shingle strings
        |ever cross a shuffle.""".stripMargin,
    "bm25_search" ->
      """BM25 top-k: the `term IN (query)` filter sits UNDER the postings
        |aggregation, so only query-term postings reach the exchange;
        |doc-frequency (<= |query| rows) and corpus stats (1 row)
        |broadcast back into the scoring join; the final ranking is
        |TakeOrderedAndProject (per-partition heaps), never a global
        |sort.""".stripMargin,
    "lm_score_docs" ->
      """Corpus-trained bigram LM scoring: training is two hash
        |aggregations keyed by xxhash64 of the bigram/unigram (8-byte
        |keys, map-side partials); scoring re-joins each doc's bigrams
        |by the same hashed keys — plain shuffled joins AQE can flip to
        |broadcast for small domain models — and ships one row per doc
        |out of the final partial agg.""".stripMargin,
    "dedup_mask_windows" ->
      """Repeated-window substring dedup: the occurrence shuffle carries
        |(xxhash64(window), id, pos) — 8-byte keys, no window text;
        |"first occurrence" is a min(struct(id,pos)) aggregate with
        |MAP-SIDE PARTIALS (a boilerplate window collapses to one row
        |per map partition before the exchange) and duplicates come
        |from an AQE-skew-splittable equi-join, not a row_number sort
        |that would serialize the hottest window in one task; masked
        |positions explode k-fold only for duplicated windows;
        |reassembly is one hash shuffle by id.""".stripMargin,
    "pack_sequences" ->
      """Chunk-scoped greedy packing: one hash exchange on the chunk
        |key, then MapGroups over a per-partition SORTED group iterator
        |(flatMapSortedGroups — spillable sort, constant per-group
        |state, nothing collected). Embarrassingly parallel across
        |chunks at any corpus size.""".stripMargin,
    "stream_index_dedup" ->
      """The streaming ingest gate's batch-unified plan: band keys from
        |one UDF pass, equi-join against the PERSISTED postings parquet,
        |sketch join for exact verification, first-shared-band filter
        |for exactly-once — no aggregation anywhere, which is what makes
        |the same plan run stateless under a stream.""".stripMargin,
    "corpus_profile" ->
      """One corpus scan -> rollup profile: partial HashAggregate under
        |the exchange (expand for the rollup grouping sets), exact
        |scaled-long quality sums, one row per (source) plus the grand
        |total.""".stripMargin,
    "asof_join_by" ->
      """Grouped merge_asof (by=user): a range exchange on the compound
        |(key, ts) order keeps each group contiguous, the running window
        |and the boundary carry both run per (partition, key), and the
        |carry join is a plain equi-join on (pid, key) — per-group work
        |is bounded by PARTITION size, not key size, so a hot user
        |cannot serialize the join (the simpler partitionBy(user) window
        |would). The hash exchange above the checkpointed scan is the
        |known price of pinning sampled pids (the checkpoint erases
        |partitioning info); it moves each partition wholesale, once.""".stripMargin,
    "decontaminate_bloom" ->
      """Bloom-prefiltered decontamination: eval shingles collapse into a
        |driver-built Bloom filter (~1.2 B/shingle) probed INSIDE the
        |train scan's projection on the shingle-hash array — the
        |size(__cand) > 0 Filter sits directly on the scan, so clean
        |docs (the overwhelming majority) die before the explode, the
        |confirm join, or any exchange. The exact confirm join then only
        |sees bloom hits, making the output identical to the exact
        |path's (shared oracle proves it).""".stripMargin,
    "mix_sources" ->
      """Domain mixing: per-source thresholds (computed from one tiny
        |count agg) broadcast-join onto the corpus scan; the md5-bucket
        |filter keeps rows in place — no shuffle of kept data, the plan
        |is scan -> BroadcastHashJoin -> Filter.""".stripMargin,
    "shuffle_corpus" ->
      """Reproducible global training order WITHOUT a global sort: rank =
        |broadcast per-bucket offset + row_number over a window
        |PARTITIONED by the order-preserving hash-prefix bucket. The
        |only exchange is hash-by-bucket (parallel); no
        |`Exchange SinglePartition` anywhere — the degenerate plan an
        |unpartitioned row_number() would produce.""".stripMargin,
    "stream_lm_gate3" ->
      """Order-3 quality gate: a scan-side Filter + Project — the pruned
        |trigram/bigram/unigram arrays ride as plan references into the
        |`graft_lm_score3` kernel; no join, no aggregate, no data-moving
        |exchange (the RoundRobin below is the testdata loader's
        |single-row-group spread, not the operator). Codegen
        |subexpression elimination evaluates the kernel once per row in
        |the Filter stage (+ once in the Project for survivors), and the
        |per-executor word cache absorbs the repeat. Stateless, hence
        |streamable.""".stripMargin,
    "lm_score_trigram" ->
      """Batch order-3 scoring: five equi-joins against the count tables
        |(trigram, 2x bigram, 2x unigram — all hash-keyed 8-byte
        |xxhash64 chains) + one broadcast of the one-row N/|V| stats.
        |Shuffled hash joins at corpus scale that AQE flips to broadcast
        |under a small domain model; the per-doc reduction ships one row
        |per doc. The serving path (stream_lm_gate3) avoids all five
        |joins.""".stripMargin,
    "bm25_search_deleted" ->
      """Serving across a tombstone chain: the postings scan still
        |carries the pushed `term IN` filter (PushedFilters reaches
        |parquet below the anti-join), tombstones broadcast into a
        |left-anti join (takedown-sized), stats come from the newest
        |segment's one-row table. df re-aggregates from live postings —
        |a <= |query|-row aggregate.""".stripMargin,
    "stream_pack_sequences" ->
      """Incremental packing micro-batch: one hash exchange on the chunk
        |shard key, then `flatMapSortedGroups` streams each chunk's docs
        |through constant carry state — group size never bounds memory,
        |and the carry map is one tuple per shard (driver-held between
        |batches, snapshot-persisted for restarts).""".stripMargin,
    "tokenize_bpe_ids" ->
      """text->ids: the whole tokenization is one codegen'd scan
        |projection (`graft_bpe_token_ids` + posexplode Generate) — no
        |shuffle at all; the merge table and vocab map are plan
        |references, per-word results cached per executor.""".stripMargin,
    "sample_stratified" ->
      """Per-stratum rebalancing: a scan-side Filter on the md5 bucket
        |against a CASE of per-source thresholds — zero shuffle, zero
        |joins; membership is a pure function of the id, so the sample
        |is stable under re-partitioning and appends.""".stripMargin,
    "extract_html" ->
      """HTML -> text is eight codegen'd `regexp_replace` passes fused in
        |ONE scan projection (plan-contract pinned: no exchange, no join,
        |no aggregate). At 100 TB this is the shape that matters: the
        |extraction runs where each page already lives and the projection
        |prunes to (doc_id, extracted) before anything moves.""".stripMargin,
    "quality_classifier" ->
      """Weak-supervision NB: train is one token-count HashAggregate on
        |xxhash64 keys (the label folds into two partial sums — the
        |shuffle carries (hash, cp, cn)); scoring re-explodes tokens and
        |equi-joins the model, which AQE broadcasts at this vocabulary
        |size and shuffles at web scale. No token string ever crosses an
        |exchange — 8-byte hashes only.""".stripMargin,
    "stream_nb_gate" ->
      """The pruned-NB serving form: sorted key/delta arrays ride as plan
        |references into ONE in-row kernel call per doc behind a Generate
        |fence (plan-contract pinned to a single `graft_nb_score(`);
        |no join, no aggregate, no exchange — the classifier gates a
        |stream exactly like the LM gates.""".stripMargin,
    "corpus_diff" ->
      """Snapshot CDC: both sides project to (id, xxhash64) BEFORE the
        |full-outer join, so diffing two 100 TB snapshots shuffles two
        |16-byte columns; id-bucketed snapshots would co-locate and skip
        |both exchanges. Status is a CASE over null-ness + fingerprint
        |equality — no second pass.""".stripMargin,
    "mix_epochs" ->
      """Fixed-recipe mixing: no aggregation anywhere (the recipe is
        |given) — a broadcast of per-source (floor, fraction) factors
        |into the scan, copies materialized by Generate where each row
        |lives. Kept rows never shuffle.""".stripMargin,
    "sample_top_fraction" ->
      """Rational top-fraction per group: pass 1 aggregates (group,
        |score) counts and walks the DISTINCT-score table with cumulative
        |windows (tiny next to the data); pass 2 equi-joins the verdict
        |back and ranks ONLY the threshold tie set. The cut compares
        |exact longs (rank*denom <= n*numer) — no doubles, no engine
        |rounding drift, and no per-group global sort.""".stripMargin,
    "detokenize_bpe" ->
      """ids -> text -> hex: two native kernels (encode, decode) fused in
        |one scan projection — the roundtrip claim costs one pass and
        |nothing moves.""".stripMargin,
    "pipeline_web_ingest" ->
      """The whole web-crawl ingest path — HTML extraction, PII scrub, NB
        |classifier gate, context-window chunking — in ONE exchange-free
        |plan (contract-pinned): regex passes and the NB kernel in the
        |scan projection, chunk windows as a Generate. Stream-safe as-is;
        |at 100 TB every page is processed exactly where it lands.""".stripMargin,
    "gopher_rules" ->
      """Rule-based quality audit: all six signals are exact-integer
        |count comparisons inside one scan projection — no doubles, no
        |shuffle, per-rule booleans so operations can see WHICH rule
        |kills a document.""".stripMargin,
    "lm_ccnet_buckets" ->
      """CCNet terciles: LM scoring (two hash-keyed count aggregates)
        |feeds the rational-rank labeler — the cumulative walk runs on
        |the DISTINCT-score table and only tie sets see a row-level
        |window, so per-language bucketing never globally sorts a
        |language.""".stripMargin,
    "stream_distinct_users" ->
      """Per-window HLL++: fixed-size mergeable sketch state where exact
        |streaming countDistinct is impossible; partial aggregation
        |merges map-side, one slim shuffle of sketch buffers.""".stripMargin,
    "pack_sequences_bfd" ->
      """Best-fit-decreasing: same one-hash-shuffle shape as packGreedy,
        |per-group state = a fill-keyed TreeMap (O(log bins)/doc). 233
        |bins vs first-fit's 290 on the gate corpus (mean fill 96.5 vs
        |80.1 of 128) — 20% fewer sequences for the same tokens.""".stripMargin,
    "sample_by_quality" ->
      """Importance sampling: the NB score plan (hash-keyed count agg +
        |token join) feeding a scan-side sigmoid-threshold Filter on the
        |md5 bucket — per-row probability, zero extra shuffles past the
        |scoring aggregation.""".stripMargin,
    "curriculum_order" ->
      """Dense global rank by score: the cumulative walk runs on the
        |DISTINCT-score table (a window over score values, not rows);
        |rows rank only inside their tie sets. No single-partition sort
        |of the data anywhere.""".stripMargin,
    "lang_id_nb" ->
      """Trained multiclass language ID: one token-count aggregate with
        |#classes conditional partial sums (shuffle carries (hash,
        |counts[])), scoring re-explodes per class and argmaxes with a
        |deterministic tie rule. Self-accuracy on the SYNTHETIC corpus is
        |~the prior (its text is label-independent by construction — the
        |same vocabulary for every lang value); the suite's marker corpus
        |pins perfect separation when signal exists, and correctness is
        |the exact five-model oracle replay, not accuracy.""".stripMargin,
    "clean_lines" ->
      """C4 line filter: split -> three keep rules as array lambdas ->
        |rejoin, all in the scan projection. The rules are RE2-portable
        |regex + integer word counts, so the oracle replays the bytes
        |exactly.""".stripMargin,
    "stream_lang_gate" ->
      """Trained 'English only' at ingest: the pruned multiclass model
        |(sorted keys + flat per-class log-prob table) rides as plan
        |references into ONE graft_nb_predict call per doc — stateless,
        |exchange-free, contract-pinned like the other gates.""".stripMargin,
    "shard_by_tokens" ->
      """Token-balanced output sharding: the two-pass bucket-offset
        |cumulative sum (per-bucket sums -> broadcast offsets -> windows
        |WITHIN buckets) assigns every doc the shard where its tokens
        |start. No global sort; compose with Sources.writeTokenShards
        |for shard=N/ training files.""".stripMargin,
    "dedup_by_url" ->
      """Crawl dedup on the canonical URL: canonicalization in the scan
        |projection, keep-first as a WindowGroupLimit-planned rank
        |filter (contract-pinned) — the shuffle carries (url-fingerprint,
        |id), never page bodies.""".stripMargin,
    "multimodal_image_dedup" ->
      """Perceptual image dedup: one decode pass per image (mapPartitions,
        |codec amortized), then 8-byte aHash signatures through the
        |pigeonhole-blocked Hamming join — candidates meet only on a
        |shared signature chunk, pairs verify by bit_count(xor).""".stripMargin,
    "chunk_documents_sentences" ->
      """Sentence-boundary chunking: extraction, per-sentence token
        |counts, prefix sums, and chunk assembly are ALL array
        |higher-order functions in the scan projection — zero shuffle
        |(contract-pinned), whole sentences, start-based budget.""".stripMargin,
    "embedding_drift" ->
      """Distribution-shift monitor: per-dimension exact grid-long sums
        |(one (dim, sa, sb) row per dimension crosses the shuffle),
        |int128/BigInt cosine of the SUM vectors on the driver — the
        |scale factors cancel, so the value is engine-exact.""".stripMargin)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/root/repo/PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence for the scale design\n\n")
    sb.append("Generated by `graft.tools.PlanDump` from the live queries at\n")
    sb.append(s"`$sfDir` (plans are data-size dependent only in the\n")
    sb.append("broadcast-vs-shuffle choice; the shapes below are the point).\n")
    annotated.foreach { case (name, note) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // executedPlan AFTER an action so AQE settles
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      sb.append(s"\n## $name\n\n")
      sb.append(note).append("\n\n```\n")
      sb.append(plan.linesIterator.take(40).mkString("\n"))
      sb.append("\n```\n")
    }
    // everything from the marker on is manually maintained measurement
    // evidence (bench tables, stress runs) — preserved across dumps
    val marker = "<!-- MANUAL EVIDENCE — preserved by PlanDump -->"
    val manualTail =
      if (Files.exists(Paths.get(out))) {
        val existing = new String(Files.readAllBytes(Paths.get(out)), "UTF-8")
        val i = existing.indexOf(marker)
        if (i >= 0) existing.substring(i) else marker + "\n"
      } else marker + "\n"
    sb.append("\n").append(manualTail)
    Files.write(Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"[plandump] wrote $out")
    spark.stop()
  }

}
