package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget training sequences ("bins") without splitting a
  * document — the step between curation and the tokenizer that decides
  * which docs share a context window. Greedy first-fit in a
  * deterministic order, so the packing is reproducible run to run and
  * engine to engine.
  *
  * Beyond the reference surface (SURVEY.md §2.4).
  *
  * == Why chunk-scoped ==
  * Exact greedy packing of a global ordering is inherently sequential —
  * bin boundaries depend on the entire prefix. Sharding the order into
  * deterministic CHUNKS (e.g. `doc_id div 1000`) and packing greedily
  * within each chunk makes every chunk independent: at 100 TB the job
  * is embarrassingly parallel across millions of chunks, and the cost
  * is bounded waste — at most one partially-empty bin per chunk, ≤
  * `maxLen` tokens on a chunk holding ~`chunkSize × avg_tokens`, which
  * vanishes for any reasonable chunk size. This mirrors how production
  * packers shard by file/shard id.
  *
  * == Scale shape ==
  * One hash shuffle on the chunk key; `flatMapSortedGroups` streams
  * each chunk's docs in sorted order through constant per-group state
  * (current bin id + fill) — Spark sorts groups within partitions
  * spillably, nothing is collected, group size never bounds memory.
  */
object Packing {

  /** Pack each chunk's docs (ascending `idCol`) into bins of at most
    * `maxLen` tokens: a doc that does not fit opens the next bin; a doc
    * LARGER than `maxLen` occupies a bin alone (truncation is the
    * tokenizer's concern, splitting is not this operator's contract).
    *
    * Returns `(<idCol>, chunk, bin, bin_fill)` — `bin` numbered from 0
    * within its chunk, `bin_fill` the bin's cumulative token count
    * after placing this doc (so the bin's total is the max over its
    * docs; a packed-sequence id is `(chunk, bin)`).
    *
    * `idCol` and `tokensCol` must be numeric (cast to long); `chunk`
    * any long-castable expression — default shards contiguous id
    * ranges.
    */
  def packGreedy(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      maxLen: Long,
      chunk: Column): DataFrame =
    packGreedyFrom(docs, idCol, tokensCol, maxLen, chunk, Map.empty)

  /** [[packGreedy]] continuing from per-chunk carry-over state
    * (`chunk -> (open bin id, open bin fill)`) — the micro-batch step
    * of the STREAMING packer: batch N+1 keeps filling the bin batch N
    * left open instead of starting every chunk at bin 0. An empty
    * carry is exactly [[packGreedy]].
    *
    * The carry rides into tasks as a closure constant: one small tuple
    * per chunk ever touched (a chunk is a caller-chosen shard key —
    * takedown-sized, not row-scaled). Streams over genuinely unbounded
    * chunk spaces should re-shard, not grow the carry.
    */
  def packGreedyFrom(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      maxLen: Long,
      chunk: Column,
      carry: Map[Long, (Long, Long)]): DataFrame = {
    require(maxLen > 0, s"packGreedy: maxLen must be positive, got $maxLen")
    require(!Seq("chunk", "bin", "bin_fill").contains(idCol),
      s"packGreedy: idCol '$idCol' collides with an output column")
    val spark = docs.sparkSession
    import spark.implicits._
    // Contract errors, not encoder NPEs: a null id/token value or a
    // non-castable chunk expression fails HERE with a named message
    // (assert_true is codegen'd inline — no extra pass), matching the
    // explicit require() style above.
    def checked(c: Column, what: String): Column =
      when(assert_true(c.isNotNull,
        lit(s"packGreedy: $what is null or not castable to long")).isNull, c)
    val in = docs.select(
      checked(chunk.cast("long"), "chunk expression").as("chunk"),
      checked(col(idCol).cast("long"), s"idCol '$idCol'").as("id"),
      checked(col(tokensCol).cast("long"), s"tokensCol '$tokensCol'").as("toks"))
      .as[(Long, Long, Long)]
    in.groupByKey(_._1)
      .flatMapSortedGroups(col("id").asc) { (chunkKey: Long, it: Iterator[(Long, Long, Long)]) =>
        val carried = carry.get(chunkKey)
        var bin = carried.map(_._1).getOrElse(0L)
        var fill = carried.map(_._2).getOrElse(0L)
        // continuing an open bin: the chunk's next doc is NOT "first"
        // (a doc that doesn't fit must open the next bin)
        var first = carried.isEmpty
        it.map { case (_, id, toks) =>
          if (!first && fill + toks > maxLen) { bin += 1; fill = 0L }
          first = false
          fill += toks
          (id, chunkKey, bin, fill)
        }
      }
      .toDF(idCol, "chunk", "bin", "bin_fill")
  }

  /** Driver-held carry-over state for streaming packing: feed each
    * micro-batch (arrival order = packing order; sorted by id within
    * the batch) and write the returned packed rows; the open-bin state
    * crosses batch boundaries. Thread-safe the way foreachBatch needs
    * (batches are sequential; the lock is belt-and-braces).
    */
  final class IncrementalPacker(
      idCol: String, tokensCol: String, maxLen: Long, chunkExpr: Column)
      extends Serializable {
    @volatile private var carry: Map[Long, (Long, Long)] = Map.empty

    /** Current per-chunk open-bin state (for tests/checkpointing). */
    def state: Map[Long, (Long, Long)] = carry

    /** Pack one micro-batch continuing from the carried state; returns
      * the packed rows (materialized — safe to write AND to fold state
      * from without recomputation).
      */
    def addBatch(batch: DataFrame): DataFrame = synchronized {
      val packed = packGreedyFrom(batch, idCol, tokensCol, maxLen, chunkExpr, carry)
        .localCheckpoint(true)
      // the open bin after this batch = the LAST doc's (bin, fill) per
      // chunk — one row per chunk touched, bounded by the shard count
      val last = packed.groupBy(col("chunk"))
        .agg(max_by(
          struct(col("bin"), col("bin_fill")),
          struct(col("bin"), col(idCol))).as("s"))
        .select(col("chunk"), col("s.bin"), col("s.bin_fill"))
        .collect()
      carry = carry ++ last.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      packed
    }

    /** Snapshot the carry state as an atomic [[graft.sources.IndexIO]]
      * version (call after the batch's output commits — the usual
      * checkpoint ordering: state snapshot may lag output, never lead,
      * so a restart repacks from a bin boundary instead of losing one).
      */
    def saveState(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
      synchronized {
        import spark.implicits._
        val rows = carry.toSeq.map { case (c, (b, f)) => (c, b, f) }
        graft.sources.IndexIO.publish(spark, path) { vdir =>
          rows.toDF("chunk", "bin", "fill")
            .coalesce(1).write.mode("overwrite").parquet(s"$vdir/state")
        }
        ()
      }

    /** Resume from a [[saveState]] snapshot (restart path). */
    def restoreState(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
      synchronized {
        val vdir = graft.sources.IndexIO.resolve(spark, path)
        carry = spark.read.parquet(s"$vdir/state").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      }
  }
}
