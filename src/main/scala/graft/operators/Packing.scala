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
      chunk: Column): DataFrame = {
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
        var bin = 0L
        var fill = 0L
        var first = true
        it.map { case (_, id, toks) =>
          if (!first && fill + toks > maxLen) { bin += 1; fill = 0L }
          first = false
          fill += toks
          (id, chunkKey, bin, fill)
        }
      }
      .toDF(idCol, "chunk", "bin", "bin_fill")
  }
}
