package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Context-window chunking: split documents into at-most-`maxTokens`-
  * token chunks with `overlap` tokens shared between consecutive chunks
  * — the step between curation and packing that decides how a long
  * document becomes training sequences ([[Packing.packGreedy]] then
  * bins the chunks). Beyond the reference surface (SURVEY.md §2.4).
  *
  * Scale shape: pure scan-projection — tokens from the codegen'd
  * `tokens()` expression, chunk ids from an exploded `sequence`, chunk
  * text from `slice` + `array_join`. No shuffle at all: a 100 TB corpus
  * chunks at scan speed and the (id, chunk_id) output is deterministic,
  * so reruns and engines agree (the DuckDB oracle recomputes it).
  */
object Chunking {

  /** One row per chunk: `(<idCol>, chunk_id, <textCol>, n_tokens)`.
    * Chunk `c` covers tokens `[c·stride, c·stride + maxTokens)` with
    * `stride = maxTokens − overlap`; the last chunk may be shorter,
    * docs with ≤ `maxTokens` tokens yield exactly one chunk, empty
    * docs none. Chunk text rejoins its tokens with single spaces
    * (whitespace-normalized by construction — the tokenizer defines
    * the token stream, not the original spacing).
    */
  def chunkByTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"chunkByTokens: maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"chunkByTokens: overlap must be in [0, maxTokens), got $overlap")
    val stride = maxTokens - overlap
    val toks = TextFunctions.tokens(col(textCol))
    // 1 + ceil((n - maxTokens) / stride) chunks cover n tokens; the
    // double division matches the oracle's ceil(x / stride) exactly
    val nChunks = (lit(1) +
      ceil(greatest(size(col("__toks")) - maxTokens, lit(0)) / lit(stride)).cast("int"))
    df.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens)), " ")
          .as(textCol),
        least(lit(maxTokens), size(col("__toks")) - col("chunk_id") * stride)
          .cast("long").as("n_tokens"))
  }

  /** SENTENCE-BOUNDARY chunking — the RAG/semantic form: chunks never
    * cut mid-sentence. Sentences are `[^.!?]*[.!?]+` runs (plus a
    * final unterminated tail), a pattern deliberately inside the
    * RE2-portable subset (no lookbehind — RE2 has none, and the
    * DuckDB oracle replays the same extraction). A sentence goes to
    * chunk `floor(tokens-before-it / maxTokens)` — the same
    * whole-unit start-based rule as [[graft.operators.Sampling.assignTokenShards]]:
    * chunks hold ≈ `maxTokens` tokens, a sentence straddling the
    * boundary stays whole in its starting chunk (±1 sentence of
    * drift, never a split sentence), and the rule is prefix-sum
    * expressible — no path-dependent greedy state.
    *
    * Same zero-shuffle scan-projection shape as [[chunkByTokens]]:
    * extraction, per-sentence token counts, prefix sums, and chunk
    * assembly are all array higher-order functions (the prefix sums
    * are O(sentences²) slices per doc — sentences per document number
    * in the hundreds, not the millions; the alternative is a per-doc
    * window and a shuffle). Output `(<idCol>, chunk_id, <textCol>,
    * n_tokens)`; sentence-less docs yield nothing.
    */
  def chunkBySentences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Long,
      overlapTokens: Long = 0): DataFrame = {
    require(maxTokens > 0,
      s"chunkBySentences: maxTokens must be positive, got $maxTokens")
    require(overlapTokens >= 0 && overlapTokens < maxTokens,
      s"chunkBySentences: overlap must be in [0, maxTokens), got $overlapTokens")
    // with overlap, chunk c's token window is [c·stride, c·stride+max):
    // a sentence starting at cumBefore cb lands in every chunk
    // ceil((cb−max+1)/stride) .. floor(cb/stride) (clamped at 0) — the
    // same interval-membership grid as the token chunker's overlap,
    // collapsing to the single start chunk at overlap 0
    val stride = maxTokens - overlapTokens
    val raw = regexp_extract_all(col(textCol),
      lit("[^.!?]*[.!?]+[ \\t\\r\\n]*|[^.!?]+$"), lit(0))
    val sents = filter(transform(raw, s => trim(s)), s => length(s) > 0)
    df.select(col(idCol), sents.as("__sents"))
      .filter(size(col("__sents")) > 0)
      .withColumn("__cnts", transform(col("__sents"), s =>
        size(filter(split(s, "\\s+"), w => length(w) > 0)).cast("long")))
      .withColumn("__chunksOf", transform(
        sequence(lit(0), size(col("__sents")) - 1), i => {
          val cb = aggregate(slice(col("__cnts"), lit(1), i), lit(0L), _ + _)
          sequence(
            greatest(lit(0L),
              ceil((cb - lit(maxTokens) + lit(1L)) / lit(stride.toDouble))
                .cast("long")),
            floor(cb / lit(stride.toDouble)).cast("long"))
        }))
      .select(col(idCol), col("__sents"), col("__cnts"), col("__chunksOf"),
        explode(array_distinct(flatten(col("__chunksOf")))).as("__cid"))
      .select(
        col(idCol),
        col("__cid").cast("int").as("chunk_id"),
        array_join(
          zip_with(col("__sents"), col("__chunksOf"), (s, cs) =>
            when(array_contains(cs, col("__cid")), s)),
          " ").as(textCol),
        aggregate(
          zip_with(col("__cnts"), col("__chunksOf"), (n, cs) =>
            when(array_contains(cs, col("__cid")), n).otherwise(0L)),
          lit(0L), _ + _).as("n_tokens"))
  }
}
