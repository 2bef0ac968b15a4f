package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking: split each document into fixed-size token windows
  * (optionally overlapping) — the standard preprocessing step before
  * context-length-bounded training or embedding (RAG indexing, long-doc
  * encoders). Everything here is a pure per-row Column program
  * (`transform` over a `sequence` of window starts + `slice`), so the
  * operator is map-side only: zero shuffles, composes with column
  * pruning and partition pruning, and scales embarrassingly — at 100 TB
  * the chunk explosion multiplies rows (by ~nTokens/stride per doc) but
  * never moves them.
  */
object Chunking {

  /** Number of sliding windows of `maxTokens` tokens advancing by
    * `stride` needed to cover `nTok` tokens: the last window must reach
    * the end, so `max(1, ceil((nTok - maxTokens) / stride) + 1)`. A doc
    * at or under `maxTokens` yields exactly one chunk.
    */
  private def numChunks(nTok: Column, maxTokens: Int, stride: Int): Column =
    greatest(
      ceil((nTok.cast("double") - lit(maxTokens)) / lit(stride.toDouble)).cast("int") + lit(1),
      lit(1))

  /** Explode each document into (chunk_id, chunk_text, n_tokens) rows.
    * Chunk `i` covers tokens `[i*stride, i*stride + maxTokens)` of the
    * whitespace-normalized token stream ([[TextFunctions.tokens]]); with
    * `stride < maxTokens` consecutive chunks overlap by
    * `maxTokens - stride` tokens (the usual RAG-indexing overlap), with
    * `stride == maxTokens` they partition the document. The final chunk
    * is ragged (`n_tokens <= maxTokens`). Output keeps every column of
    * `df` plus `chunk_id` / `chunk_text` / `n_tokens`; token order and
    * inter-token whitespace are normalized (single spaces), not
    * preserved — chunking is a tokenizer-side operator. A null-text doc
    * yields NO chunk rows (the explode of a null chunk array) rather
    * than one null chunk.
    */
  def chunkDocuments(
      df: DataFrame,
      textCol: String,
      maxTokens: Int,
      stride: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(stride > 0 && stride <= maxTokens,
      s"stride must be in [1, maxTokens], got $stride (maxTokens $maxTokens)")
    val toks = TextFunctions.tokens(col(textCol))
    // guard BEFORE numChunks: greatest(null, 1) is 1, so without it a
    // null-text doc would emit one all-null chunk instead of none
    val chunksRaw = transform(
      sequence(lit(0), numChunks(size(toks), maxTokens, stride) - lit(1)),
      i => {
        val piece = slice(toks, i * lit(stride) + lit(1), lit(maxTokens))
        struct(
          i.cast("long").as("chunk_id"),
          array_join(piece, " ").as("chunk_text"),
          size(piece).cast("long").as("n_tokens"))
      })
    val chunks = when(toks.isNotNull, chunksRaw)
    df.select(col("*"), explode(chunks).as("chunk"))
      .withColumn("chunk_id", col("chunk.chunk_id"))
      .withColumn("chunk_text", col("chunk.chunk_text"))
      .withColumn("n_tokens", col("chunk.n_tokens"))
      .drop("chunk")
  }

  /** GPT-style sequence-packing coordinates: documents are concatenated
    * — one EOS token after each — into `numStreams` independent token
    * streams, and each stream is chopped into fixed `seqLen`-token
    * training sequences (documents DO straddle sequence boundaries; the
    * attention mask, not the packer, separates them). Returns per-doc
    * coordinates instead of materialized sequences: `stream` (which
    * stream the doc landed in), `n_tokens`, `start_off` (the doc's first
    * token's offset in its stream), and `first_seq` / `last_seq` (the
    * sequence indices its tokens span). A writer task owning (stream,
    * seq range) slices can then materialize training rows without any
    * further coordination.
    *
    * Determinism contract (the point of the operator): stream assignment
    * is [[Sampling.lcgBucket]] mod `numStreams` and within-stream order
    * is ascending id — the packing is a pure function of the data,
    * reproducible across runs, engines, partition layouts, and retries.
    *
    * Scale shape: one shuffle (hash on stream), then a per-stream
    * running sum. Streams are the parallelism unit — size `numStreams`
    * to a multiple of the cluster's cores so each stream's sort+scan
    * stays RAM-sized; the per-stream cumulative sum is the price of
    * byte-identical packing (the alternative, rand-free round-robin by
    * partition, is layout-dependent and unreproducible).
    *
    * Null text: the doc emits a row with null `n_tokens`/`last_seq` and
    * contributes ZERO width to its stream (window `sum` skips nulls), so
    * later documents' offsets are unaffected.
    */
  def packConcat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int,
      numStreams: Int = 1): DataFrame =
    packConcatBy(
      df.select(col(idCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      idCol, "n_tokens", seqLen, numStreams)

  /** [[packConcat]] over a CALLER-SUPPLIED width column instead of the
    * whitespace token count — tokenizer-aware packing: feed it the
    * per-doc PIECE counts of a learned tokenizer
    * ([[CorpusStats.bpeEncodeStats]]'s `n_pieces`) and the packing
    * coordinates are planned in the same token space the training run
    * will actually consume, so sequence budgets are exact rather than
    * whitespace-approximate (whitespace counts under-estimate BPE pieces
    * by the merge compression ratio — a packer planning in the wrong
    * space systematically overfills sequences). Same determinism, null
    * (width = null contributes zero stream width, coordinates null), and
    * shuffle contract as [[packConcat]]; the width column is emitted
    * under its own name.
    */
  def packConcatBy(
      df: DataFrame,
      idCol: String,
      widthCol: String,
      seqLen: Int,
      numStreams: Int = 1): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(numStreams > 0, s"numStreams must be positive, got $numStreams")
    val w = Window.partitionBy("stream").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol),
        pmod(Sampling.lcgBucket(col(idCol)), lit(numStreams.toLong)).as("stream"),
        col(widthCol).cast("long").as(widthCol))
      .withColumn("start_off", coalesce(sum(col(widthCol) + 1L).over(w), lit(0L)))
      .withColumn("first_seq", floor(col("start_off") / seqLen))
      .withColumn("last_seq", floor((col("start_off") + col(widthCol) - 1L) / seqLen))
  }
}
