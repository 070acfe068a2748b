package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window document chunking — the RAG / context-window
  * preparation step: each document becomes ⌈(n − size)/stride⌉ + 1 chunks
  * of up to `chunkSize` tokens, consecutive chunks overlapping by
  * `chunkSize − stride` tokens, with the last chunk always reaching the
  * document's end (full coverage, no fully-redundant tail).
  *
  * Scale shape: pure narrow per-row work — one tokenize, one
  * `posexplode` over the start sequence, no shuffle, no window, no state.
  * At 100 TB this is scan-bound and embarrassingly parallel; output row
  * count is input tokens / stride, so pick `stride` to budget the blowup
  * (the default half-overlap doubles the corpus token count).
  *
  * Reference scope note: the reference has no chunker (its documents are
  * chain actions); this is part of the LLM-pipeline surface alongside
  * [[Dedup]]/[[Selection]].
  */
object Chunk {

  /** Chunk `textCol` of `docs` into overlapping token windows.
    *
    * Tokenization is space-run splitting (same tokenizer as
    * `Text.tokens` / `Shingles`). Empty/whitespace-only documents emit
    * no chunks. Output columns: the id column, `chunk_id` (0-based,
    * = `chunk_start / stride`), `chunk_start` (0-based token offset),
    * `n_tokens` (≤ `chunkSize`; shorter only for the final chunk), and
    * `chunk_text`.
    */
  def chunkDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    val n = size(col("__toks"))
    // last start = smallest multiple of stride whose chunk reaches the end:
    // 0 when the doc fits in one chunk, else stride·⌈(n − chunkSize)/stride⌉.
    // Exact in IEEE double for any real corpus (n < 2^52).
    val lastStart = when(n <= chunkSize, lit(0))
      .otherwise(lit(stride) *
        ceil((n - lit(chunkSize)) / lit(stride.toDouble)).cast("int"))
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), " +").as("__toks"))
      .select(col(idCol), col("__toks"), n.as("__n"),
        posexplode(sequence(lit(0), lastStart, lit(stride)))
          .as(Seq("chunk_id", "chunk_start")))
      .select(
        col(idCol),
        col("chunk_id"),
        col("chunk_start"),
        least(col("__n") - col("chunk_start"), lit(chunkSize)).as("n_tokens"),
        array_join(slice(col("__toks"), col("chunk_start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }
}
