package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Content-defined chunking (CDC): cut a document where the rolling
    * k-gram hash hits a zero-mask value (probability 2^-maskBits per
    * position, so chunks average ~2^maskBits characters) — the dedup
    * chunking that SURVIVES INSERTIONS. Fixed-size or token-window
    * chunks shift at every boundary after an edit, so one inserted word
    * re-hashes a whole document; content-defined boundaries re-align
    * immediately, so edited documents still share every untouched chunk
    * hash (the rsync/LBFS trick, applied to corpus dedup).
    *
    * Boundary rule: a cut falls after character `i + k − 1` whenever the
    * md5 draw of the k-gram starting at 1-based character i — the native
    * [[graft.exprs.GramKeys]] kernel, bit-identical to
    * `Split.hashDraw32(substr(i, k))` — is ≡ 0 mod 2^maskBits. A cut
    * landing exactly at the text end merges with the final boundary.
    * Stateless by design (no min/max chunk clamps): every boundary
    * decision depends only on its own k characters, which is what makes
    * the cut positions engine-reproducible AND shift-stable; the cost is
    * a geometric chunk-length tail (documented, not clamped).
    *
    * Scale shape: per-doc narrow work — one codegen'd gram-hash walk,
    * one O(len) arithmetic filter over the hash array, one explode; no
    * shuffle, no window, no state. Dup detection downstream is a plain
    * `groupBy(chunk_hash)` — map-side combined, shuffle = distinct
    * chunk count.
    *
    * Output: id, `chunk_idx` (0-based), `chunk_start` (0-based chars),
    * `chunk_len` (chars), `chunk_hash` (md5 hex of the chunk text).
    */
  def contentDefinedChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 16,
      maskBits: Int = 6): DataFrame = {
    require(k >= 1, s"gram size must be >= 1, got $k")
    require(maskBits >= 1 && maskBits <= 30,
      s"maskBits must be in [1, 30], got $maskBits")
    // fused native kernel: one byte walk emits the qualifying cut offsets
    // (strictly inside the text, so the appended final boundary never
    // duplicates) — no interpreted per-position lambda
    chunksFromCuts(docs, idCol, textCol,
      graft.exprs.CdcCuts(col(textCol), k, maskBits))
  }

  /** The FAST CDC variant: same output contract as
    * [[contentDefinedChunks]] but boundaries come from the 32-bit
    * XOR-gear rolling hash ([[graft.exprs.GearCuts]]) — one lookup +
    * shift + xor per byte instead of an md5 digest per position, with a
    * 32-byte re-alignment window. Still engine-reproducible: the gear
    * hash has a windowed-XOR closed form the SQL oracle evaluates
    * directly (no recursion), and the gear table derives from md5
    * parity, so nothing is entropy. Cut POSITIONS differ from the md5
    * kernel's (different hash, same ~2^-maskBits density); pick one
    * kernel per corpus and stay with it.
    */
  def contentDefinedChunksFast(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maskBits: Int = 6): DataFrame =
    chunksFromCuts(docs, idCol, textCol,
      graft.exprs.GearCuts(col(textCol), maskBits))

  /** Shared cut-array → chunk-row assembly: bounds = 0 ‖ cuts ‖ len,
    * consecutive pairs become (start, len, md5) chunk rows via one
    * explode. Narrow throughout.
    */
  private def chunksFromCuts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cuts: Column): DataFrame = {
    val t = col(textCol)
    val n = length(t)
    val bounds = concat(array(lit(0)), cuts, array(n))
    val pairs = transform(
      sequence(lit(1), size(bounds) - 1),
      i => struct(
        element_at(bounds, i).as("a"),
        element_at(bounds, i + 1).as("b")))
    docs
      .filter(n > 0)
      .select(col(idCol), t.as("__t"), posexplode(pairs).as(Seq("chunk_idx", "p")))
      .select(
        col(idCol),
        col("chunk_idx"),
        col("p.a").as("chunk_start"),
        (col("p.b") - col("p.a")).as("chunk_len"),
        md5(col("__t").substr(col("p.a") + 1, col("p.b") - col("p.a"))
          .cast("binary")).as("chunk_hash"))
  }
}
