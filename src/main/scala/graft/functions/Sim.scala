package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Similarity primitives — all built from codegen'd `functions._` and
  * higher-order functions; no UDFs, so every stage stays inside
  * whole-stage codegen and is safe at 100 TB.
  */
object Sim {

  /** Word-level n-gram shingles of a text column (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), " +")
    val count = size(toks) - (n - 1)
    when(count <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), count - 1),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
  }

  /** MinHash signature of a string-array column.
    *
    * numHashes independent permutations h_j(x) = (a_j * x + b_j) mod p over
    * xxhash64 base hashes, with fixed seeds — deterministic across runs and
    * machines. Returns array<long> of length numHashes.
    */
  def minHash(tokenArr: Column, numHashes: Int = 64): Column = {
    // Overflow-free under ANSI mode: base hash masked to 30 bits, odd
    // 31-bit multipliers → products stay under 2^61; p = 2^61-1.
    val p = 2305843009213693951L // 2^61 - 1 (Mersenne prime)
    val mask = (1L << 30) - 1
    val cs = (0 until numHashes).map { j =>
      val a = ((2654435761L + 40503L * j) % Int.MaxValue) | 1L
      val b = (22695477L + 1103515245L * j) % mask
      array_min(transform(tokenArr,
        t => pmod(xxhash64(t).bitwiseAND(lit(mask)) * lit(a) + lit(b), lit(p))))
    }
    array(cs: _*)
  }

  /** LSH band keys from a minhash signature: split into `bands` bands of
    * `rows` hashes; each band hashed into one bucket key. Candidate pairs
    * are rows sharing any (band_index, bucket) — the classic banding
    * scheme; with b·r = numHashes, the S-curve threshold ≈ (1/b)^(1/r).
    */
  def lshBands(signature: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(concat_ws("_",
          b.cast("string"),
          array_join(slice(signature, b * rows + 1, lit(rows)), "_")
        )).as("bucket")))

  /** Estimated Jaccard from two minhash signatures: fraction of agreeing
    * components.
    */
  def minHashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") /
      size(sigA).cast("double")

  /** Exact Jaccard over two token-set columns (array_distinct'ed inputs). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(array_union(a, b)).cast("double"))
  }

  /** 64-bit SimHash of a token array: per-bit majority vote of token
    * hashes. bit_count(xor) / 64 approximates cosine distance of the
    * token multiset. Built with bitwise column ops — codegen'd.
    */
  def simHash(tokenArr: Column): Column = {
    val votes = (0 until 64).map { bit =>
      // +1 per token whose hash has `bit` set, else -1; sign → bit value
      val ones = size(filter(tokenArr,
        t => shiftright(xxhash64(t), bit).bitwiseAND(lit(1L)) === lit(1L)))
      val setBit = (ones * 2) > size(tokenArr)
      when(setBit, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    votes.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit hash columns. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Dot product of two array<numeric> columns (promoted to double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of an array<numeric> column. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity of two vector columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
