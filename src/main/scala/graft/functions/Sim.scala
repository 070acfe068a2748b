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
    // Universal hashing mod the Mersenne prime p = 2^31-1: base hashes and
    // multipliers both live in [0, p), so products (< 2^62, no ANSI
    // overflow) wrap the modulus many times over — each (a_j, b_j) yields
    // a genuinely different ordering. (A modulus much larger than a·x
    // would make every h_j order-preserving and all components pick the
    // same min token.)
    val p = 2147483647L // 2^31 - 1
    val cs = (0 until numHashes).map { j =>
      val a = (2654435761L * (j + 1) + 40503L) % (p - 1) + 1
      val b = (1103515245L * (j + 1) + 12345L) % p
      array_min(transform(tokenArr,
        t => pmod(pmod(xxhash64(t), lit(p)) * lit(a) + lit(b), lit(p))))
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
