package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Identifier/string helpers (SURVEY §2.9 C4-C7, C11-ish): validation
  * regexes mirroring the reference's shared schemas
  * (src/api/helpers/functions.ts:1197-1270) as codegen'd `rlike`s.
  */
object Names {

  /** Antelope account name: 1-12 chars of [a-z1-5.], no leading/trailing
    * dot. (The 13-char edge and suffix bits are API-layer concerns.)
    */
  def isValidAccount(c: Column): Column =
    c.rlike("^[a-z1-5][a-z1-5.]{0,10}[a-z1-5]$") || c.rlike("^[a-z1-5]$")

  /** Symbol code: 1-7 uppercase letters. */
  def isValidSymbol(c: Column): Column = c.rlike("^[A-Z]{1,7}$")

  /** Transaction/block id: 64 hex chars (lower-cased first, C5). */
  def isValidTrxId(c: Column): Column = lower(c).rlike("^[0-9a-f]{64}$")

  /** Signature shape check. */
  def isValidSignature(c: Column): Column = c.rlike("^SIG_(K1|R1|WA)_[1-9A-HJ-NP-Za-km-z]+$")

  /** C4: sha256 cache key over concatenated parts. */
  def cacheKey(parts: Column*): Column = sha2(concat_ws("|", parts: _*), 256)

  /** C5: canonical id normalization. */
  def normalizeId(c: Column): Column = lower(trim(c))
}
