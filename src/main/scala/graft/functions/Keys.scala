package graft.functions

/** Antelope public-key string conversion (C11) — the reference accepts a
  * key in either the legacy `EOS…` or canonical `PUB_K1_…` form and
  * serves both back (get_key_accounts.ts:37-44 via
  * `PublicKey.from(...).toLegacyString(...)`). Both forms wrap the same
  * 33-byte compressed point in base58check with a ripemd160 checksum;
  * the legacy checksum covers the payload alone, the K1 checksum covers
  * `payload ++ "K1"`.
  *
  * This is an API-layer scalar: the conversion runs once per request on
  * the driver (the stored table keeps the canonical K1 form), so there is
  * deliberately no UDF — the query plan only ever sees literal strings.
  */
object AntelopeKeys {

  // ------------------------------------------------------------------ base58

  private val Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val AlphaIndex: Map[Char, Int] = Alphabet.zipWithIndex.toMap

  def base58Encode(bytes: Array[Byte]): String = {
    val zeros = bytes.takeWhile(_ == 0).length
    var n = BigInt(1, bytes)
    val sb = new StringBuilder
    while (n > 0) { sb.append(Alphabet(((n % 58).toInt))); n /= 58 }
    ("1" * zeros) + sb.reverse.toString
  }

  def base58Decode(s: String): Option[Array[Byte]] = {
    // empty encodes the empty byte string; reject only non-alphabet chars
    if (!s.forall(AlphaIndex.contains)) None
    else {
      val zeros = s.takeWhile(_ == '1').length
      var n = BigInt(0)
      s.foreach(c => n = n * 58 + AlphaIndex(c))
      val body = n.toByteArray.dropWhile(_ == 0)
      Some(Array.fill[Byte](zeros)(0) ++ body)
    }
  }

  // --------------------------------------------------------------- ripemd160
  // Pure-Scala RIPEMD-160 (public algorithm, Dobbertin/Bosselaers/Preneel
  // 1996). The JDK has no provider for it and the classpath is fixed, so
  // the five-round compression is written out against the published
  // selection/rotation tables; spec-tested against the paper's vectors.

  private val RL = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13)
  private val RR = Array(
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11)
  private val SL = Array(
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6)
  private val SR = Array(
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11)
  private val KL = Array(0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E)
  private val KR = Array(0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000)

  @inline private def rotl(x: Int, n: Int): Int = (x << n) | (x >>> (32 - n))

  @inline private def f(j: Int, x: Int, y: Int, z: Int): Int = (j / 16) match {
    case 0 => x ^ y ^ z
    case 1 => (x & y) | (~x & z)
    case 2 => (x | ~y) ^ z
    case 3 => (x & z) | (y & ~z)
    case _ => x ^ (y | ~z)
  }

  def ripemd160(message: Array[Byte]): Array[Byte] = {
    // MD-style padding: 0x80, zeros, 64-bit little-endian bit length
    val bitLen = message.length.toLong * 8
    val padLen = {
      val rem = (message.length + 1) % 64
      if (rem <= 56) 56 - rem + 1 else 64 - rem + 56 + 1
    }
    val padded = new Array[Byte](message.length + padLen + 8)
    System.arraycopy(message, 0, padded, 0, message.length)
    padded(message.length) = 0x80.toByte
    var i = 0
    while (i < 8) {
      padded(padded.length - 8 + i) = ((bitLen >>> (8 * i)) & 0xff).toByte
      i += 1
    }

    var h0 = 0x67452301; var h1 = 0xEFCDAB89; var h2 = 0x98BADCFE
    var h3 = 0x10325476; var h4 = 0xC3D2E1F0

    val x = new Array[Int](16)
    var block = 0
    while (block < padded.length / 64) {
      var w = 0
      while (w < 16) {
        val o = block * 64 + w * 4
        x(w) = (padded(o) & 0xff) | ((padded(o + 1) & 0xff) << 8) |
          ((padded(o + 2) & 0xff) << 16) | ((padded(o + 3) & 0xff) << 24)
        w += 1
      }
      var al = h0; var bl = h1; var cl = h2; var dl = h3; var el = h4
      var ar = h0; var br = h1; var cr = h2; var dr = h3; var er = h4
      var j = 0
      while (j < 80) {
        var t = rotl(al + f(j, bl, cl, dl) + x(RL(j)) + KL(j / 16), SL(j)) + el
        al = el; el = dl; dl = rotl(cl, 10); cl = bl; bl = t
        t = rotl(ar + f(79 - j, br, cr, dr) + x(RR(j)) + KR(j / 16), SR(j)) + er
        ar = er; er = dr; dr = rotl(cr, 10); cr = br; br = t
        j += 1
      }
      val t = h1 + cl + dr
      h1 = h2 + dl + er; h2 = h3 + el + ar; h3 = h4 + al + br
      h4 = h0 + bl + cr; h0 = t
      block += 1
    }

    val out = new Array[Byte](20)
    val hs = Array(h0, h1, h2, h3, h4)
    i = 0
    while (i < 20) { out(i) = ((hs(i / 4) >>> (8 * (i % 4))) & 0xff).toByte; i += 1 }
    out
  }

  // ------------------------------------------------------- key-form handling

  private def checksum(payload: Array[Byte], suffix: String): Array[Byte] =
    ripemd160(payload ++ suffix.getBytes("UTF-8")).take(4)

  /** Encode 33 payload bytes in the legacy `<prefix>…` form. */
  def encodeLegacy(payload: Array[Byte], prefix: String = "EOS"): String =
    prefix + base58Encode(payload ++ checksum(payload, ""))

  /** Generic base58check encode: `prefix + base58(payload ++
    * ripemd160(payload ++ suffix).take(4))` — the shared shape of every
    * `PUB_K1_`/`PUB_R1_`/`SIG_K1_`/`SIG_R1_` string form.
    */
  def encodeChecked(prefix: String, payload: Array[Byte], suffix: String): String =
    prefix + base58Encode(payload ++ checksum(payload, suffix))

  /** Generic base58check decode to exactly `payloadLen` payload bytes,
    * validating the 4-byte ripemd160 checksum.
    */
  def decodeChecked(s: String, prefix: String, suffix: String,
      payloadLen: Int): Option[Array[Byte]] =
    if (!s.startsWith(prefix)) None
    else base58Decode(s.stripPrefix(prefix)).collect {
      case raw if raw.length == payloadLen + 4 &&
        java.util.Arrays.equals(raw.drop(payloadLen),
          checksum(raw.take(payloadLen), suffix)) =>
        raw.take(payloadLen)
    }

  /** Encode 33 payload bytes in the canonical `PUB_K1_…` form. */
  def encodeK1(payload: Array[Byte]): String =
    "PUB_K1_" + base58Encode(payload ++ checksum(payload, "K1"))

  private def decodeWith(body: String, suffix: String): Option[Array[Byte]] =
    base58Decode(body).collect {
      case raw if raw.length == 37 &&
        java.util.Arrays.equals(raw.drop(33), checksum(raw.take(33), suffix)) =>
        raw.take(33)
    }

  /** Decode either form to the 33 payload bytes, validating the checksum
    * (a wrong checksum — or a corrupted ripemd160 — rejects the key).
    */
  def decode(key: String, legacyPrefix: String = "EOS"): Option[Array[Byte]] =
    if (key.startsWith("PUB_K1_")) decodeWith(key.stripPrefix("PUB_K1_"), "K1")
    else if (key.startsWith(legacyPrefix))
      decodeWith(key.stripPrefix(legacyPrefix), "")
    else None

  /** Canonical `PUB_K1_…` form of a key in either form. */
  def normalize(key: String, legacyPrefix: String = "EOS"): Option[String] =
    decode(key, legacyPrefix).map(encodeK1)

  /** Legacy `<prefix>…` form of a key in either form. */
  def toLegacy(key: String, legacyPrefix: String = "EOS"): Option[String] =
    decode(key, legacyPrefix).map(encodeLegacy(_, legacyPrefix))
}
