package graft.exprs

import org.apache.spark.unsafe.types.UTF8String

/** The kernel-side twin of [[graft.operators.Split.hashDraw32]]: first 4
  * bytes of md5 over UTF-8 bytes as an unsigned 32-bit value — exactly
  * `conv(substring(md5(cast(s AS binary)), 1, 8), 16, 10)`. md5 is a
  * standard, so ANY engine (the DuckDB oracle included) reproduces the
  * draw bit-for-bit; the repo's native hash kernels accept it as an
  * alternative base hash so their full pipelines gain hash-verifiable
  * oracle twins (xxhash64 stays the production default — faster, but
  * engine-specific).
  */
object Md5Draw {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry for generated code. */
  def draw32(s: UTF8String): Long = {
    val b = s.getBytes
    draw32(b, 0, b.length)
  }

  def draw32(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = mdLocal.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
