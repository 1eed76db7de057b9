package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 60-bit hash computable bit-identically by Spark AND by the ANSI-SQL
  * oracle engines (DuckDB): the integer value of the first 15 hex chars
  * of `md5(utf8_bytes(x))`.
  *
  * Spark-side: `conv(substring(md5(x), 1, 15), 16, 10)` (built-ins only,
  * codegen'd). DuckDB-side: `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  * 15 nibbles = 60 bits keeps every value positive in a signed 64-bit
  * integer on both engines, so no unsigned/overflow divergence exists.
  *
  * This is the hash to use whenever the VALUE (not just the
  * distribution) of a hash is output-visible or seeds an output-visible
  * choice — e.g. SimHash fingerprints, IVF centroid sampling,
  * pseudo-coordinates. For purely internal keys (shuffle spread,
  * fingerprint collapse) prefer `xxhash64`, which is faster and
  * 64-bit. */
object PortableHash {

  /** 60-bit md5 hash of the UTF-8 bytes of `c` rendered as a string.
    * Numeric inputs hash their decimal rendering, which DuckDB's
    * `c::VARCHAR` reproduces exactly for integers. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** The DuckDB spelling of [[md5Hash60]] over SQL expression `e`
    * (already a VARCHAR — cast integer columns with `::VARCHAR`). */
  def md5Hash60Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Per-thread MD5 instance for the JVM-side scalar — MessageDigest is
    * not thread-safe and allocating one per ROW costs ~40% of the
    * simhash projection, so native Expressions fetch this once per
    * eval. `digest()` resets the instance, so reuse is sound. */
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5ThreadLocal: java.security.MessageDigest = mdLocal.get()

  /** JVM-side scalar identical to [[md5Hash60]] — for native
    * Expressions that fold many token hashes per row. */
  def md5Hash60(token: String, md: java.security.MessageDigest): Long = {
    val d = md.digest(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}
