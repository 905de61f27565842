package graft.extra

import java.security.MessageDigest
import java.nio.charset.StandardCharsets

/** Portable deterministic string hashing for dedup sketches (MinHash /
  * SimHash). Derived from MD5 so the SAME values are computable in any
  * engine (DuckDB: md5(); Spark SQL: md5()) — no JVM-private hash seeds.
  * We take the top 60 bits of the digest (fits a signed 64-bit int in
  * every engine).
  */
object PortableHash {
  /** Top-60-bits of md5(s) as a non-negative Long (matches
    * `CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)`-style SQL). */
  def md5_60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = first 7.5 bytes
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = d(i) & 0xff
      v = if (i < 7) (v << 8) | b else (v << 4) | (b >>> 4)
      i += 1
    }
    v
  }

  /** Full lowercase-hex md5 (mirror of SQL md5()). */
  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
}
