package graft.table

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** Per-file bloom filters for point-read file skipping — the gap min/max
  * stats cannot close: un-compacted append epochs overlap on a
  * high-cardinality key (every epoch's [min, max] spans most of the
  * domain), so a point probe intersects every file's bounds and opens all
  * of them, while a bloom filter answers "definitely absent" per file and
  * prunes all but the containing epoch. Iceberg records the same
  * structure in Parquet (split-block bloom filters); here the filter
  * lives in the commit log's per-file metadata, next to the min/max
  * bounds, so scan planning consults it without opening any data file.
  * (At production manifest sizes the filters would move to sidecar files
  * — Iceberg's puffin — with the log keeping pointers; same seam.)
  *
  * Sizing: the width is chosen PER APPEND (power of two, default 2^17
  * bits = 16 KiB/file/column ≈ 0.2% false positives at 8k distinct
  * values/file, ~2.4% at 32k) and recovered from the encoded length at
  * probe time, so differently-sized epochs coexist in one table. A false
  * positive only costs an extra file open (the residual filter discards
  * the rows); a false NEGATIVE would lose rows, so both sides must hash
  * identically: the write side hashes `cast(col AS STRING)` through
  * Spark's md5 (see GraftTable.perFileBlooms), and the probe side
  * replays the same md5 on the same rendering — which is why probe
  * values only attach on exact type matches (a DOUBLE renders "150.0"
  * where an INT renders "150"; see GraftTable.eqPrunes).
  */
object Bloom {
  /** default filter width in bits (16 KiB encoded). */
  val DefaultM = 1 << 17
  /** hash functions per value. */
  val K = 4

  /** bit positions of rendered value `v` in an `m`-bit filter — the
    * driver-side twin of the write-side SQL: position i is the first 32
    * bits (8 hex chars) of md5("$i:$v"), mod m (uniform: m is a power of
    * two and 2^32 divides into it evenly).
    */
  def positions(v: String, m: Int): Seq[Int] = {
    require(m > 0 && (m & (m - 1)) == 0, s"bloom width must be a power of two: $m")
    (0 until K).map { i =>
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$i:$v".getBytes(StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      (h % m).toInt
    }
  }

  /** pack set bit positions into a base64 bitset of `m` bits. */
  def encode(pos: Iterable[Int], m: Int): String = {
    val bytes = new Array[Byte](m / 8)
    pos.foreach { p =>
      require(p >= 0 && p < m, s"bloom position out of range: $p / $m")
      bytes(p >> 3) = (bytes(p >> 3) | (1 << (p & 7))).toByte
    }
    Base64.getEncoder.encodeToString(bytes)
  }

  /** may the encoded filter contain rendered value `v`? The filter's own
    * width (encoded length × 8) drives the probe, so filters written at
    * different sizes all answer correctly. False means DEFINITELY absent
    * — the prune contract.
    */
  def mightContain(encoded: String, v: String): Boolean = {
    val bytes = Base64.getDecoder.decode(encoded)
    positions(v, bytes.length * 8)
      .forall(p => (bytes(p >> 3) & (1 << (p & 7))) != 0)
  }
}
