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
  * structure in Parquet (split-block bloom filters, spec §Bloom filter);
  * here the filter lives in the commit log's per-file metadata, next to
  * the min/max bounds, so scan planning consults it without opening any
  * data file.
  *
  * Shape: m = 8192 bits (1 KiB/file/column), k = 4 — ~0.24% false
  * positives at 1000 distinct values/file, still <3% at 4000. A false
  * positive only costs an extra file open (the residual filter discards
  * the rows); a false NEGATIVE would lose rows, so both sides must hash
  * identically: the write side hashes `cast(col AS STRING)` through
  * Spark's md5, and the probe side replays the same md5 on the same
  * rendering (probe positions are only attached when the probe's type
  * matches the column's — see GraftTable.eqPrunes — because e.g. a
  * DOUBLE's cast rendering "150.0" differs from an INT's "150").
  */
object Bloom {
  /** filter width in bits; 2^16 % M == 0 so the 16-bit md5 prefix maps
    * uniformly.
    */
  val M = 8192
  /** hash functions per value. */
  val K = 4

  /** bit positions of rendered value `v` — the driver-side twin of
    * [[GraftTable.bloomPosColumns]]'s SQL: position i is the first 16
    * bits of md5("$i:$v"), mod M.
    */
  def positions(v: String): Seq[Int] =
    (0 until K).map { i =>
      val d = MessageDigest.getInstance("MD5")
        .digest(s"$i:$v".getBytes(StandardCharsets.UTF_8))
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % M
    }

  /** pack set bit positions into a base64 bitset (M/8 bytes). */
  def encode(pos: Iterable[Int]): String = {
    val bytes = new Array[Byte](M / 8)
    pos.foreach { p =>
      require(p >= 0 && p < M, s"bloom position out of range: $p")
      bytes(p >> 3) = (bytes(p >> 3) | (1 << (p & 7))).toByte
    }
    Base64.getEncoder.encodeToString(bytes)
  }

  /** may the encoded filter contain a value with these positions? False
    * means DEFINITELY absent — the prune contract.
    */
  def mightContain(encoded: String, pos: Seq[Int]): Boolean = {
    val bytes = Base64.getDecoder.decode(encoded)
    pos.forall(p => (bytes(p >> 3) & (1 << (p & 7))) != 0)
  }
}
