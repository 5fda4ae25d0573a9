package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew mitigation patterns (SURVEY scale doctrine): when one key holds
  * most of the rows, the plain keyed shuffle pins that key's entire
  * volume on one task. Salting splits the hot key across SALT subtasks —
  * these tests pin the *correctness* of both patterns (they must be
  * drop-in equivalent to the unsalted plans) on a 90%-skewed dataset.
  */
class SkewSaltingSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  private val SALT = 8

  // 100k rows, 90% on key 0 — the hot-key shape
  private def skewed = spark.range(100000)
    .select(when(col("id") < 90000, 0L).otherwise(col("id")).as("key"),
      (col("id") % 97).as("v"))

  test("two-phase salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // phase 1 aggregates (key, salt) — the hot key spreads over SALT
    // tasks; phase 2 merges the SALT partials per key. Counts/sums are
    // associative so the split is exact.
    val salted = skewed.withColumn("salt", pmod(hash(col("v"), col("key")), lit(SALT)))
      .groupBy("key", "salt")
      .agg(count(lit(1)).as("pn"), sum("v").as("ps"))
      .groupBy("key")
      .agg(sum("pn").as("n"), sum("ps").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted broadcast-side-expanded join equals the plain join") {
    val dim = spark.range(200).select(col("id").as("key"),
      concat(lit("d"), col("id")).as("payload"))
    val direct = skewed.join(dim, "key")
      .groupBy("key").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // fact side gets a random-ish but DETERMINISTIC salt; the dim side is
    // exploded once per salt value so every (key, salt) bucket finds its
    // match — the hot key's probe work spreads over SALT tasks.
    val factSalted = skewed.withColumn("salt", pmod(hash(col("v"), col("key")), lit(SALT)))
    val dimSalted = dim.withColumn("salt", explode(array((0 until SALT).map(lit): _*)))
    val salted = factSalted.join(dimSalted, Seq("key", "salt"))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == direct)
  }
}
