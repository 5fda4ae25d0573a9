package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity pins for the r12 native expressions: each must be bit-identical
  * to the interpreted HOF pipeline it replaced, on REAL corpus text
  * (punctuation, unicode, empty tokens from double spaces included) plus
  * edge shapes (under-3-token docs). A native twin that drifts from its
  * HOF silently changes dedup candidates — these pins make that a test
  * failure instead of an oracle surprise.
  */
class NativeFnSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpus = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .unionByName(spark.createDataFrame(Seq(
        (100001L, ""), (100002L, "one"), (100003L, "two words"),
        (100004L, "exactly three words"), (100005L, "a  b   c d"),
        (100006L, "rep rep rep rep rep")))
        .toDF("doc_id", "text"))
      .withColumn("w", split(col("text"), " "))
  }

  test("graft_shingles equals the xxhash64-over-trigrams HOF") {
    val hof = expr(
      s"transform(${graft.queries.DedupQueries.trigramsExpr}, x -> xxhash64(x))")
    val diff = corpus
      .select(col("doc_id"), expr("graft_shingles(w)").as("native"), hof.as("hofv"))
      .filter(not(col("native") <=> col("hofv")))
      .count()
    assert(diff == 0L)
  }

  test("graft_minhash_hs equals the md5-hex CONV HOF") {
    val hof = expr(
      s"""transform(transform(${graft.queries.DedupQueries.trigramsExpr}, x -> md5(x)),
         |  h -> named_struct('h1', CAST(CONV(substring(h, 1, 15), 16, 10) AS BIGINT),
         |    'h2', CAST(CONV(substring(h, 16, 15), 16, 10) AS BIGINT) % 72057594037927936L))""".stripMargin)
    val diff = corpus
      .select(col("doc_id"), expr("graft_minhash_hs(w)").as("native"), hof.as("hofv"))
      // struct arrays: compare as casted json to dodge nullability-only
      // schema mismatches (the values are what must agree)
      .filter(to_json(col("native")) =!= to_json(col("hofv")))
      .count()
    assert(diff == 0L)
  }

  test("graft_packed_pairs equals the flatten/transform/slice HOF") {
    // pack 32-bit-domain values like the call site does (customer keys):
    // the HOF's ANSI multiply overflows on full 64-bit hashes, a domain
    // the query never feeds it
    val base = corpus
      .select(expr("transform(graft_shingles(w), x -> pmod(x, 1000000L))").as("cs0"))
      .select(expr("sort_array(cs0)").as("cs"))
    val hof = expr(
      """flatten(transform(cs, (x, i) ->
        |  transform(slice(cs, i + 2, size(cs)),
        |    y -> x * 4294967296L + y)))""".stripMargin)
    val diff = base
      .select(expr("graft_packed_pairs(cs)").as("native"), hof.as("hofv"))
      .filter(not(col("native") <=> col("hofv")))
      .count()
    assert(diff == 0L)
  }
}
