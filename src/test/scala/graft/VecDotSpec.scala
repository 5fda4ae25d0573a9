package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** fixtures for the MinHashSig codegen test: file-scope so the product
  * encoder gets a proper TypeTag.
  */
case class MhSoA(h1s: Seq[Long], h2s: Seq[Long])
case class MhDoc(hs: MhSoA)

/** The native dot-product and minhash-signature Expressions: interpreted
  * and codegen'd paths, mixed float/double inputs, null propagation, and
  * codegen viability.
  */
class VecDotSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  GraftFunctions.register(spark)

  test("float×float and float×double dot products are exact") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val v = df.select(call_function("graft_vecdot", col("a"), col("b"))).as[Double].head()
    assert(v == 32.0)
    val mixed = df.select(call_function("graft_vecdot", col("a"),
      array(lit(1.0), lit(0.5), lit(2.0)))).as[Double].head()
    assert(mixed == 1.0 + 1.0 + 6.0)
  }

  test("null inputs yield null, not a crash") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(call_function("graft_vecdot", col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    val df = Tables.embeddings(spark, SparkSessionFixture.sf)
      .select(call_function("graft_vecdot", col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_vecdot"), plan)
    // and produces correct norms vs a driver-side computation
    val got = df.as[Double].collect().take(5)
    val want = Tables.embeddings(spark, SparkSessionFixture.sf)
      .select("embedding").as[Array[Float]].collect().take(5)
      .map(v => v.map(x => x.toDouble * x.toDouble).sum)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("two dot products in one codegen scope compile (fresh variable names)") {
    // non-nullable literal children give nullSafeCodeGen no isolating
    // block — fixed identifiers would redeclare and break Janino,
    // silently falling back to interpreted execution
    val df = Seq(1).toDF("x").select(
      (call_function("graft_vecdot", array(lit(1.0f), lit(2.0f)), array(lit(3.0f), lit(4.0f))) *
        call_function("graft_vecdot", array(lit(5.0f)), array(lit(6.0f)))).as("p"))
    assert(df.as[Double].head() == 11.0 * 30.0)
  }

  test("null array elements contribute zero, not garbage") {
    val df = Seq((Seq(Some(1.0f), None, Some(3.0f)), Seq(Some(2.0f), Some(9.0f), Some(4.0f))))
      .toDF("a", "b")
    val v = df.select(call_function("graft_vecdot", col("a"), col("b"))).as[Double].head()
    assert(v == 2.0 + 0.0 + 12.0)
  }

  test("rejects non-array inputs at analysis") {
    val df = Seq((1, 2)).toDF("a", "b")
    val err = intercept[Exception] {
      df.select(call_function("graft_vecdot", col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  // ---- graft_minhash_sig: the one-pass signature Expression ----

  // the HOF form over the struct-of-arrays input (pair i = (h1s[i], h2s[i]))
  private val hofSig =
    "transform(sequence(0, 15), j -> array_min(zip_with(hs.h1s, hs.h2s, (a, b) -> a + j * b)))"

  test("graft_minhash_sig equals the 16-pass HOF form on random hash arrays") {
    // the pipeline's domain: h1 < 2^60, h2 < 2^56, so h1 + 15*h2 < 2^61
    // never overflows (DedupQueries scaladoc) — random inputs stay inside
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(
      Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextLong() & ((1L << 60) - 1), rnd.nextLong() & ((1L << 56) - 1))))
    val df = rows.toDF("raw")
      .select(expr(
        "named_struct('h1s', transform(raw, p -> p._1), 'h2s', transform(raw, p -> p._2))")
        .as("hs"))
    val both = df.select(
      call_function("graft_minhash_sig", col("hs")).as("native"),
      expr(hofSig).as("hof"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("graft_minhash_sig on empty arrays yields 16 nulls (array_min parity)") {
    val df = Seq(Tuple1(Seq.empty[(Long, Long)])).toDF("raw")
      .select(expr(
        "named_struct('h1s', transform(raw, p -> p._1), 'h2s', transform(raw, p -> p._2))")
        .as("hs"))
    val r = df.select(call_function("graft_minhash_sig", col("hs"))).collect().head
    val got = r.getSeq[Any](0)
    assert(got.length == 16 && got.forall(_ == null))
  }

  test("graft_minhash_sig on NULL arrays yields 16 nulls, not NULL (HOF parity)") {
    // transform(sequence(0,15), j -> array_min(zip_with(NULL, ...))) is
    // [null × 16], never NULL — the native form must match
    val df = Seq(Tuple1(Option.empty[Seq[(Long, Long)]])).toDF("raw")
      .select(expr(
        "named_struct('h1s', transform(raw, p -> p._1), 'h2s', transform(raw, p -> p._2))")
        .as("hs"))
    val r = df.select(call_function("graft_minhash_sig", col("hs"))).collect().head
    assert(!r.isNullAt(0))
    val got = r.getSeq[Any](0)
    assert(got.length == 16 && got.forall(_ == null))
  }

  test("graft_minhash_sig stays inside whole-stage codegen") {
    // hs must come from a SCAN: a foldable input is constant-folded, a
    // transform() in the projection is a CodegenFallback HOF that breaks
    // the span, and Project-over-LocalRelation is evaluated eagerly by
    // ConvertToLocalRelation — a parquet round-trip defeats all three
    val dir = java.nio.file.Files.createTempDirectory("mhsig").toString
    Seq(MhDoc(MhSoA(Seq(1, 3), Seq(2, 4)))).toDS()
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(call_function("graft_minhash_sig", col("hs")).as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_minhash_sig"), plan)
    // g_j: pair (1,2) → 1+2j always below pair (3,4) → 3+4j
    val sig = df.collect().head.getSeq[Long](0)
    assert(sig == (0 until 16).map(j => 1L + 2L * j))
  }
}
