package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot-product Expression: interpreted and codegen'd paths,
  * mixed float/double inputs, null propagation, and codegen viability.
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
}
