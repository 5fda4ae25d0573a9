package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays — a Catalyst `Expression`
  * with whole-stage codegen, replacing the interpreted
  * `aggregate(zip_with(...))` higher-order pipeline in the vector
  * operators (SURVEY preference order: native Expression > HOF > UDF).
  * The generated code is a tight primitive loop — no per-element lambda
  * dispatch, no boxing, and it keeps the surrounding stage inside one
  * codegen span.
  *
  * Accepts float and double arrays in either position (embeddings are
  * array<float>, the LSH hyperplanes are array<double> literals).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>/array<double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // null ELEMENTS contribute 0 to the sum (same in both eval paths);
  // null ARRAYS propagate null via the nullSafe wrappers.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh identifiers: two VecDots in one codegen scope (e.g. a product
    // of dot products over non-nullable children, where nullSafeCodeGen
    // adds no isolating block) must not redeclare the same variables
    val n = ctx.freshName("vdN")
    val acc = ctx.freshName("vdAcc")
    val i = ctx.freshName("vdI")
    val getL = if (isFloat(left)) (v: String) => s"(double) $v.getFloat($i)"
               else (v: String) => s"$v.getDouble($i)"
    val getR = if (isFloat(right)) (v: String) => s"(double) $v.getFloat($i)"
               else (v: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${getL(a)} * ${getR(b)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vecdot"
}

/** Session registration for the engine's native functions. Idempotent —
  * safe to call per query build (the driver may hand us a session built
  * without extensions).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vecdot",
      (children: Seq[Expression]) => VecDot(children(0), children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      (children: Seq[Expression]) => MinHashSig(children(0)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_packed_pairs",
      (children: Seq[Expression]) => PackedPairs(children(0)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      (children: Seq[Expression]) => Shingles(children(0)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_hs",
      (children: Seq[Expression]) => MinHashHs(children(0)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_h60",
      (children: Seq[Expression]) => H60(children(0)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gram_h60",
      (children: Seq[Expression]) => GramH60(children(0), children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_ngrams",
      (children: Seq[Expression]) => CharNgrams(children(0), children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lines",
      (children: Seq[Expression]) => FixedLines(children(0), children(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_word_grams",
      (children: Seq[Expression]) => WordGrams(children(0), children(1)),
      "scala_udf")
  }
}

/** Production wiring: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) registers the
  * engine's native functions at session build — the
  * SparkSessionExtensions path for clusters the engine doesn't
  * bootstrap itself. The harness uses GraftFunctions.register instead
  * because the driver hands us an already-built session.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_vecdot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDot].getCanonicalName, "graft_vecdot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_sig"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashSig].getCanonicalName, "graft_minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_packed_pairs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PackedPairs].getCanonicalName, "graft_packed_pairs"),
      (children: Seq[Expression]) => PackedPairs(children(0))))
    // the extensions path must expose the SAME function set as
    // GraftFunctions.register — DedupQueries requires these two, and an
    // extensions-only session would otherwise fail analysis (ADVICE r12)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Shingles].getCanonicalName, "graft_shingles"),
      (children: Seq[Expression]) => Shingles(children(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_hs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashHs].getCanonicalName, "graft_minhash_hs"),
      (children: Seq[Expression]) => MinHashHs(children(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_h60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[H60].getCanonicalName, "graft_h60"),
      (children: Seq[Expression]) => H60(children(0))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_gram_h60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[GramH60].getCanonicalName, "graft_gram_h60"),
      (children: Seq[Expression]) => GramH60(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_char_ngrams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CharNgrams].getCanonicalName, "graft_char_ngrams"),
      (children: Seq[Expression]) => CharNgrams(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lines"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FixedLines].getCanonicalName, "graft_lines"),
      (children: Seq[Expression]) => FixedLines(children(0), children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_word_grams"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WordGrams].getCanonicalName, "graft_word_grams"),
      (children: Seq[Expression]) => WordGrams(children(0), children(1))))
  }
}
