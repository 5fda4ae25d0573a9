package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass kernels for the shingling pipelines (guide §1.2
  * "per-task work": the interpreted HOF chain paid per-element lambda
  * dispatch plus an intermediate 32-char hex UTF8String and a CONV
  * string-parse per shingle). Standalone object (no companion class) so
  * scalac emits STATIC forwarders the generated janino code can call.
  *
  * Value parity with the HOFs, by construction:
  *  - trigrams replicate `array_distinct(transform(sequence(0, size(w)-3),
  *    i -> concat_ws(' ', w[i], w[i+1], w[i+2])))` — UTF8String.concatWs
  *    IS concat_ws (same null skipping), same first-occurrence distinct
  *    order, same empty result under 3 tokens / on a NULL array;
  *  - xxhash64 calls the very static Spark's xxhash64 codegen calls
  *    (XXH64.hashUnsafeBytes, seed 42);
  *  - md5 slices the DIGEST BYTES exactly as the hex path did:
  *    h1 = hex chars 1-15 = (b0..b6 << 4) | (b7 >>> 4);
  *    h2 = hex chars 16-30 mod 2^56 = b8..b14 — the HOF's mod exactly
  *    cancels b7's low-nibble 2^56 contribution.
  *  (Asserted against the live HOFs in NativeFnSpec.)
  */
object ShingleKernel {
  private val Space = UTF8String.fromString(" ")

  private def trigrams(a: ArrayData): java.util.ArrayList[UTF8String] = {
    val out = new java.util.ArrayList[UTF8String]()
    if (a == null) return out
    val n = a.numElements()
    if (n < 3) return out
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i <= n - 3) {
      val t = UTF8String.concatWs(Space,
        if (a.isNullAt(i)) null else a.getUTF8String(i),
        if (a.isNullAt(i + 1)) null else a.getUTF8String(i + 1),
        if (a.isNullAt(i + 2)) null else a.getUTF8String(i + 2))
      if (seen.add(t)) out.add(t)
      i += 1
    }
    out
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def shingles(a: ArrayData): ArrayData = {
    val ts = trigrams(a)
    val out = new Array[Long](ts.size)
    var i = 0
    while (i < out.length) {
      val t = ts.get(i)
      out(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def minhashHs(a: ArrayData): ArrayData = {
    val ts = trigrams(a)
    val md = md5Local.get()
    val out = new Array[Any](ts.size)
    var i = 0
    while (i < out.length) {
      md.reset()
      val d = md.digest(ts.get(i).getBytes)
      var h1 = 0L
      var j = 0
      while (j < 7) { h1 = (h1 << 8) | (d(j) & 0xffL); j += 1 }
      h1 = (h1 << 4) | ((d(7) & 0xffL) >>> 4)
      var h2 = 0L
      j = 8
      while (j < 15) { h2 = (h2 << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = InternalRow(h1, h2)
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] abstract class ShingleExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
  override def nullable: Boolean = false
  protected def kernelMethod: String
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val a = if (v == null) null else v.asInstanceOf[ArrayData]
    if (kernelMethod == "shingles") ShingleKernel.shingles(a)
    else ShingleKernel.minhashHs(a)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      s"""
         |${classOf[ArrayData].getName} ${ev.value} =
         |  graft.functions.ShingleKernel.$kernelMethod(
         |    ${childGen.isNull} ? null : ${childGen.value});
       """.stripMargin
    ev.copy(code = code"${childGen.code}$resultCode", isNull = FalseLiteral)
  }
}

/** `graft_shingles(w: array<string>) -> array<bigint>` — the distinct
  * 3-word shingles of the token array, xxhash64-hashed, one native pass.
  */
case class Shingles(child: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def kernelMethod: String = "shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingles"
}

/** `graft_minhash_hs(w: array<string>) -> array<struct<h1,h2>>` — the
  * Kirsch–Mitzenmacher hash-pair array of the distinct 3-word shingles,
  * md5 computed once per shingle on digest bytes (no hex, no CONV).
  */
case class MinHashHs(child: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))), containsNull = false)
  override protected def kernelMethod: String = "minhashHs"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_hs"
}
