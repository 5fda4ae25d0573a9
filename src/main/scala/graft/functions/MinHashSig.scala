package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All 16 MinHash signature minimums in ONE pass over the per-document
  * hash array — a native codegen replacement for the interpreted
  * `transform(sequence(0,15), j -> array_min(transform(hs, p -> p.h1 +
  * j*p.h2)))` pipeline, which walks the array 16 times through
  * per-element lambda dispatch. Input: `array<struct<h1:bigint,
  * h2:bigint>>` (Kirsch–Mitzenmacher double hashing: g_j = h1 + j·h2).
  * Output: `array<bigint>` of length 16; element j is null when no
  * non-null entry contributed (empty array — matching array_min's
  * null-on-empty), so the banding stage behaves identically.
  *
  * Arithmetic is plain wrapping long addition — bit-identical to the
  * higher-order form and to the DuckDB oracle's list_transform replay,
  * so q_dedup_minhash's CORRECTNESS rows are unaffected. A NULL input
  * array also matches the HOF exactly: transform(sequence(0,15), ...)
  * over a null hs yields [null × 16], not NULL — so this expression is
  * never null (its ELEMENTS are nullable).
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  private val Bands = 16

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField("h1", LongType, _, _), StructField("h2", LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<h1:bigint,h2:bigint>>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullable: Boolean = false

  private lazy val allNull: GenericArrayData =
    new GenericArrayData(Array.fill[Any](Bands)(null))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) allNull else compute(v.asInstanceOf[ArrayData])
  }

  private def compute(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    val mins = new Array[Long](Bands)
    val has = new Array[Boolean](Bands)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val r = a.getStruct(i, 2)
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val h2 = r.getLong(1)
          var g = r.getLong(0)
          var j = 0
          while (j < Bands) {
            if (!has(j) || g < mins(j)) { mins(j) = g; has(j) = true }
            g += h2 // g_j = h1 + j*h2, wrapping like the HOF long arithmetic
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(Array.tabulate[Any](Bands)(j =>
      if (has(j)) java.lang.Long.valueOf(mins(j)) else null))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val allNullRef =
      ctx.addReferenceObj("mhAllNull", allNull, classOf[GenericArrayData].getName)
    val n = ctx.freshName("mhN")
    val mins = ctx.freshName("mhMins")
    val has = ctx.freshName("mhHas")
    val i = ctx.freshName("mhI")
    val j = ctx.freshName("mhJ")
    val r = ctx.freshName("mhRow")
    val g = ctx.freshName("mhG")
    val h2 = ctx.freshName("mhH2")
    val out = ctx.freshName("mhOut")
    val a = childGen.value
    val resultCode =
      s"""
         |${classOf[ArrayData].getName} ${ev.value};
         |if (${childGen.isNull}) {
         |  ${ev.value} = $allNullRef;
         |} else {
         |  int $n = $a.numElements();
         |  long[] $mins = new long[$Bands];
         |  boolean[] $has = new boolean[$Bands];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      ${classOf[InternalRow].getName} $r = $a.getStruct($i, 2);
         |      if (!$r.isNullAt(0) && !$r.isNullAt(1)) {
         |        long $h2 = $r.getLong(1);
         |        long $g = $r.getLong(0);
         |        for (int $j = 0; $j < $Bands; $j++) {
         |          if (!$has[$j] || $g < $mins[$j]) { $mins[$j] = $g; $has[$j] = true; }
         |          $g += $h2;
         |        }
         |      }
         |    }
         |  }
         |  Object[] $out = new Object[$Bands];
         |  for (int $j = 0; $j < $Bands; $j++) {
         |    $out[$j] = $has[$j] ? (Object) java.lang.Long.valueOf($mins[$j]) : null;
         |  }
         |  ${ev.value} = new ${classOf[GenericArrayData].getName}($out);
         |}
       """.stripMargin
    ev.copy(code = code"${childGen.code}$resultCode", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}
