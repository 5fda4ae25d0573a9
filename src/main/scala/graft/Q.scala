package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions}
import org.apache.spark.sql.types.DecimalType

/** One named query in the engine's declared surface (SURVEY.md §2B): a
  * Spark implementation plus, when SQL-expressible, an equivalent DuckDB
  * oracle query the driver hash-compares against (SURVEY.md §5.1).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.nonEmpty)
}

object Q {
  /** Oracle-checked query. */
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql.stripMargin.trim))

  /** Rows-only checked query (not expressible in portable SQL). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}

/** A bundle of queries implementing one slice of SURVEY.md §2. */
trait QueryPack {
  def queries: Seq[Q]

  /** Deterministic total order for a GROUP-BOUNDED output (r12 §4,
    * widened in r13): a final global orderBy pays a range-sampling pass
    * (which re-runs the final stage) plus a range exchange even for a
    * handful of group rows. One shuffle of the already-small result to a
    * single partition + in-partition sort gives the same total order in
    * one pass. Apply ONLY where the output is bounded by group
    * cardinality (flags, statuses, nations, event types, fixed metric
    * pairs, probe sets) — corpus- or timespan-scaled outputs keep the
    * scalable range sort, and every converted entry must name itself in
    * PlanAuditSpec's single-partition-funnel allowlist.
    */
  protected def boundedSort(df: DataFrame,
      cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}

/** Exact-arithmetic helpers for oracle determinism (SURVEY.md §7.5):
  * inputs are cast to decimals wide enough to hold their true scale, so
  * sums/products are exact and independent of evaluation order in both
  * Spark and DuckDB. Doubles appear in outputs only as the result of a
  * single IEEE-deterministic division of exact values, re-rounded to a
  * decimal.
  */
object Dec {
  /** money-ish column with 2 true decimals (prices, balances, values). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** small factor like (1-discount), (1+tax): 2 true decimals, < 100. */
  def factor(c: Column): Column = c.cast(DecimalType(4, 2))
  /** generic 4-decimal cast used for final outputs. */
  def d4(c: Column): Column = c.cast(DecimalType(18, 4))
  /** wide lossless cast for sums of products (true scale <= 6). */
  def w6(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Hash-stable rendering of an exact decimal: value × 10^scale as BIGINT.
    * Integer outputs hash identically across engines, unlike decimals whose
    * textual scale (trailing zeros) differs between Spark and DuckDB
    * (VERDICT r1: all 13 hash fails were representation-only).
    *
    * Exactness: the input is bounded to DECIMAL(28, scale) — ample for any
    * verified measure, |value| < 10^(28-scale) ≥ 10^20 — and the multiplier
    * is a DECIMAL(scale+1, 0) literal, so the product type is
    * DECIMAL(30+scale, scale) ≤ precision 38: no rounding and no overflow.
    * The former (38, scale) cast could exceed precision 38 on multiply,
    * which non-ANSI Spark nulls SILENTLY while DuckDB promotes to HUGEINT —
    * a scale-dependent divergence (ADVICE r2).
    * Oracle mirror: CAST(CAST(expr AS DECIMAL(38,s)) * 10^s AS BIGINT).
    */
  def asLong(c: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 8, s"asLong scale $scale outside exact range 0..8")
    val pow10 = functions.lit(new java.math.BigDecimal(java.math.BigInteger.TEN.pow(scale)))
    (c.cast(DecimalType(28, scale)) * pow10).cast("long")
  }
}
