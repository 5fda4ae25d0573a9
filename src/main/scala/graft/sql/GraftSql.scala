package graft.sql

import graft.table.GraftCatalog

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

/** SQL text front end over the graft table layer — the BI/notebook entry
  * path for GOVERNED tables, completing what `sqlOverViews` gives the raw
  * parquet surface. The reference serves its Iceberg tables to plain
  * `spark.sql` through the Iceberg catalog plugin (docker-compose.yml:
  * 58-81, spark-defaults.conf catalog wiring); this is that capability
  * re-expressed over [[graft.table.GraftCatalog]]:
  *
  * {{{
  *   GraftSql.sql(spark, cat, "SELECT * FROM graft.ns.tbl WHERE ...")
  *   GraftSql.sql(spark, cat, "SELECT count(*) FROM graft.ns.tbl VERSION AS OF 3")
  *   GraftSql.sql(spark, cat, "SELECT ... FROM graft.ns.tbl TIMESTAMP AS OF '2024-01-02 00:00:00'")
  *   GraftSql.sql(spark, cat, "INSERT INTO graft.ns.tbl SELECT ...")
  * }}}
  *
  * Architecture: parse with the session's OWN parser (the grammar already
  * understands time travel for any relation), then substitute every
  * `graft.*`-prefixed relation — wherever it appears: joins, subqueries,
  * CTEs, the INSERT source — with the table's analyzed merge-on-read
  * DataFrame plan at the requested snapshot, and hand the tree back to
  * the analyzer. This is exactly how temp-view expansion works inside
  * Spark, so self-joins deduplicate attribute ids, column pruning and
  * filter pushdown reach the snapshot's parquet scans, and EVERY read
  * goes through [[graft.table.GraftTable.read]] — deletion vectors,
  * equality/positional deletes, row filters and schema evolution apply
  * identically to SQL and Scala callers. (A DataSourceV2 TableCatalog
  * could resolve the NAME, but its read path would bypass the MoR
  * semantics — a raw file scan serves deleted rows. The plan-substitution
  * front end is the design that cannot drift from the Scala read path.)
  *
  * Scale: resolution cost is metadata-sized (one log fold per referenced
  * snapshot); the data-plane plan is the same one `read()` builds, so
  * everything the plan audit pins for table reads holds for SQL too.
  */
object GraftSql {

  /** Run one SQL statement. SELECT (with joins/subqueries/CTEs/time
    * travel) returns the query result; INSERT INTO runs eagerly and
    * returns a 1-row commit summary (table, rows_appended, new_version).
    * Relations resolve as `<prefix>.<namespace>.<table>` or
    * `<prefix>.<table>` (namespace "default").
    */
  def sql(spark: SparkSession, cat: GraftCatalog, text: String,
      prefix: String = "graft"): DataFrame = {
    SparkShims.parsePlan(spark, text) match {
      case ins: InsertIntoStatement =>
        val ident = ins.table match {
          case u: UnresolvedRelation if isGraft(u.multipartIdentifier, prefix) =>
            u.multipartIdentifier
          case other => throw new IllegalArgumentException(
            s"INSERT target is not a $prefix.* table: $other")
        }
        require(ins.partitionSpec.isEmpty && ins.userSpecifiedCols.isEmpty &&
            !ins.overwrite && !ins.ifPartitionNotExists,
          "only plain `INSERT INTO <table> <query>` is supported " +
            "(no PARTITION clause, column list, or OVERWRITE)")
        val (ns, tbl) = splitIdent(ident, prefix)
        val t = cat.openTable(ns, tbl)
        // append() conforms the batch to the table's current schema by
        // NAME (widening as needed) — SQL INSERT here is by-name, the
        // unambiguous contract for evolved schemas
        val src = SparkShims.ofRows(spark, substitute(spark, cat, ins.query, prefix))
        val n = src.count()
        val seq = t.append(src)
        spark.createDataFrame(
          java.util.List.of(Row(s"$ns.$tbl", n, seq)),
          StructType(Seq(StructField("table", StringType, nullable = false),
            StructField("rows_appended", LongType, nullable = false),
            StructField("new_version", LongType, nullable = false))))
      case plan =>
        SparkShims.ofRows(spark, substitute(spark, cat, plan, prefix))
    }
  }

  /** Replace every graft relation in the tree (and in subquery
    * expressions) with its snapshot's analyzed read plan. transformDown
    * so a RelationTimeTravel parent claims its child UnresolvedRelation
    * before a bottom-up pass could rewrite the child to a head read.
    */
  private def substitute(spark: SparkSession, cat: GraftCatalog,
      plan: LogicalPlan, prefix: String): LogicalPlan = {
    val relsDone = plan.transformDown {
      case tt: RelationTimeTravel => tt.relation match {
        case u: UnresolvedRelation if isGraft(u.multipartIdentifier, prefix) =>
          readPlan(spark, cat, u.multipartIdentifier, prefix,
            tt.timestamp, tt.version)
        case other => tt // someone else's time travel — leave it alone
      }
      case u: UnresolvedRelation if isGraft(u.multipartIdentifier, prefix) =>
        readPlan(spark, cat, u.multipartIdentifier, prefix, None, None)
    }
    relsDone.transformAllExpressions {
      case se: SubqueryExpression =>
        se.withNewPlan(substitute(spark, cat, se.plan, prefix))
    }
  }

  private def isGraft(ident: Seq[String], prefix: String): Boolean =
    (ident.length == 2 || ident.length == 3) && ident.head == prefix

  private def splitIdent(ident: Seq[String], prefix: String): (String, String) =
    ident match {
      case Seq(`prefix`, ns, t) => (ns, t)
      case Seq(`prefix`, t) => ("default", t)
      case other => throw new IllegalArgumentException(
        s"not a $prefix table identifier: ${other.mkString(".")}")
    }

  private def readPlan(spark: SparkSession, cat: GraftCatalog,
      ident: Seq[String], prefix: String,
      ts: Option[Expression], ver: Option[String]): LogicalPlan = {
    val (ns, tbl) = splitIdent(ident, prefix)
    val t = cat.openTable(ns, tbl)
    val df = (ts, ver) match {
      case (None, None) => t.read()
      case (None, Some(v)) => t.read(asOf = java.lang.Long.parseLong(v))
      case (Some(e), None) => t.readAsOfTime(tsMillis(e))
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "specify VERSION AS OF or TIMESTAMP AS OF, not both")
    }
    df.queryExecution.analyzed
  }

  /** Evaluate a literal TIMESTAMP AS OF expression to epoch millis. The
    * session-timezone question doesn't arise: graft commit times are
    * wall-clock UTC millis and the cast pins UTC, so the SQL text means
    * the same instant everywhere.
    */
  private def tsMillis(e: Expression): Long = {
    val cast = Cast(e, TimestampType, Some("UTC"))
    require(e.foldable, s"TIMESTAMP AS OF must be a literal, got: ${e.sql}")
    cast.eval() match {
      case micros: java.lang.Long => micros / 1000L
      case null => throw new IllegalArgumentException(
        s"TIMESTAMP AS OF value does not parse as a timestamp: ${e.sql}")
    }
  }
}
