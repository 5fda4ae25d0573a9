package graft

import java.nio.file.Files

import graft.sql.{GraftSql, TpchGoverned}
import graft.table.GraftCatalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** TPC-H through the SQL front end over GOVERNED tables (r10 verdict
  * #1): the q_sql_q* entries read temp views over raw parquet; GraftSql
  * reads graft tables through merge-on-read snapshot plans. Here the two
  * paths meet at real plan-shape complexity — the governed results must
  * be bit-identical to the temp-view entries, and the plan properties
  * that make these queries viable at 100 TB (pushdown and pruning
  * reaching the scan, dims broadcasting, no nested-loop fallback) must
  * hold THROUGH the substituted MoR plans, where the scan is the table
  * layer's snapshot read rather than a plain parquet relation.
  */
class GraftSqlTpchSpec extends AnyFunSuite {
  import SparkSessionFixture.{spark, sf}

  // one governed warehouse for the suite: CTAS all 7 tables via GraftSql
  private lazy val cat: GraftCatalog = {
    val c = GraftCatalog(spark,
      Files.createTempDirectory("graft_tpchspec").toString)
    TpchGoverned.load(spark, c, sf)
    c
  }

  private def governed(q: String): DataFrame = GraftSql.sql(spark, cat, q)

  private def entryRows(name: String): Seq[org.apache.spark.sql.Row] =
    SparkEntry.queries(name)(spark, sf).collect().toSeq

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("all 22 TPC-H texts + the recursive CTE over graft.tpch.* match " +
      "the raw-parquet entries row for row") {
    // the full parity sweep (r11 verdict #1): for the hand-tuned
    // DataFrame entries (Q2/Q11/Q15/Q16/Q17/Q20/Q21) the governed text
    // is the LITERAL correlated-subquery / nested-IN formulation — a
    // different PLAN of the same answer, which is exactly what proves
    // the governed path safe to swap in under existing BI SQL: plan
    // substitution has to survive the analyzer's decorrelation, which
    // rewrites the substituted MoR subplans into joins/aggregates the
    // statement never spelled
    val mismatches = TpchGoverned.all.flatMap { case (name, text) =>
      val g = governed(text).collect().toSeq
      val e = entryRows(name)
      if (g == e) None
      else Some(s"$name: governed ${g.size} rows vs entry ${e.size}; " +
        s"first diff: ${g.zipAll(e, null, null).find(p => p._1 != p._2)}")
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }

  test("Q1 pushdown and column pruning reach the MoR snapshot scan") {
    val p = planOf(governed(TpchGoverned.Q1))
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"),
      s"the shipdate predicate must reach the governed parquet scan:\n$p")
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty &&
      readSchemas.forall(l => !l.contains("l_comment") && !l.contains("l_orderkey")),
      s"unused lineitem columns must prune at the snapshot scan: $readSchemas")
  }

  test("Q5's star keeps broadcast dims and hash joins under the governed tables") {
    val p = planOf(governed(TpchGoverned.Q5))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"region/nation/supplier must broadcast, not shuffle:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"nested-loop fallback:\n$p")
    // the orders date window prunes at the governed orders scan
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"the date filter must push into the orders snapshot scan:\n$p")
  }

  test("Q4's EXISTS decorrelates to a semi join over the governed scans") {
    val p = planOf(governed(TpchGoverned.Q4))
    assert(p.contains("LeftSemi"),
      s"the EXISTS must plan as a LEFT SEMI join, never a row-multiplying inner:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop fallback under decorrelation:\n$p")
    // the quarter window still prunes at the governed orders scan
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"the date filter must push into the orders snapshot scan:\n$p")
  }

  test("Q19's OR-of-conjuncts keeps the hash equi-join and pushes the " +
      "brand disjunction to the part scan") {
    val p = planOf(governed(TpchGoverned.Q19))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the common p_partkey equi-key must keep the join hash-based:\n$p")
    // the part-only disjunction (brand OR brand OR brand) reaches the
    // substituted part scan as a pushed filter
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("Brand#12") && pushed.contains("Brand#34"),
      s"the brand disjunction must push into the part snapshot scan:\n$pushed")
  }

  test("Q17/Q2's correlated scalar subqueries decorrelate to aggregate " +
      "joins over the MoR scans (no nested-loop, no value blowup)") {
    for (q <- Seq(TpchGoverned.Q17, TpchGoverned.Q2)) {
      val p = planOf(governed(q))
      assert(!p.contains("CartesianProduct"),
        s"decorrelation must produce equi-joins on the correlation key:\n$p")
      // the part slice reaches the substituted part scan as pushed filters
      assert(p.contains("PushedFilters") && (p.contains("p_brand") || p.contains("p_type")),
        s"the part slice must push into the part snapshot scan:\n$p")
    }
  }

  test("governed reads stay MoR: a delete between runs changes Q1 through SQL") {
    // seed a throwaway governed copy, delete one flag, re-run Q1's
    // aggregate — the SQL path must see the equality delete (a raw file
    // scan would not). This is the semantic difference between name
    // resolution via DSv2 file scans and the plan-substitution front end.
    val t = cat.openTable("tpch", "lineitem")
    val before = governed(
      "SELECT COUNT(*) AS n FROM graft.tpch.lineitem").collect().head.getLong(0)
    import spark.implicits._
    t.delete(Seq("R").toDF("l_returnflag"), Seq("l_returnflag"))
    val after = governed(
      "SELECT COUNT(*) AS n FROM graft.tpch.lineitem").collect().head.getLong(0)
    val rFlag = governed(
      "SELECT COUNT(*) AS n FROM graft.tpch.lineitem WHERE l_returnflag = 'R'")
      .collect().head.getLong(0)
    assert(after < before && rFlag == 0L,
      "the equality delete must apply to every SQL read")
    t.rollbackTo(t.headSeq - 1) // restore for other tests (suite order safe)
  }

  test("governed Q5 stays snapshot-consistent under a LIVE maintenance " +
      "rotation on lineitem (r11 verdict #4)") {
    // a maintenance thread rotates content-PRESERVING rewrites on
    // graft.tpch.lineitem THROUGH THE SQL CALL SURFACE — binpack
    // compaction, sorted compaction, stats recompute, snapshot
    // expiration — while Q5 runs concurrently through GraftSql. The CALL
    // surface's expire default (3h orphan grace) is load-bearing here:
    // an in-flight reader's plan references the files that were live at
    // substitution time, and the grace keeps a just-replaced file on
    // disk until every such reader drains (the Scala default of
    // IMMEDIATE reclamation is the provable-GDPR-erasure mode and is
    // documented as not live-reader-safe — this test found that the
    // hard way). Every read must return the SAME rows as the quiet
    // baseline: maintenance rewrites files, never visible rows, and a
    // read planned mid-rewrite is a consistent snapshot, not a torn mix
    // of old and new file sets.
    val baseline = entryRows("q_sql_q5")
    val li = cat.openTable("tpch", "lineitem")
    val head0 = li.headSeq
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintErr = Array[Throwable](null)
    val maint = new Thread(() => {
      try {
        // rotate until the READER is done — every read overlaps live
        // rewrites by construction
        var i = 0
        while (!stop.get()) {
          val call = i % 4 match {
            case 0 => "CALL graft.system.rewrite_data_files('tpch.lineitem')"
            case 1 => "CALL graft.system.rewrite_data_files('tpch.lineitem', " +
              "strategy => 'sort', sort_col => 'l_orderkey', num_files => 4)"
            case 2 => "CALL graft.system.compute_stats('tpch.lineitem', " +
              "cols => 'l_quantity')"
            case 3 => "CALL graft.system.expire_snapshots('tpch.lineitem')"
          }
          GraftSql.sql(spark, cat, call).collect()
          i += 1
        }
      } catch { case e: Throwable => maintErr(0) = e }
    }, "tpch-maintainer")
    maint.start()
    try {
      (0 until 5).foreach { r =>
        assert(governed(TpchGoverned.Q5).collect().toSeq == baseline,
          s"read $r diverged from the quiet baseline mid-maintenance")
        assert(maint.isAlive && maintErr(0) == null,
          s"maintenance died mid-race: ${maintErr(0)}")
      }
    } finally {
      stop.set(true)
      maint.join(180000)
    }
    assert(maintErr(0) == null, s"maintenance crashed: ${maintErr(0)}")
    assert(li.headSeq > head0, "the rotation must have committed rewrites")
    // and the settled table still answers the whole parity suite's Q5
    assert(governed(TpchGoverned.Q5).collect().toSeq == baseline)
  }
}
