package graft.sql

import graft.Tables
import graft.table.GraftCatalog

import org.apache.spark.sql.SparkSession

/** TPC-H star schema as GOVERNED tables, loaded and queried purely
  * through the SQL front end — the integration fixture where GraftSql
  * and the table layer meet at real plan complexity (r10 verdict #1;
  * reference capability: the compose Spark querying the Iceberg
  * catalog, docker-compose.yml:58-81). The `t_sql_tpch` driver entry
  * gates Q5 against the raw-parquet oracle; GraftSqlTpchSpec asserts
  * result parity with the temp-view entries for ALL 22 texts (+ the
  * recursive CTE) plus plan pins
  * (pushdown/pruning must reach the substituted MoR snapshot scans).
  *
  * The query texts are the Spark-dialect twins of the q_sql_q* entries'
  * sqlOverViews texts with every relation a `graft.tpch.*` name — same
  * arithmetic, same aliases, so results hash-match the same oracles.
  * Where the entry is a hand-tuned DataFrame plan (Q2/Q11/Q15/Q16/Q17/
  * Q20/Q21), the governed text is the LITERAL SQL formulation of the
  * same answer — correlated scalar subqueries, nested IN, HAVING
  * subqueries — deliberately: plan substitution must survive the
  * analyzer's decorrelation machinery, which rewrites the substituted
  * MoR subplans into joins/aggregates the original statement never
  * spelled (r11 verdict #1). Result parity between the two plans is
  * exactly what proves the governed path safe under existing BI SQL.
  */
object TpchGoverned {

  /** CTAS each TPC-H table from its parquet source THROUGH GraftSql —
    * the load path itself exercises the front end (CREATE NAMESPACE +
    * CTAS with the seed query reading a temp view). One append commit
    * per table; at warehouse scale this is the one-off governed import
    * of an existing lake directory.
    */
  def load(s: SparkSession, cat: GraftCatalog, dir: String): Unit =
    loadTables(s, cat, dir, Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem"))

  /** Subset loader for scenarios that govern only the tables their query
    * touches (a per-run CTAS of all 7 would be paid for nothing).
    *
    * The per-table CTAS jobs are INDEPENDENT (distinct target tables,
    * distinct commit logs, uniquely named temp views), so they run from a
    * small driver thread pool (guide §2.6 — overlap independent jobs):
    * the next table's scan+write back-fills executors idled by the
    * current one's single-threaded commit tail. Sequentially the 7 loads
    * paid 7 × (view + parse + CTAS write + stats + commit) of wall
    * end-to-end; commit correctness is untouched because no two threads
    * share a table (the SQL front end's cross-thread discipline is
    * exercised separately in GraftSqlRaceSpec).
    */
  def loadTables(s: SparkSession, cat: GraftCatalog, dir: String,
      names: Seq[String]): Unit = {
    GraftSql.sql(s, cat, "CREATE NAMESPACE graft.tpch")
    val sources: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "region" -> (() => Tables.region(s, dir)),
      "nation" -> (() => Tables.nation(s, dir)),
      "customer" -> (() => Tables.customer(s, dir)),
      "supplier" -> (() => Tables.supplier(s, dir)),
      "part" -> (() => Tables.part(s, dir)),
      "orders" -> (() => Tables.orders(s, dir)),
      "lineitem" -> (() => Tables.lineitem(s, dir)))
    def loadOne(name: String): Unit = {
      val v = s"tpch_load_${name}_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      sources(name)().createOrReplaceTempView(v)
      try GraftSql.sql(s, cat,
        s"CREATE TABLE graft.tpch.$name AS SELECT * FROM $v"): Unit
      finally s.catalog.dropTempView(v)
    }
    if (names.size <= 1) names.foreach(loadOne)
    else {
      // 3 in flight fills the commit-latency gaps without flooding the
      // scheduler (guide §2.6: "2-3 jobs in flight is plenty")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(3, names.size))
      try names.map(n => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = loadOne(n)
      })).foreach(_.get())
      finally pool.shutdown()
    }
  }

  val Q1: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS sum_base_x1e2,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_disc_x1e4,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS sum_charge_x1e6,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST((SUM(CAST(l_quantity AS BIGINT)) * 1000000L) div COUNT(*) AS BIGINT) AS avg_qty_x1e6,
      CAST((SUM(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) * 10000L) div COUNT(*) AS BIGINT) AS avg_disc_x1e6
    FROM graft.tpch.lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val Q5: String = """
    SELECT n_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS revenue_x1e6
    FROM graft.tpch.customer JOIN graft.tpch.orders ON c_custkey = o_custkey
    JOIN graft.tpch.lineitem ON l_orderkey = o_orderkey
    JOIN graft.tpch.supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN graft.tpch.nation ON s_nationkey = n_nationkey
    JOIN graft.tpch.region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01'
      AND o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY n_name
    ORDER BY revenue_x1e6 DESC, n_name"""

  val Q9: String = """
    WITH j AS (
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
          * (CAST(CAST(100 * (1 - l_discount) AS DECIMAL(5,2)) AS BIGINT)
             - CAST(CAST(100 * l_tax AS DECIMAL(5,2)) AS BIGINT)) AS amount_x1e4
      FROM graft.tpch.lineitem
        JOIN graft.tpch.supplier ON s_suppkey = l_suppkey
        JOIN graft.tpch.part ON p_partkey = l_partkey
        JOIN graft.tpch.orders ON o_orderkey = l_orderkey
        JOIN graft.tpch.nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
      CAST(SUM(amount_x1e4) AS BIGINT) AS profit_x1e4,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM j GROUP BY nation, o_year
    ORDER BY nation, o_year DESC"""

  val Q3: String = """
    SELECT l_orderkey,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS revenue_x1e6,
      o_orderdate, o_orderpriority
    FROM graft.tpch.customer JOIN graft.tpch.orders ON c_custkey = o_custkey
    JOIN graft.tpch.lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_x1e6 DESC, l_orderkey
    LIMIT 10"""

  val Q6: String = """
    SELECT
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               * CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_x1e4,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM graft.tpch.lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07
      AND l_quantity < 24"""

  val Q18: String = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS totalprice_x1e2,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS sum_qty_x1e2
    FROM graft.tpch.customer JOIN graft.tpch.orders ON c_custkey = o_custkey
    JOIN graft.tpch.lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM graft.tpch.lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice_x1e2 DESC, o_orderkey
    LIMIT 100"""

  val Recursive: String = """
    WITH RECURSIVE walk(node, anc, depth) AS (
      SELECT p_partkey AS node, p_partkey AS anc, 0 AS depth FROM graft.tpch.part
      UNION ALL
      SELECT node, anc DIV 10 AS anc, depth + 1 AS depth FROM walk WHERE anc > 9
    )
    SELECT anc AS root, CAST(COUNT(*) AS BIGINT) AS n_parts,
      CAST(SUM(node) AS BIGINT) AS sum_partkey,
      CAST(MAX(depth) AS BIGINT) AS max_depth
    FROM walk WHERE anc <= 9
    GROUP BY anc ORDER BY root"""

  val Q21: String = """
    WITH st AS (SELECT l_orderkey,
            COUNT(DISTINCT l_suppkey) AS nsupp,
            COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS nret
          FROM graft.tpch.lineitem GROUP BY 1)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM graft.tpch.lineitem l1
      JOIN st ON l1.l_orderkey = st.l_orderkey
      JOIN graft.tpch.orders ON o_orderkey = l1.l_orderkey
      JOIN graft.tpch.supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      AND nsupp > 1 AND nret = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name"""

  /** Q2: the CORRELATED SCALAR MIN — for each part of the size/type
    * slice, the region's suppliers quoting the minimum unit price. The
    * q_sql_q2 entry decorrelates BY HAND into a window; this text keeps
    * the spec's correlated `= (SELECT MIN ...)` so the analyzer's
    * decorrelation rewrites the substituted MoR subplans itself.
    */
  val Q2: String = """
    WITH pf AS (SELECT p_partkey, p_name FROM graft.tpch.part
                WHERE p_size <= 15 AND p_type = 'STANDARD'),
    rs AS (SELECT s_suppkey, s_name,
             CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_x1e2, n_name
           FROM graft.tpch.supplier JOIN graft.tpch.nation ON s_nationkey = n_nationkey
             JOIN graft.tpch.region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
    ps AS (SELECT l_partkey, l_suppkey,
             MIN(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 div CAST(l_quantity AS BIGINT)) AS cost_x1e2
           FROM graft.tpch.lineitem JOIN pf ON l_partkey = p_partkey GROUP BY 1, 2),
    cand AS (SELECT l_partkey, l_suppkey, cost_x1e2, bal_x1e2, s_name, n_name
             FROM ps JOIN rs ON l_suppkey = s_suppkey)
    SELECT bal_x1e2, s_name, n_name, l_partkey AS p_partkey, p_name, cost_x1e2
    FROM cand c JOIN pf ON c.l_partkey = pf.p_partkey
    WHERE cost_x1e2 = (SELECT MIN(c2.cost_x1e2) FROM cand c2
                       WHERE c2.l_partkey = c.l_partkey)
    ORDER BY bal_x1e2 DESC, n_name, s_name, p_partkey LIMIT 100"""

  val Q4: String = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM graft.tpch.orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM graft.tpch.lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  val Q7: String = """
    SELECT supp_nation, cust_nation, l_year,
      CAST(CAST(SUM(vol) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS revenue_x1e6,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
            CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) AS vol
          FROM graft.tpch.supplier JOIN graft.tpch.lineitem ON s_suppkey = l_suppkey
          JOIN graft.tpch.orders ON o_orderkey = l_orderkey
          JOIN graft.tpch.customer ON c_custkey = o_custkey
          JOIN graft.tpch.nation n1 ON s_nationkey = n1.n_nationkey
          JOIN graft.tpch.nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
              OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
            AND l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  val Q8: String = """
    WITH j AS (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               * CAST(CAST(100 * (1 - l_discount) AS DECIMAL(5,2)) AS BIGINT) AS vol_x1e4,
             n2.n_name AS supp_nation
      FROM graft.tpch.lineitem JOIN graft.tpch.part ON p_partkey = l_partkey
        JOIN graft.tpch.supplier ON s_suppkey = l_suppkey
        JOIN graft.tpch.orders ON l_orderkey = o_orderkey
        JOIN graft.tpch.customer ON o_custkey = c_custkey
        JOIN graft.tpch.nation n1 ON c_nationkey = n1.n_nationkey
        JOIN graft.tpch.region ON n1.n_regionkey = r_regionkey
        JOIN graft.tpch.nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
    SELECT CAST(o_year AS BIGINT) AS o_year,
      CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_x1e4 ELSE 0L END) AS DECIMAL(38,0)) * 1000000
           div CAST(SUM(vol_x1e4) AS DECIMAL(38,0)) AS BIGINT) AS mkt_share_x1e6,
      CAST(SUM(vol_x1e4) AS BIGINT) AS volume_x1e4,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM j GROUP BY o_year ORDER BY o_year"""

  val Q10: String = """
    SELECT c_custkey, c_name,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS revenue_x1e6,
      CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS acctbal_x1e2,
      n_name
    FROM graft.tpch.customer JOIN graft.tpch.orders ON c_custkey = o_custkey
    JOIN graft.tpch.lineitem ON l_orderkey = o_orderkey
    JOIN graft.tpch.nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue_x1e6 DESC, c_custkey
    LIMIT 20"""

  /** Q11: the HAVING-style global threshold as literal uncorrelated
    * scalar subqueries over the same CTE — the entry derives the 1-row
    * threshold from the shared aggregate plan by hand; here the analyzer
    * plans both ScalarSubquery expressions itself.
    */
  val Q11: String = """
    WITH val AS (
      SELECT l_partkey, CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS value_x1e2
      FROM graft.tpch.lineitem JOIN graft.tpch.supplier ON l_suppkey = s_suppkey
        JOIN graft.tpch.nation ON s_nationkey = n_nationkey
        JOIN graft.tpch.region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY 1)
    SELECT l_partkey AS p_partkey, value_x1e2
    FROM val
    WHERE value_x1e2 * (SELECT COUNT(*) FROM val)
          > 2 * (SELECT SUM(value_x1e2) FROM val)
    ORDER BY value_x1e2 DESC, p_partkey"""

  val Q12: String = """
    SELECT l_returnflag AS ship_mode,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM graft.tpch.orders JOIN graft.tpch.lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  val Q13: String = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM graft.tpch.customer LEFT JOIN graft.tpch.orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  val Q14: String = """
    WITH j AS (SELECT CASE WHEN p_type = 'PROMO' THEN 1L ELSE 0L END AS is_promo,
            CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
              * CAST(CAST(100 * (1 - l_discount) AS DECIMAL(5,2)) AS BIGINT) AS rev_x1e4
          FROM graft.tpch.lineitem JOIN graft.tpch.part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01')
    SELECT
      CAST((CAST(SUM(is_promo * rev_x1e4) AS DECIMAL(38,0)) * 1000000)
           div CAST(SUM(rev_x1e4) AS DECIMAL(38,0)) AS BIGINT) AS promo_share_x1e6,
      CAST(SUM(rev_x1e4) AS BIGINT) AS revenue_x1e4,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM j"""

  /** Q15: the spec's VIEW + `= (SELECT MAX ...)` scalar subquery, as
    * written — the entry reuses the rev exchange by hand; the governed
    * text leaves the max to the analyzer's scalar-subquery planning.
    */
  val Q15: String = """
    WITH rev AS (SELECT l_suppkey AS supplier_no,
            CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                     * CAST(CAST(100 * (1 - l_discount) AS DECIMAL(5,2)) AS BIGINT)) AS BIGINT) AS total_revenue_x1e4
          FROM graft.tpch.lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue_x1e4
    FROM graft.tpch.supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue_x1e4 = (SELECT MAX(total_revenue_x1e4) FROM rev)
    ORDER BY s_suppkey"""

  /** Q16: NOT IN over a filtered supplier set + multi-key distinct count
    * — the null-safe NOT IN decorrelation (keys are non-null by schema,
    * so the anti join the analyzer plans matches the entry's LEFT ANTI).
    */
  val Q16: String = """
    SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM graft.tpch.lineitem
          WHERE l_suppkey NOT IN (SELECT s_suppkey FROM graft.tpch.supplier WHERE s_acctbal < 0)) pr
    JOIN graft.tpch.part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q17: TWO correlated scalar aggregates over the same part-sliced
    * fact (count and sum, cross-multiplied so the per-part average
    * comparison stays all-integer) — the entry collapses these into one
    * window by hand; the governed text makes the analyzer decorrelate
    * each subquery into an aggregate-join over the substituted MoR scan.
    */
  val Q17: String = """
    WITH pf AS (SELECT p_partkey FROM graft.tpch.part
                WHERE p_brand = 'Brand#13' AND p_size <= 25),
    lf AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_x1e2
           FROM graft.tpch.lineitem JOIN pf ON l_partkey = p_partkey)
    SELECT CAST(SUM(price_x1e2) div 7 AS BIGINT) AS avg_yearly_x1e2,
      CAST(COUNT(*) AS BIGINT) AS n_small_lines
    FROM lf l
    WHERE 5 * l.qty * (SELECT COUNT(*) FROM lf l2 WHERE l2.l_partkey = l.l_partkey)
          < (SELECT SUM(l2.qty) FROM lf l2 WHERE l2.l_partkey = l.l_partkey)"""

  val Q19: String = """
    SELECT
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               * CAST(CAST(100 * (1 - l_discount) AS DECIMAL(5,2)) AS BIGINT)) AS BIGINT) AS revenue_x1e4,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM graft.tpch.lineitem JOIN graft.tpch.part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 30)"""

  /** Q20: the nested IN + conditional-HAVING shape (the spec's two
    * nested subqueries over the same fact, folded to one conditional
    * aggregation exactly like the entry — but submitted as SQL text so
    * the IN-subquery rides plan substitution).
    */
  val Q20: String = """
    WITH qual AS (
      SELECT l_suppkey, l_partkey FROM graft.tpch.lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM graft.tpch.part WHERE p_name LIKE 'large%')
      GROUP BY l_suppkey, l_partkey
      HAVING 2 * SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                           AND l_shipdate < TIMESTAMP '1997-01-01'
                          THEN CAST(l_quantity AS BIGINT) ELSE 0L END)
             > SUM(CAST(l_quantity AS BIGINT)))
    SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM graft.tpch.supplier JOIN qual ON s_suppkey = l_suppkey
    GROUP BY s_suppkey, s_name
    ORDER BY s_name"""

  /** Q22: uncorrelated scalar threshold + correlated NOT EXISTS with a
    * non-key conjunct — the anti-join decorrelation with a residual
    * condition, over governed reads.
    */
  val Q22: String = """
    WITH cust AS (SELECT c_custkey, n_name,
            CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_x1e2
          FROM graft.tpch.customer JOIN graft.tpch.nation ON c_nationkey = n_nationkey
          WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_9', 'NATION_13', 'NATION_17')),
    thresh AS (SELECT SUM(bal_x1e2) div COUNT(*) AS a FROM cust WHERE bal_x1e2 > 0)
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
      CAST(SUM(bal_x1e2) AS BIGINT) AS totacctbal_x1e2
    FROM cust, thresh
    WHERE bal_x1e2 > a
      AND NOT EXISTS (SELECT 1 FROM graft.tpch.orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n_name
    ORDER BY n_name"""

  /** Every TPC-H text keyed by its q_sql_* entry name — the parity
    * surface GraftSqlTpchSpec sweeps (22 queries + the recursive CTE).
    */
  val all: Seq[(String, String)] = Seq(
    "q_sql_q1" -> Q1, "q_sql_q2" -> Q2, "q_sql_q3" -> Q3, "q_sql_q4" -> Q4,
    "q_sql_q5" -> Q5, "q_sql_q6" -> Q6, "q_sql_q7" -> Q7, "q_sql_q8" -> Q8,
    "q_sql_q9" -> Q9, "q_sql_q10" -> Q10, "q_sql_q11" -> Q11,
    "q_sql_q12" -> Q12, "q_sql_q13" -> Q13, "q_sql_q14" -> Q14,
    "q_sql_q15" -> Q15, "q_sql_q16" -> Q16, "q_sql_q17" -> Q17,
    "q_sql_q18" -> Q18, "q_sql_q19" -> Q19, "q_sql_q20" -> Q20,
    "q_sql_q21" -> Q21, "q_sql_q22" -> Q22, "q_sql_recursive" -> Recursive)
}
