package graft.sql

import graft.Tables
import graft.table.GraftCatalog

import org.apache.spark.sql.SparkSession

/** TPC-H star schema as GOVERNED tables, loaded and queried purely
  * through the SQL front end — the integration fixture where GraftSql
  * and the table layer meet at real plan complexity (r10 verdict #1;
  * reference capability: the compose Spark querying the Iceberg
  * catalog, docker-compose.yml:58-81). The `t_sql_tpch` driver entry
  * gates Q5 against the raw-parquet oracle; GraftSqlTpchSpec widens to
  * Q1/Q3/Q6/Q9/Q18/Q21 + the recursive CTE result parity with the
  * temp-view entries plus plan pins
  * (pushdown/pruning must reach the substituted MoR snapshot scans).
  *
  * The query texts are the Spark-dialect twins of the q_sql_q* entries'
  * sqlOverViews texts with every relation a `graft.tpch.*` name — same
  * arithmetic, same aliases, so results hash-match the same oracles.
  */
object TpchGoverned {

  /** CTAS each TPC-H table from its parquet source THROUGH GraftSql —
    * the load path itself exercises the front end (CREATE NAMESPACE +
    * CTAS with the seed query reading a temp view). One append commit
    * per table; at warehouse scale this is the one-off governed import
    * of an existing lake directory.
    */
  def load(s: SparkSession, cat: GraftCatalog, dir: String): Unit = {
    GraftSql.sql(s, cat, "CREATE NAMESPACE graft.tpch")
    val sources = Seq(
      "region" -> Tables.region(s, dir),
      "nation" -> Tables.nation(s, dir),
      "customer" -> Tables.customer(s, dir),
      "supplier" -> Tables.supplier(s, dir),
      "part" -> Tables.part(s, dir),
      "orders" -> Tables.orders(s, dir),
      "lineitem" -> Tables.lineitem(s, dir))
    sources.foreach { case (name, df) =>
      val v = s"tpch_load_${name}_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      df.createOrReplaceTempView(v)
      try GraftSql.sql(s, cat,
        s"CREATE TABLE graft.tpch.$name AS SELECT * FROM $v")
      finally s.catalog.dropTempView(v)
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
}
