package graft.queries

import graft.{Dec, Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans, filters, conditional projection, top-k and set operations —
  * SURVEY.md §2B "Scans / sources / sinks", "Projections / filters",
  * "Sorts / limits / top-k", "Set operations".
  *
  * Reference analogues: Parquet scan + projection (main.rs:47-77,
  * kafka-bench.rs:272-285), consume-all counting loop
  * (bench-kafka.rs:73-108), equality predicates (deletes.rs:65-75),
  * take-N (bench-kafka.rs:70), size classes (main.rs:63).
  *
  * Scale notes: every query here is a single scan (plus at most one
  * shuffle for global agg/sort); filters and projections are plain
  * column expressions so Catalyst pushes them into the Parquet reader
  * (PushedFilters / ReadSchema) — at 100 TB these prune row groups and
  * columns at the source. Top-k compiles to TakeOrderedAndProject
  * (per-partition heap + driver merge of k rows, never a full sort).
  */
object RelQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(
    // NB: (l_orderkey, l_linenumber) is not unique in the generated data —
    // the full key (l_orderkey, l_linenumber, l_partkey, l_suppkey) gives
    // the total order §7.5 requires.
    Q(
      "q_scan_project",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |       CAST(CAST(l_quantity AS DECIMAL(38,4)) * 10000 AS BIGINT) AS qty_x1e4, l_shipdate
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          Dec.asLong(col("l_quantity"), 4).as("qty_x1e4"), col("l_shipdate"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    },

    Q(
      "q_scan_count",
      "SELECT COUNT(*) AS cnt FROM lineitem",
    ) { (s, dir) =>
      Tables.lineitem(s, dir).agg(count(lit(1)).as("cnt"))
    },

    Q(
      "q_filter_eq",
      """SELECT l_orderkey, l_linenumber, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_orderkey, l_linenumber""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "A")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // TPC-H Q6 shape: range + conjunctive predicates, exact-decimal revenue.
    Q(
      "q_filter_range",
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS revenue_x1e6,
        |       COUNT(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(
          Dec.asLong(sum(Dec.money(col("l_extendedprice")) * Dec.factor(col("l_discount"))), 6).as("revenue_x1e6"),
          count(lit(1)).as("n"))
    },

    Q(
      "q_filter_in_null",
      """SELECT c_custkey,
        |       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'NONE') AS seg
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
        |  AND NULLIF(c_mktsegment, 'FURNITURE') IS NOT NULL
        |ORDER BY c_custkey""",
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
          && nullif(col("c_mktsegment"), lit("FURNITURE")).isNotNull)
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("NONE")).as("seg"))
        .orderBy("c_custkey")
    },

    Q(
      "q_case_expr",
      """SELECT CASE WHEN l_quantity < 10 THEN 'small'
        |            WHEN l_quantity < 30 THEN 'medium'
        |            ELSE 'large' END AS size_class,
        |       COUNT(*) AS n,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_qty_x1e4
        |FROM lineitem GROUP BY 1 ORDER BY size_class""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 30, "medium")
            .otherwise("large").as("size_class"),
          col("l_quantity"))
        .groupBy("size_class")
        .agg(count(lit(1)).as("n"), Dec.asLong(sum(Dec.d4(col("l_quantity"))), 4).as("sum_qty_x1e4"))
        .orderBy("size_class")
    },

    Q(
      "q_topk",
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS price_x1e2
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    ) { (s, dir) =>
      // orderBy+limit => TakeOrderedAndProject: per-partition top-k heaps,
      // k-row merge on the driver — no global sort at any scale.
      Tables.orders(s, dir)
        .select(col("o_orderkey"), Dec.asLong(col("o_totalprice"), 2).as("price_x1e2"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    Q(
      "q_union",
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY k""",
    ) { (s, dir) =>
      val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val b = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      a.union(b).distinct().orderBy("k")
    },

    Q(
      "q_intersect",
      """SELECT o_custkey AS k FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY k""",
    ) { (s, dir) =>
      val o = Tables.orders(s, dir)
      def yr(a: String, b: String) = o
        .filter(col("o_orderdate") >= lit(a).cast("timestamp")
          && col("o_orderdate") < lit(b).cast("timestamp"))
        .select(col("o_custkey").as("k"))
      yr("1996-01-01", "1997-01-01").intersect(yr("1997-01-01", "1998-01-01")).orderBy("k")
    },

    Q(
      "q_except",
      """SELECT o_custkey AS k FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |ORDER BY k""",
    ) { (s, dir) =>
      val o = Tables.orders(s, dir)
      def yr(a: String, b: String) = o
        .filter(col("o_orderdate") >= lit(a).cast("timestamp")
          && col("o_orderdate") < lit(b).cast("timestamp"))
        .select(col("o_custkey").as("k"))
      yr("1996-01-01", "1997-01-01").except(yr("1997-01-01", "1998-01-01")).orderBy("k")
    },

    // Dataset profiling (the ANALYZE/SUMMARIZE pass a curation run opens
    // with): per-column row/non-null/exact-distinct counts plus min/max
    // renderings, computed in ONE scan — all 21 aggregates land in a
    // single Aggregate node (the multi-distinct Expand plan: one
    // duplicated row stream per distinct column, partial-agg'd map-side),
    // then the single result row unpivots row-locally into the per-column
    // report. At 100 TB the same single-pass shape holds; the exact
    // count_distinct swaps for approx_count_distinct (no Expand) when
    // ±2% suffices — that variant is q_agg_approx_distinct's kernel.
    // min/max clip to 32 chars so profiling a corpus never ships
    // document-sized cells to the report.
    Q(
      "q_profile_summary",
      """WITH p AS (
        |  SELECT 'doc_id' AS col_name, COUNT(doc_id) AS n_nonnull, COUNT(DISTINCT doc_id) AS n_distinct,
        |         substr(CAST(MIN(doc_id) AS VARCHAR), 1, 32) AS min_repr,
        |         substr(CAST(MAX(doc_id) AS VARCHAR), 1, 32) AS max_repr FROM documents
        |  UNION ALL
        |  SELECT 'lang', COUNT(lang), COUNT(DISTINCT lang),
        |         substr(MIN(lang), 1, 32), substr(MAX(lang), 1, 32) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', COUNT(n_chars), COUNT(DISTINCT n_chars),
        |         substr(CAST(MIN(n_chars) AS VARCHAR), 1, 32),
        |         substr(CAST(MAX(n_chars) AS VARCHAR), 1, 32) FROM documents
        |  UNION ALL
        |  SELECT 'source', COUNT(source), COUNT(DISTINCT source),
        |         substr(MIN(source), 1, 32), substr(MAX(source), 1, 32) FROM documents
        |  UNION ALL
        |  SELECT 'text', COUNT(text), COUNT(DISTINCT text),
        |         substr(MIN(text), 1, 32), substr(MAX(text), 1, 32) FROM documents)
        |SELECT col_name, (SELECT COUNT(*) FROM documents) AS n_rows,
        |       n_nonnull, n_distinct, min_repr, max_repr
        |FROM p ORDER BY col_name""",
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}__nonnull"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        substring(min(col(c)).cast("string"), 1, 32).as(s"${c}__min"),
        substring(max(col(c)).cast("string"), 1, 32).as(s"${c}__max")))
      docs.agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(col("n_rows"), explode(array(cols.map(c => struct(
          lit(c).as("col_name"),
          col(s"${c}__nonnull").as("n_nonnull"),
          col(s"${c}__distinct").as("n_distinct"),
          col(s"${c}__min").as("min_repr"),
          col(s"${c}__max").as("max_repr"))): _*)).as("p"))
        .select(col("p.col_name"), col("n_rows"), col("p.n_nonnull"),
          col("p.n_distinct"), col("p.min_repr"), col("p.max_repr"))
        .orderBy("col_name")
    },

    // SKYLINE / Pareto frontier (r8) — the multi-objective filter
    // (minimize price, maximize size): keep parts no other part beats on
    // both axes (≤ price, ≥ size, one strict). The naive form is an n²
    // NOT EXISTS self-join (exactly what the oracle runs); the
    // distributed form is the classic two-phase skyline: (1) bucket-local
    // skylines via two keyed windows over each hash bucket — max size
    // among strictly-cheaper bucket rows (RANGE frame to −1) and max size
    // within the same price — then (2) the final frontier as one
    // broadcast anti-join of the small candidate union against itself.
    // Correct because dominance is transitive: any globally-dominated row
    // is dominated by some bucket-local survivor, so pruning against the
    // candidate set alone is exact. Scale: phase 1 touches each row once
    // with parallelism = #buckets and no global sort; phase 2's input is
    // bounded by #buckets × per-bucket frontier (2-D frontiers are tiny),
    // so the broadcast never grows with the corpus.
    Q(
      "q_skyline",
      """WITH b AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
        |    CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_x1e2 FROM part)
        |SELECT p_partkey, size, price_x1e2 FROM b a
        |WHERE NOT EXISTS (SELECT 1 FROM b x
        |  WHERE x.price_x1e2 <= a.price_x1e2 AND x.size >= a.size
        |    AND (x.price_x1e2 < a.price_x1e2 OR x.size > a.size))
        |ORDER BY p_partkey""",
    ) { (s, dir) =>
      val b = Tables.part(s, dir).select(
        col("p_partkey"), col("p_size").cast("long").as("size"),
        Dec.asLong(col("p_retailprice"), 2).as("price_x1e2"),
        pmod(hash(col("p_partkey")), lit(32)).as("bkt"))
      val wPrev = Window.partitionBy("bkt").orderBy("price_x1e2")
        .rangeBetween(Window.unboundedPreceding, -1)
      val wEq = Window.partitionBy("bkt", "price_x1e2")
      val local = b
        .withColumn("m1", max("size").over(wPrev))
        .withColumn("m2", max("size").over(wEq))
        .filter((col("m1").isNull || col("size") > col("m1")) && col("size") === col("m2"))
        .select("p_partkey", "size", "price_x1e2")
      val other = local.select(col("price_x1e2").as("xp"), col("size").as("xs"))
      local.join(broadcast(other),
          col("xp") <= col("price_x1e2") && col("xs") >= col("size")
            && (col("xp") < col("price_x1e2") || col("xs") > col("size")),
          "left_anti")
        .orderBy("p_partkey")
    },
  )
}
