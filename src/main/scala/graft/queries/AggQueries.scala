package graft.queries

import graft.{Dec, Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregations and window functions — SURVEY.md §2B "Aggregations",
  * "Window functions", plus top-k-per-group.
  *
  * Scale notes:
  *  - groupBy aggregates compile to partial (map-side) + final (post-
  *    shuffle) HashAggregate automatically — the only shuffle carries
  *    pre-combined per-group state, not rows.
  *  - rollup/cube use Expand before aggregation; grouping columns are
  *    projected through COALESCE sentinels so output never depends on
  *    engine-specific NULL ordering.
  *  - All window queries partition on a key (supplier/user/customer) so
  *    state stays bounded per partition; none use a global (unpartitioned)
  *    window, which would serialize on one task at scale.
  *  - Decimal-exact sums: associative and order-independent, so partial
  *    aggregation and AQE re-planning can never change the result
  *    (SURVEY.md §7.5).
  */
object AggQueries extends QueryPack {

  private val lo = lit("1998-09-03").cast("timestamp")

  override def queries: Seq[Q] = Seq(

    // TPC-H Q1 shape — the flagship aggregate.
    Q(
      "q_agg_group",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_qty_x1e4,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_base_price_x1e4,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS sum_disc_price_x1e6,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS sum_charge_x1e6,
        |  CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 1000000) AS BIGINT) AS avg_qty_x1e6,
        |  CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 1000000) AS BIGINT) AS avg_price_x1e6,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-03'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""",
    ) { (s, dir) =>
      val price = Dec.money(col("l_extendedprice"))
      val disc = Dec.factor(lit(1) - col("l_discount"))
      val tax = Dec.factor(lit(1) + col("l_tax"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") < lo)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Dec.asLong(sum(Dec.d4(col("l_quantity"))), 4).as("sum_qty_x1e4"),
          Dec.asLong(sum(price), 4).as("sum_base_price_x1e4"),
          Dec.asLong(sum(price * disc), 6).as("sum_disc_price_x1e6"),
          Dec.asLong(sum(price * disc * tax), 6).as("sum_charge_x1e6"),
          // doubles are quantized via ROUND, never a double→decimal cast
          // (§7.5: Spark casts through the shortest string repr, DuckDB
          // through the exact binary expansion — they can differ by 1 ulp
          // of the target scale)
          round(sum(Dec.d4(col("l_quantity"))).cast("double") / count(lit(1)) * 1e6)
            .cast("long").as("avg_qty_x1e6"),
          round(sum(price).cast("double") / count(lit(1)) * 1e6)
            .cast("long").as("avg_price_x1e6"),
          count(lit(1)).as("count_order"))
        .transform(boundedSort(_, col("l_returnflag"), col("l_linestatus")))
    },

    Q(
      "q_agg_distinct",
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_supp,
        |       COUNT(DISTINCT l_partkey) AS n_part,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .transform(boundedSort(_, col("l_returnflag")))
    },

    // ROLLUP over region → nation with sentinel labels (no NULL-order traps).
    Q(
      "q_agg_rollup",
      """SELECT COALESCE(r.r_name, '(all)') AS region,
        |       COALESCE(n.n_name, '(all)') AS nation,
        |       GROUPING(r.r_name) AS g_region, GROUPING(n.n_name) AS g_nation,
        |       CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS sum_bal_x1e2,
        |       COUNT(*) AS n
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r.r_name, n.n_name)
        |ORDER BY region, nation""",
    ) { (s, dir) =>
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          // Spark grouping() is TINYINT, DuckDB's is BIGINT — cast for hash parity.
          grouping(col("r_name")).cast("long").as("g_region"),
          grouping(col("n_name")).cast("long").as("g_nation"),
          Dec.asLong(sum(Dec.money(col("c_acctbal"))), 2).as("sum_bal_x1e2"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("r_name"), lit("(all)")).as("region"),
          coalesce(col("n_name"), lit("(all)")).as("nation"),
          col("g_region"), col("g_nation"), col("sum_bal_x1e2"), col("n"))
        .transform(boundedSort(_, col("region"), col("nation")))
    },

    Q(
      "q_agg_cube",
      """SELECT COALESCE(l_returnflag, '(all)') AS rf,
        |       COALESCE(l_linestatus, '(all)') AS ls,
        |       GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
        |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_qty_x1e4,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"),
          Dec.asLong(sum(Dec.d4(col("l_quantity"))), 4).as("sum_qty_x1e4"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("g_rf"), col("g_ls"), col("sum_qty_x1e4"), col("n"))
        .transform(boundedSort(_, col("rf"), col("ls")))
    },

    // HLL sketch — algorithm-specific, so rows-only checked (§2B no-oracle);
    // the scalatest asserts the estimate against the exact distinct count.
    Q.noOracle("q_agg_approx_distinct") { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // exact "stats" shape: min/max/sum/count + exact variance numerator
    // n*Σx² − (Σx)² computed wholly in decimals.
    Q(
      "q_agg_stats",
      """SELECT l_linestatus,
        |  COUNT(*) AS n,
        |  CAST(CAST(MIN(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS min_qty_x1e4,
        |  CAST(CAST(MAX(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS max_qty_x1e4,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_qty_x1e4,
        |  CAST(CAST(COUNT(*) * SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2)))
        |       - SUM(CAST(l_quantity AS DECIMAL(18,4))) * SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS var_num_x1e4
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    ) { (s, dir) =>
      val q2 = col("l_quantity").cast(DecimalType(9, 2))
      Tables.lineitem(s, dir)
        .groupBy("l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          Dec.asLong(min(Dec.d4(col("l_quantity"))), 4).as("min_qty_x1e4"),
          Dec.asLong(max(Dec.d4(col("l_quantity"))), 4).as("max_qty_x1e4"),
          Dec.asLong(sum(Dec.d4(col("l_quantity"))), 4).as("sum_qty_x1e4"),
          Dec.asLong(count(lit(1)) * sum(q2 * q2) - sum(Dec.d4(col("l_quantity"))) * sum(Dec.d4(col("l_quantity"))), 4)
            .as("var_num_x1e4"))
        .transform(boundedSort(_, col("l_linestatus")))
    },

    // exact percentiles (quartiles + median) per group. Cross-engine
    // determinism: both engines use the same linear-interpolation
    // definition (pos = q·(n−1)); q ∈ {¼, ½, ¾} have power-of-2
    // denominators and l_quantity is integer-valued, so every
    // intermediate double (pos, fraction, interpolated value) is EXACT
    // and ×100 renders an exact BIGINT — no float-representation skew.
    // (Arbitrary q like 0.9 would interpolate on 1/10ths, which binary
    // doubles cannot represent — deliberately avoided.)
    Q(
      "q_agg_percentile",
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  CAST(quantile_cont(l_quantity, 0.25) * 100 AS BIGINT) AS p25_x1e2,
        |  CAST(quantile_cont(l_quantity, 0.5)  * 100 AS BIGINT) AS p50_x1e2,
        |  CAST(quantile_cont(l_quantity, 0.75) * 100 AS BIGINT) AS p75_x1e2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          expr("CAST(percentile(l_quantity, 0.25) * 100 AS BIGINT)").as("p25_x1e2"),
          expr("CAST(percentile(l_quantity, 0.5)  * 100 AS BIGINT)").as("p50_x1e2"),
          expr("CAST(percentile(l_quantity, 0.75) * 100 AS BIGINT)").as("p75_x1e2"))
        .transform(boundedSort(_, col("l_returnflag")))
    },

    // Approximate quantiles (the second sketch after HLL): the
    // mergeable-summary family a 100 TB engine needs when exact
    // percentile's per-group value buffers don't fit. No oracle — the
    // sketch is algorithm-specific, like q_agg_approx_distinct; the
    // registered entry is bounded against exact percentile in
    // QuerySurfaceSpec via the sketch's own accuracy contract
    // (relativeError 1/accuracy).
    Q.noOracle("q_agg_approx_quantile") { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("CAST(approx_percentile(l_extendedprice, 0.5, 1000) * 100 AS BIGINT)")
            .as("p50_approx_x1e2"),
          expr("CAST(approx_percentile(l_extendedprice, 0.99, 1000) * 100 AS BIGINT)")
            .as("p99_approx_x1e2"))
        .orderBy("l_returnflag")
    },

    // Count-Min sketch heavy-hitters (the frequency complement of HLL's
    // cardinality): a d=4 × w=64 counter grid over the corpus word
    // stream — cell(j, (h1 + j·h2) mod w) += 1, Kirsch-Mitzenmacher
    // double hashing from ONE md5 per word — then each probe's estimate
    // is the MIN over its 4 cells, which can only over-count (pinned per
    // row as no_underestimate). Why it matters at 100 TB: the sketch is
    // mergeable by ADDITION, so Spark's partial aggregation IS the merge
    // — every executor folds its partition into 256 cells map-side, one
    // 256-row shuffle total, and daily sketches sum into monthly ones
    // without re-reading a row. Integer-only end to end (md5 → BIGINT
    // arithmetic), so the DuckDB oracle replays it bit-for-bit.
    Q(
      "q_sketch_cms",
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |exact AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_n FROM w GROUP BY word),
        |h AS (SELECT word, exact_n,
        |        ${DedupQueries.h60Sql("word")} AS h1,
        |        CAST('0x' || substring(md5(word), 16, 15) AS BIGINT) AS h2 FROM exact),
        |cells AS (SELECT j, (h1 + j * h2) % 64 AS b, CAST(SUM(exact_n) AS BIGINT) AS c
        |          FROM h, (SELECT unnest(range(4)) AS j) GROUP BY j, b),
        |ph AS (SELECT word, exact_n, j, (h1 + j * h2) % 64 AS b
        |       FROM (SELECT * FROM h ORDER BY exact_n DESC, word LIMIT 10) p,
        |            (SELECT unnest(range(4)) AS j)),
        |e AS (SELECT ph.word, ph.exact_n, MIN(c.c) AS est_n
        |      FROM ph JOIN cells c ON ph.j = c.j AND ph.b = c.b
        |      GROUP BY ph.word, ph.exact_n)
        |SELECT word, exact_n, est_n, est_n >= exact_n AS no_underestimate
        |FROM e ORDER BY word""",
    ) { (s, dir) =>
      // h1 = the shared 60-bit cross-engine hash primitive; h2 = the
      // SECOND 60-bit slice of the same md5 (its independent sibling for
      // the CMS double-hash family)
      val h1 = DedupQueries.h60("word")
      val h2 = "CAST(CONV(substring(md5(word), 16, 15), 16, 10) AS BIGINT)"
      // CMS cells are additive in per-word counts, so hash DISTINCT words
      // (one corpus shuffle, md5 once per word not per occurrence) and
      // weight each cell by exact_n; the probe and cell branches consume
      // the SAME word-keyed aggregate, so the exchange is built once and
      // reused (pinned in PlanAuditSpec).
      val words = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
      val withHash = words.groupBy("word").agg(count(lit(1)).as("exact_n"))
        .withColumn("h1", expr(h1)).withColumn("h2", expr(h2))
      val jb = expr(
        """transform(sequence(0, 3), j ->
          |  named_struct('j', CAST(j AS BIGINT), 'b', pmod(h1 + j * h2, 64L)))""".stripMargin)
      val cells = withHash
        .select(col("exact_n"), explode(jb).as("jb"))
        .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
        .agg(sum(col("exact_n")).as("c"))
      val probes = withHash
        .orderBy(col("exact_n").desc, col("word")).limit(10)
        .select(col("word"), col("exact_n"), explode(jb).as("jb"))
        .select(col("word"), col("exact_n"), col("jb.j").as("j"), col("jb.b").as("b"))
      probes.join(broadcast(cells), Seq("j", "b"))
        .groupBy("word", "exact_n")
        .agg(min(col("c")).as("est_n"))
        .select(col("word"), col("exact_n"), col("est_n"),
          (col("est_n") >= col("exact_n")).as("no_underestimate"))
        .transform(boundedSort(_, col("word")))
    },

    // Mergeable-sketch rollup (the incremental-pipeline pattern at
    // 100 TB): one DataSketches HLL per (event_type, day) — what a daily
    // job would materialize — then the stored sketches MERGE to the
    // full-range distinct-user count without touching a row again. HLL
    // union is lossless (register-wise max), so the merged estimate
    // equals a direct whole-range sketch bit-for-bit; QuerySurfaceSpec
    // asserts that equality plus the ±ε bound vs exact distinct.
    // No-oracle like the other sketches (binary is algorithm-specific).
    Q.noOracle("q_sketch_hll_union") { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("days_merged"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"))
        .orderBy("event_type")
    },

    // first/last/nth value windows with explicit full frames: last_value
    // over the DEFAULT frame (unbounded→current) is the classic silent
    // bug (it returns the current row); the full frame + total tie order
    // makes all three deterministic and cross-engine exact.
    Q(
      "q_win_first_last",
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |  LAST_VALUE(o_orderkey) OVER w AS last_order,
        |  NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""",
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- windows ----

    Q(
      "q_win_rank",
      """SELECT * FROM (
        |  SELECT n_name, s_suppkey,
        |         CAST(CAST(s_acctbal AS DECIMAL(38,2)) * 100 AS BIGINT) AS bal_x1e2,
        |         RANK() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
        |         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY s_acctbal DESC, s_suppkey) AS rn
        |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |) WHERE rn <= 3
        |ORDER BY n_name, rn""",
    ) { (s, dir) =>
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val w = Window.partitionBy("n_name").orderBy(col("s_acctbal").desc, col("s_suppkey"))
      // Spark rank()/row_number() are INT, DuckDB's BIGINT — cast for hash parity.
      sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .select(col("n_name"), col("s_suppkey"), Dec.asLong(col("s_acctbal"), 2).as("bal_x1e2"),
          rank().over(w).cast("long").as("rnk"), row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("n_name", "rn")
    },

    Q(
      "q_win_lag_lead",
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_delta_us,
        |  LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER w - epoch_us(CAST(ts AS TIMESTAMP)) AS next_delta_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""",
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("prev_delta_us"),
          (lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts"))).as("next_delta_us"))
        .orderBy("event_id")
    },

    // moving 3-row sum (explicit frame) per supplier by ship date.
    // NB: (l_orderkey, l_linenumber) is NOT unique in the generated data;
    // (l_orderkey, l_linenumber, l_partkey, l_suppkey) is — window and
    // output orders must be total for cross-engine determinism.
    Q(
      "q_win_frame",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
        |       OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS moving_qty_x1e4
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_partkey""",
    ) { (s, dir) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .rowsBetween(-2, Window.currentRow)
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          Dec.asLong(sum(Dec.d4(col("l_quantity"))).over(w), 4).as("moving_qty_x1e4"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_partkey")
    },

    // running (cumulative) spend per customer over order history.
    Q(
      "q_win_running",
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) * 100 AS BIGINT) AS running_spend_x1e2
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""",
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          Dec.asLong(sum(Dec.money(col("o_totalprice"))).over(w), 2).as("running_spend_x1e2"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // RANGE frame over event TIME (vs q_win_frame's ROWS frame): trailing
    // 10-minute count/sum per user — the "activity in the last N minutes"
    // shape. RANGE is the determinism-safe frame for timestamps: all peers
    // at an equal order value are in or out TOGETHER, so tie order can
    // never change the result (a ROWS frame over a non-unique key would).
    // One keyed window shuffle on user_id.
    Q(
      "q_win_range_frame",
      """SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_10m,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_10m_x1e4
        |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""",
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("tus")
        .rangeBetween(-600000000L, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tus"), col("value"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_10m"),
          Dec.asLong(sum(Dec.d4(col("value"))).over(w), 4).as("sum_10m_x1e4"))
        .orderBy("event_id")
    },

    // explicit GROUPING SETS (the general form rollup/cube specialize):
    // (flag, status), (flag), and grand total in ONE pass — the same
    // Expand + two-phase hash agg plan as q_agg_rollup, with per-row
    // grouping flags distinguishing the levels.
    Q(
      "q_agg_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) * 100 AS BIGINT) AS sum_qty_x1e2
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
          grouping(col("l_linestatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"),
          Dec.asLong(sum(Dec.money(col("l_quantity"))), 2).as("sum_qty_x1e2"))
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n", "sum_qty_x1e2")
        .transform(boundedSort(_, col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus")))
    },

    // distribution ranks per partition: quartile (ntile) + integer percent
    // rank, computed with the all-integer ((rank-1)*1e6) div (n-1) formula
    // instead of percent_rank()'s double (floor-div is bit-exact across
    // engines; double division then cast is not — Spark truncates, DuckDB
    // rounds). One keyed window shuffle on the segment.
    Q(
      "q_win_ntile",
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(((rank() OVER w - 1) * 1000000) // (COUNT(*) OVER (PARTITION BY c_mktsegment) - 1) AS BIGINT) AS pr_x1e6
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""",
    ) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      val seg = Window.partitionBy("c_mktsegment")
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).cast("long").as("quartile"),
          rank().over(w).cast("long").as("_rk"),
          count(lit(1)).over(seg).cast("long").as("_n"))
        .withColumn("pr_x1e6", expr("CAST(((_rk - 1) * 1000000L) div (_n - 1) AS BIGINT)"))
        .select("c_custkey", "c_mktsegment", "quartile", "pr_x1e6")
        .orderBy("c_custkey")
    },

    // PIVOT: per-nation customer counts spread across the five market
    // segments as columns. The pivot values are an explicit literal list —
    // the scale-safe form: pivot without values makes the engine collect
    // the distinct segment set to the driver before planning.
    Q(
      "q_pivot",
      """SELECT c_nationkey,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS n_automobile,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS n_building,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS n_furniture,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS n_household,
        |  CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS n_machinery
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    ) { (s, dir) =>
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      Tables.customer(s, dir)
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment", segs)
        .agg(count(lit(1)))
        .select(col("c_nationkey") +:
          segs.map(v => coalesce(col(v), lit(0L)).as(s"n_${v.toLowerCase}")): _*)
        .orderBy("c_nationkey")
    },

    // UNPIVOT (melt): per-priority order metrics back to long form — the
    // inverse reshape, row-local after one aggregation shuffle.
    Q(
      "q_unpivot",
      """WITH a AS (SELECT o_orderpriority,
        |             CAST(COUNT(*) AS BIGINT) AS n_orders,
        |             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
        |           FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM a
        |UNION ALL
        |SELECT o_orderpriority, 'n_customers' AS metric, n_customers AS value FROM a
        |ORDER BY o_orderpriority, metric""",
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("n_orders"), col("n_customers")), "metric", "value")
        .orderBy("o_orderpriority", "metric")
    },

    // Sessionization (gaps-and-islands): per-user sessions cut at >30-min
    // inactivity gaps — the batch twin of q_stream_session, and the shape
    // every clickstream/agent-trace pipeline needs before per-session
    // aggregation. One keyed shuffle (user_id); the boundary flag and the
    // running session counter share the same ordered window, and the
    // per-session rollup re-uses the user_id partitioning (session_id is
    // a refinement of the window key, so no second exchange of raw rows).
    Q(
      "q_sessionize",
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |        CASE WHEN LAG(ts) OVER w IS NULL
        |               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        |      FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
        |  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS dur_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""",
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val prev = lag(col("ts"), 1).over(w)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("new_s",
          when(prev.isNull || unix_micros(col("ts")) - unix_micros(prev) > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(w))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("start_us"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
        .orderBy("user_id", "session_id")
    },

    // Conversion funnel (click → later purchase), cohorted by first-click
    // day: the event-analytics staple. The per-user first-click window and
    // the per-user reduction share ONE user_id shuffle (the window key);
    // the cohort rollup then aggregates user-sized rows. Ratio is exact
    // integer ×1e4 floor-div (all counts non-negative).
    Q(
      "q_funnel",
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |w AS (SELECT user_id, event_type, ts,
        |        MIN(CASE WHEN event_type = 'click' THEN ts END)
        |          OVER (PARTITION BY user_id) AS first_click
        |      FROM e),
        |u AS (SELECT user_id, MIN(first_click) AS fc,
        |        MIN(CASE WHEN event_type = 'purchase' AND ts > first_click THEN ts END) AS conv_ts
        |      FROM w WHERE first_click IS NOT NULL GROUP BY user_id)
        |SELECT CAST(fc AS DATE) AS cohort,
        |  CAST(COUNT(*) AS BIGINT) AS n_clicked,
        |  CAST(COUNT(conv_ts) AS BIGINT) AS n_converted,
        |  CAST(COUNT(conv_ts) * 10000 // COUNT(*) AS BIGINT) AS conv_x1e4
        |FROM u GROUP BY 1 ORDER BY cohort""",
    ) { (s, dir) =>
      val wu = Window.partitionBy("user_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("first_click",
          min(when(col("event_type") === "click", col("ts"))).over(wu))
        .filter(col("first_click").isNotNull)
        .groupBy("user_id")
        .agg(min(col("first_click")).as("fc"),
          min(when(col("event_type") === "purchase" && col("ts") > col("first_click"),
            col("ts"))).as("conv_ts"))
        .groupBy(to_date(col("fc")).as("cohort"))
        .agg(count(lit(1)).as("n_clicked"),
          count(col("conv_ts")).as("n_converted"),
          expr("CAST(count(conv_ts) * 10000L div count(1) AS BIGINT)").as("conv_x1e4"))
        .orderBy("cohort")
    },

    // Weekly cohort retention: users grouped by their first active week,
    // retained = active again the NEXT week. Weeks are integer
    // epoch-microsecond div (identical arithmetic in both engines —
    // date_trunc('week') start-of-week conventions are not portable).
    // Same one-shuffle shape as q_funnel: per-user window + reduction on
    // the user_id key, then a cohort rollup of user-sized rows.
    Q(
      "q_retention",
      """WITH a AS (SELECT user_id,
        |        epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk FROM events),
        |w AS (SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS wk0 FROM a),
        |u AS (SELECT user_id, MIN(wk0) AS wk0,
        |        MAX(CASE WHEN wk = wk0 + 1 THEN 1 ELSE 0 END) AS retained
        |      FROM w GROUP BY user_id)
        |SELECT CAST(wk0 AS BIGINT) AS cohort_week,
        |  CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(retained) AS BIGINT) AS n_retained,
        |  CAST(SUM(retained) * 10000 // COUNT(*) AS BIGINT) AS ret_x1e4
        |FROM u GROUP BY wk0 ORDER BY cohort_week""",
    ) { (s, dir) =>
      val wu = Window.partitionBy("user_id")
      Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000L").as("wk"))
        .withColumn("wk0", min(col("wk")).over(wu))
        .groupBy("user_id")
        .agg(min(col("wk0")).as("wk0"),
          max(when(col("wk") === col("wk0") + 1, 1L).otherwise(0L)).as("retained"))
        .groupBy(col("wk0").as("cohort_week"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("retained")).cast("long").as("n_retained"),
          expr("CAST(sum(retained) * 10000L div count(1) AS BIGINT)").as("ret_x1e4"))
        .orderBy("cohort_week")
    },

    // Multi-touch attribution (r10) — the conversion-credit models next
    // to funnel/retention: each purchase credits the touch events
    // (view/click/signup) of the SAME user in the 7 days strictly
    // before it, under three standard models at once — first-touch,
    // last-touch, and linear (every in-window touch shares x1e4
    // equally); touchless purchases credit 'direct'. Join-free: both
    // roles live in one events relation, so the in-window touch
    // evidence attaches to each purchase row via user-keyed RANGE
    // windows over unix SECONDS (identical integers in both engines).
    // First/last selection is tie-deterministic WITHOUT depending on
    // peer-row order inside the RANGE frame: each touch packs
    // (sec-offset, event_id mod 1e5, channel code) into one BIGINT and
    // the frame takes MIN/MAX of the packed key — equal keys imply an
    // equal trailing channel code, so the decoded channel is unique
    // even on full collisions (the key stays < ~3e14 for a 10-year
    // second span — BIGINT-safe at any realistic scale). Scale: ONE
    // corpus pass, one user-keyed exchange shared by all three window
    // expressions, then a 4-row rollup.
    Q(
      "q_attribution",
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec, event_id,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'signup' THEN 3 END AS code
        |  FROM events WHERE event_type IN ('view','click','signup','purchase')),
        |k AS (SELECT user_id, event_type, sec,
        |    CASE WHEN code IS NOT NULL
        |         THEN (sec - 1704067200) * 1000000 + (event_id % 100000) * 10 + code END AS tkey,
        |    CASE WHEN code = 1 THEN 1 ELSE 0 END AS isv,
        |    CASE WHEN code = 2 THEN 1 ELSE 0 END AS isc,
        |    CASE WHEN code = 3 THEN 1 ELSE 0 END AS iss
        |  FROM e),
        |w AS (SELECT user_id, event_type,
        |    MIN(tkey) OVER fr AS fkey, MAX(tkey) OVER fr AS lkey,
        |    SUM(isv) OVER fr AS nv, SUM(isc) OVER fr AS nc, SUM(iss) OVER fr AS ns
        |  FROM k
        |  WINDOW fr AS (PARTITION BY user_id ORDER BY sec
        |                RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)),
        |p AS (SELECT COALESCE(nv, 0) + COALESCE(nc, 0) + COALESCE(ns, 0) AS n,
        |        fkey, lkey, COALESCE(nv, 0) AS nv, COALESCE(nc, 0) AS nc, COALESCE(ns, 0) AS ns
        |      FROM w WHERE event_type = 'purchase'),
        |c AS (SELECT ch.channel, ch.code2,
        |        CAST(SUM(CASE WHEN p.n = 0 THEN CASE WHEN ch.code2 = 0 THEN 1 ELSE 0 END
        |                      WHEN p.fkey % 10 = ch.code2 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch,
        |        CAST(SUM(CASE WHEN p.n = 0 THEN CASE WHEN ch.code2 = 0 THEN 1 ELSE 0 END
        |                      WHEN p.lkey % 10 = ch.code2 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch,
        |        CAST(SUM(CASE WHEN p.n = 0 THEN CASE WHEN ch.code2 = 0 THEN 10000 ELSE 0 END
        |                      ELSE (CASE ch.code2 WHEN 1 THEN p.nv WHEN 2 THEN p.nc
        |                            WHEN 3 THEN p.ns ELSE 0 END) * 10000 // p.n END) AS BIGINT) AS linear_x1e4
        |      FROM p, (VALUES ('view', 1), ('click', 2), ('signup', 3), ('direct', 0)) ch(channel, code2)
        |      GROUP BY ch.channel, ch.code2)
        |SELECT channel, first_touch, last_touch, linear_x1e4 FROM c ORDER BY channel""",
    ) { (s, dir) =>
      val fr = Window.partitionBy("user_id").orderBy("sec")
        .rangeBetween(-604800L, -1L)
      val k = Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click", "signup", "purchase"))
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 1000000L").as("sec"), col("event_id"))
        .withColumn("code",
          when(col("event_type") === "view", 1L)
            .when(col("event_type") === "click", 2L)
            .when(col("event_type") === "signup", 3L))
        .withColumn("tkey",
          when(col("code").isNotNull,
            (col("sec") - 1704067200L) * 1000000L + (col("event_id") % 100000L) * 10L + col("code")))
      // all five frame aggregates in ONE projection, so Catalyst plans a
      // single Window operator (chained withColumn interposes Projects
      // that defeat the window-collapse rule → four passes over the data)
      val p = k
        .select(col("user_id"), col("event_type"),
          min(col("tkey")).over(fr).as("fkey"),
          max(col("tkey")).over(fr).as("lkey"),
          coalesce(sum(when(col("code") === 1, 1L).otherwise(0L)).over(fr), lit(0L)).as("nv"),
          coalesce(sum(when(col("code") === 2, 1L).otherwise(0L)).over(fr), lit(0L)).as("nc"),
          coalesce(sum(when(col("code") === 3, 1L).otherwise(0L)).over(fr), lit(0L)).as("ns"))
        .filter(col("event_type") === "purchase")
        .withColumn("n", col("nv") + col("nc") + col("ns"))
      val channels = Seq(("view", 1L), ("click", 2L), ("signup", 3L), ("direct", 0L))
      import s.implicits._
      val ch = channels.toDF("channel", "code2")
      p.crossJoin(broadcast(ch))
        .groupBy("channel")
        .agg(
          sum(when(col("n") === 0, when(col("code2") === 0, 1L).otherwise(0L))
            .otherwise(when(col("fkey") % 10 === col("code2"), 1L).otherwise(0L)))
            .cast("long").as("first_touch"),
          sum(when(col("n") === 0, when(col("code2") === 0, 1L).otherwise(0L))
            .otherwise(when(col("lkey") % 10 === col("code2"), 1L).otherwise(0L)))
            .cast("long").as("last_touch"),
          sum(when(col("n") === 0, when(col("code2") === 0, 10000L).otherwise(0L))
            .otherwise(expr("""(CASE code2 WHEN 1 THEN nv WHEN 2 THEN nc
                              | WHEN 3 THEN ns ELSE 0 END) * 10000L div n""".stripMargin)))
            .cast("long").as("linear_x1e4"))
        .orderBy("channel")
    },

    // Mode (most frequent value) per group with a DETERMINISTIC tie-break
    // (count DESC, then lexicographic) — max_by alone ties arbitrarily,
    // which can never hash-match across engines. Two-phase: one partial-
    // agg'd keyed shuffle to (user, type) counts, then a row_number window
    // over ≤5 rows per user — the window input is already aggregate-sized.
    Q(
      "q_agg_mode",
      """SELECT user_id, event_type AS mode_event_type, n FROM (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
        |  FROM events GROUP BY user_id, event_type)
        |WHERE rn = 1 ORDER BY user_id""",
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type"))
      Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_event_type"), col("n"))
        .orderBy("user_id")
    },

    // Fixed-width histogram: events.value binned into 50-unit buckets per
    // event type. Binning is row-local integer arithmetic on the exact
    // ×1e4 value (value ≥ 0 in this corpus, so Spark's truncating `div`
    // and DuckDB's flooring `//` agree); the only shuffle carries
    // (type, bucket) partial aggregates — the canonical distributed-
    // histogram plan at any scale.
    Q(
      "q_histogram",
      """WITH b AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(38,4)) * 10000 AS BIGINT) AS v4
        |  FROM events)
        |SELECT event_type, CAST(v4 // 500000 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v4) AS BIGINT) AS sum_v_x1e4
        |FROM b GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""",
    ) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), Dec.asLong(col("value"), 4).as("v4"))
        .withColumn("bucket", expr("v4 div 500000"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"), sum(col("v4")).cast("long").as("sum_v_x1e4"))
        .orderBy("event_type", "bucket")
    },

    // σ-outlier detection (the sample-cleaning pass of a training
    // pipeline) with EXACT arithmetic: |x−μ| > kσ is evaluated as the
    // cross-multiplied integer inequality (n·x − S)² > k²·(n·Q − S²) —
    // no sqrt, no float μ/σ, so both engines agree bit-for-bit. One agg
    // pass for per-type moments (exact ×1e4 / ×1e8 integer sums), the
    // tiny per-type stats broadcast back over one scan, per-type rollup.
    // Magnitude audit: n·v4 ≤ ~6e13 (long), squared ≤ ~4e27 — inside
    // DECIMAL(38,0) on Spark and HUGEINT on DuckDB; never a silent
    // overflow on either engine.
    Q(
      "q_anomaly_sigma",
      """WITH b AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(38,4)) * 10000 AS BIGINT) AS v4
        |  FROM events),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v4) AS HUGEINT) AS s4,
        |    SUM(CAST(v4 AS HUGEINT) * v4) AS q8
        |  FROM b GROUP BY event_type)
        |SELECT b.event_type, n, CAST(s4 // n AS BIGINT) AS mean_x1e4,
        |  CAST(SUM(CASE WHEN (n * v4 - s4) * (n * v4 - s4)
        |                     > 4 * (n * q8 - s4 * s4) THEN 1 ELSE 0 END) AS BIGINT) AS beyond_2s,
        |  CAST(SUM(CASE WHEN (n * v4 - s4) * (n * v4 - s4)
        |                     > 9 * (n * q8 - s4 * s4) THEN 1 ELSE 0 END) AS BIGINT) AS beyond_3s
        |FROM b JOIN st ON st.event_type = b.event_type
        |GROUP BY b.event_type, n, s4
        |ORDER BY b.event_type""",
    ) { (s, dir) =>
      val b = Tables.events(s, dir)
        .select(col("event_type"), Dec.asLong(col("value"), 4).as("v4"))
      val st = b.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("v4")).cast(DecimalType(38, 0)).as("s4"),
        sum(col("v4").cast(DecimalType(19, 0)) * col("v4")).cast(DecimalType(38, 0)).as("q8"))
      b.join(broadcast(st), "event_type")
        .withColumn("dev", expr("CAST(n * v4 AS DECIMAL(38,0)) - s4"))
        .withColumn("varnum", expr("CAST(n AS DECIMAL(38,0)) * q8 - s4 * s4"))
        .groupBy(col("event_type"), col("n"), col("s4"))
        .agg(
          sum(when(expr("dev * dev > 4 * varnum"), 1L).otherwise(0L)).cast("long").as("beyond_2s"),
          sum(when(expr("dev * dev > 9 * varnum"), 1L).otherwise(0L)).cast("long").as("beyond_3s"))
        .select(col("event_type"), col("n"),
          expr("CAST(s4 div n AS BIGINT)").as("mean_x1e4"),
          col("beyond_2s"), col("beyond_3s"))
        .transform(boundedSort(_, col("event_type")))
    },

    // Time-series resample + gap-fill: hourly counts per type on a
    // COMPLETE hour spine (missing hours materialized as 0), with
    // forward-fill (last observation carried forward) — the resampling
    // pass time-series features need before joining onto a regular grid.
    // Scale shape: the raw scan collapses to (type, hour) counts first
    // (two-phase agg); the spine is generated from a one-row broadcast
    // bounds and joined against the AGGREGATE-sized counts, never the
    // raw events; the ffill window partitions by type over spine-sized
    // rows. No driver loops, no global window.
    Q(
      "q_ts_resample",
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hh,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT MIN(hh) AS mn, MAX(hh) AS mx FROM h),
        |types AS (SELECT DISTINCT event_type FROM h),
        |spine AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hh
        |          FROM types, bounds),
        |j AS (SELECT s.event_type, s.hh, COALESCE(h.n, 0) AS n, h.n AS n_raw
        |      FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.hh = s.hh)
        |SELECT event_type, hh, n, (n_raw IS NULL) AS is_gap,
        |  COALESCE(last_value(n_raw IGNORE NULLS) OVER (
        |      PARTITION BY event_type ORDER BY hh
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS n_ff
        |FROM j ORDER BY event_type, hh""",
    ) { (s, dir) =>
      val h = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hh"))
        .agg(count(lit(1)).as("n"))
      val bounds = h.agg(min(col("hh")).as("mn"), max(col("hh")).as("mx"))
      val spine = h.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(expr("sequence(mn, mx, interval 1 hour)")).as("hh"))
      val w = Window.partitionBy("event_type").orderBy("hh")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(h, Seq("event_type", "hh"), "left")
        .select(col("event_type"), col("hh"),
          coalesce(col("n"), lit(0L)).as("n"), col("n").as("n_raw"))
        .withColumn("is_gap", col("n_raw").isNull)
        .withColumn("n_ff", coalesce(last(col("n_raw"), ignoreNulls = true).over(w), lit(0L)))
        .drop("n_raw")
        .orderBy("event_type", "hh")
    },

    // Time-series LINEAR interpolation (r10) — the gap-fill
    // q_ts_resample's forward-fill can't express: a missing hour takes
    // the straight line between its surrounding observations (edge gaps
    // extend the nearest one), which is what metric backfill and feature
    // grids actually want for continuous series. Exactness: interpolation
    // positions are the spine ROW NUMBERS (the spine is a uniform 1-hour
    // grid, so rank is an affine image of epoch time and the weights are
    // identical) — no epoch()/extract divergence between engines — and
    // the fill is the integer-weighted mean (pv·(nr−rn) + nv·(rn−pr))
    // div (nr−pr): all-BIGINT, non-negative, so Spark's truncating div
    // and DuckDB's flooring // agree. Scale shape: same as q_ts_resample
    // — the corpus collapses to (type, hour) counts first, the spine is
    // aggregate-sized, and BOTH fill directions are windows over
    // spine-sized rows partitioned by type; the raw events are scanned
    // once and never re-sorted.
    Q(
      "q_ts_interpolate",
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hh,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |bounds AS (SELECT MIN(hh) AS mn, MAX(hh) AS mx FROM h),
        |types AS (SELECT DISTINCT event_type FROM h),
        |spine AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hh
        |          FROM types, bounds),
        |j AS (SELECT s.event_type, s.hh, h.n AS n_raw,
        |        ROW_NUMBER() OVER (PARTITION BY s.event_type ORDER BY s.hh) AS rn
        |      FROM spine s LEFT JOIN h ON h.event_type = s.event_type AND h.hh = s.hh),
        |w AS (SELECT event_type, hh, n_raw, rn,
        |    last_value(n_raw IGNORE NULLS) OVER pw AS pv,
        |    last_value(CASE WHEN n_raw IS NOT NULL THEN rn END IGNORE NULLS) OVER pw AS pr,
        |    first_value(n_raw IGNORE NULLS) OVER nw AS nv,
        |    first_value(CASE WHEN n_raw IS NOT NULL THEN rn END IGNORE NULLS) OVER nw AS nr
        |  FROM j
        |  WINDOW pw AS (PARTITION BY event_type ORDER BY hh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         nw AS (PARTITION BY event_type ORDER BY hh ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, hh, (n_raw IS NULL) AS is_gap,
        |  CAST(COALESCE(n_raw,
        |    CASE WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv
        |         ELSE (pv * (nr - rn) + nv * (rn - pr)) // (nr - pr) END) AS BIGINT) AS n_interp
        |FROM w ORDER BY event_type, hh""",
    ) { (s, dir) =>
      val h = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hh"))
        .agg(count(lit(1)).as("n"))
      val bounds = h.agg(min(col("hh")).as("mn"), max(col("hh")).as("mx"))
      val spine = h.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(expr("sequence(mn, mx, interval 1 hour)")).as("hh"))
      val ord = Window.partitionBy("event_type").orderBy("hh")
      val pw = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nw = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(h, Seq("event_type", "hh"), "left")
        .select(col("event_type"), col("hh"), col("n").as("n_raw"))
        .withColumn("rn", row_number().over(ord).cast("long"))
        .withColumn("pv", last(col("n_raw"), ignoreNulls = true).over(pw))
        .withColumn("pr", last(when(col("n_raw").isNotNull, col("rn")), ignoreNulls = true).over(pw))
        .withColumn("nv", first(col("n_raw"), ignoreNulls = true).over(nw))
        .withColumn("nr", first(when(col("n_raw").isNotNull, col("rn")), ignoreNulls = true).over(nw))
        .select(col("event_type"), col("hh"), col("n_raw").isNull.as("is_gap"),
          coalesce(col("n_raw"),
            when(col("pv").isNull, col("nv"))
              .when(col("nv").isNull, col("pv"))
              .otherwise(expr("(pv * (nr - rn) + nv * (rn - pr)) div (nr - pr)")))
            .cast("long").as("n_interp"))
        .orderBy("event_type", "hh")
    },

    // Seasonal decomposition + residual anomaly (r10) — the screen
    // q_anomaly_sigma can't run: traffic has an hour-of-day shape, so a
    // 3 a.m. lull and a noon spike are both "normal" while the SAME
    // absolute count is anomalous at one and routine at the other.
    // Baseline = per (type, hour-of-day) mean/variance over the observed
    // days; each (type, hour) cell is then flagged against ITS OWN
    // seasonal cell via the cross-multiplied integer inequality
    // (k·n − sn)² > 9·(k·snn − sn²) ⇔ |n − mean| > 3σ — exact, no
    // sqrt, no float. The baseline attaches as a WINDOW over (type, hod)
    // rather than an aggregate-then-rejoin: a rejoin consumes the cell
    // relation twice and its "shared" scan silently forks under column
    // pruning (the q17/weighted-median defect class) — the window reads
    // it once by construction. Scale: one corpus collapse to (type,
    // hour) counts, then one aggregate-sized exchange to (type, hod)
    // partitions; no joins anywhere.
    Q(
      "q_ts_seasonal",
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hh,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hh, n,
        |    CAST(extract(hour FROM hh) AS BIGINT) AS hod,
        |    CAST(COUNT(*) OVER sw AS BIGINT) AS k,
        |    CAST(SUM(n) OVER sw AS BIGINT) AS sn,
        |    SUM(CAST(n AS HUGEINT) * n) OVER sw AS snn
        |  FROM h
        |  WINDOW sw AS (PARTITION BY event_type, CAST(extract(hour FROM hh) AS BIGINT)))
        |SELECT event_type, hh, hod, n,
        |  CAST((sn * 10000) // k AS BIGINT) AS seasonal_mean_x1e4,
        |  (CAST(k * n - sn AS HUGEINT) * (k * n - sn)
        |     > 9 * (k * snn - CAST(sn AS HUGEINT) * sn)) AS is_anomaly
        |FROM w ORDER BY event_type, hh""",
    ) { (s, dir) =>
      val sw = Window.partitionBy(col("event_type"), hour(col("hh")).cast("long"))
      Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hh"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("hh"), hour(col("hh")).cast("long").as("hod"),
          col("n"),
          count(lit(1)).over(sw).as("k"),
          sum(col("n")).over(sw).as("sn"),
          sum(col("n").cast(DecimalType(19, 0)) * col("n")).over(sw)
            .cast(DecimalType(38, 0)).as("snn"))
        .select(col("event_type"), col("hh"), col("hod"), col("n"),
          expr("CAST((sn * 10000) div k AS BIGINT)").as("seasonal_mean_x1e4"),
          expr("""CAST(k * n - sn AS DECIMAL(38,0)) * (k * n - sn)
                 > 9 * (k * snn - CAST(sn AS DECIMAL(38,0)) * sn)""").as("is_anomaly"))
        .orderBy("event_type", "hh")
    },

    // Level-shift changepoint detection (r10) — the screen neither
    // q_anomaly_sigma (pointwise outliers against ONE global moment) nor
    // q_ts_seasonal (cells against their own hour-of-day baseline) runs:
    // a REGIME CHANGE moves every subsequent point, so each point is
    // individually "normal" against the new level and only the before/
    // after CONTRAST sees it. Statistic = the sliding two-sample
    // mean-shift |mean(prev 24h) − mean(next 24h)| at every interior
    // hour, flagged when the shift exceeds half the series' own global
    // mean — the classic windowed CUSUM alternative that needs no
    // recursion (CUSUM's running max is sequential by construction;
    // the two-window contrast is pure window algebra). Exactness: the
    // flag and the reported shift are integer cross-multiplications —
    // |sl·kr − sr·kl| · 2 · nt > st · kl · kr ⇔ |ml − mr| > (st/nt)/2 —
    // in DECIMAL(38,0)/HUGEINT, no float division anywhere; reported
    // means/shift use floor division (div and // agree on the
    // non-negative operands). Scale: the corpus collapses to (type, hour)
    // counts in one two-phase agg; the ±24-row windows and the per-type
    // totals all run over that AGGREGATE-sized relation partitioned by
    // type — no joins, no global window, edge hours (incomplete windows)
    // are emitted unflagged with NULL contrast rather than dropped.
    Q(
      "q_ts_changepoint",
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hh,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hh, n,
        |    CAST(COUNT(*) OVER lw AS BIGINT) AS kl, CAST(COALESCE(SUM(n) OVER lw, 0) AS BIGINT) AS sl,
        |    CAST(COUNT(*) OVER rw AS BIGINT) AS kr, CAST(COALESCE(SUM(n) OVER rw, 0) AS BIGINT) AS sr,
        |    CAST(COUNT(*) OVER tw AS BIGINT) AS nt, CAST(SUM(n) OVER tw AS BIGINT) AS st
        |  FROM h
        |  WINDOW lw AS (PARTITION BY event_type ORDER BY hh ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
        |         rw AS (PARTITION BY event_type ORDER BY hh ROWS BETWEEN 1 FOLLOWING AND 24 FOLLOWING),
        |         tw AS (PARTITION BY event_type))
        |SELECT event_type, hh, n,
        |  CASE WHEN kl = 24 AND kr = 24 THEN CAST((sl * 10000) // kl AS BIGINT) END AS mean_before_x1e4,
        |  CASE WHEN kl = 24 AND kr = 24 THEN CAST((sr * 10000) // kr AS BIGINT) END AS mean_after_x1e4,
        |  CASE WHEN kl = 24 AND kr = 24
        |       THEN CAST(abs(sl * kr - sr * kl) * 10000 // (kl * kr) AS BIGINT) END AS shift_x1e4,
        |  (kl = 24 AND kr = 24 AND
        |   CAST(abs(sl * kr - sr * kl) AS HUGEINT) * 2 * nt > CAST(st AS HUGEINT) * kl * kr) AS is_changepoint
        |FROM w ORDER BY event_type, hh""",
    ) { (s, dir) =>
      val ord = Window.partitionBy("event_type").orderBy("hh")
      val lw = ord.rowsBetween(-24, -1)
      val rw = ord.rowsBetween(1, 24)
      val tw = Window.partitionBy("event_type")
      val full = col("kl") === 24 && col("kr") === 24
      Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hh"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("hh"), col("n"),
          count(lit(1)).over(lw).cast("long").as("kl"),
          coalesce(sum(col("n")).over(lw), lit(0L)).cast("long").as("sl"),
          count(lit(1)).over(rw).cast("long").as("kr"),
          coalesce(sum(col("n")).over(rw), lit(0L)).cast("long").as("sr"),
          count(lit(1)).over(tw).cast("long").as("nt"),
          sum(col("n")).over(tw).cast("long").as("st"))
        .select(col("event_type"), col("hh"), col("n"),
          when(full, expr("CAST((sl * 10000) div kl AS BIGINT)")).as("mean_before_x1e4"),
          when(full, expr("CAST((sr * 10000) div kr AS BIGINT)")).as("mean_after_x1e4"),
          when(full, expr("CAST(abs(sl * kr - sr * kl) * 10000 div (kl * kr) AS BIGINT)"))
            .as("shift_x1e4"),
          (full && expr("CAST(abs(sl * kr - sr * kl) AS DECIMAL(38,0)) * 2 * nt")
            > expr("CAST(st AS DECIMAL(38,0)) * kl * kr")).as("is_changepoint"))
        .orderBy("event_type", "hh")
    },

    // Key-skew diagnosis (r10) — the pre-flight report a 100 TB pipeline
    // reads before picking join/agg strategies (q_join_skew_salted
    // APPLIES a salt; this measures whether one is needed and how wide):
    // per event type, the (type, user) key histogram collapses to
    // aggregate-sized stats — key count, hottest key's rows, exact
    // MEDIAN key size (cumulative-window machinery over the size-
    // distinct counts, q_anomaly_mad's shape — no percentile() buffering
    // a group in memory), hot/mean skew ratio, and the salt factor that
    // would level the hottest key to the mean (the number
    // q_join_skew_salted's SALT constant is chosen from). All integer:
    // ratios x1e4 floor-div, salt = ceil via (max·keys + total − 1) div
    // total. Scale: ONE corpus shuffle to (type, user) counts (partial-
    // agg'd), everything after runs on the aggregate relation.
    Q(
      "q_skew_stats",
      """WITH g AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS nk FROM g GROUP BY 1, 2),
        |w AS (SELECT event_type, c, nk,
        |        SUM(nk) OVER (PARTITION BY event_type ORDER BY c) AS cum,
        |        SUM(nk) OVER (PARTITION BY event_type) AS keys FROM d),
        |m AS (SELECT event_type, CAST(MAX(keys) AS BIGINT) AS n_keys,
        |        CAST(SUM(c * nk) AS BIGINT) AS n_rows,
        |        CAST(MAX(c) AS BIGINT) AS max_key_rows,
        |        CAST(MIN(CASE WHEN cum * 2 >= keys THEN c END) AS BIGINT) AS median_key_rows
        |      FROM w GROUP BY event_type)
        |SELECT event_type, n_rows, n_keys, max_key_rows, median_key_rows,
        |  CAST(n_rows * 10000 // n_keys AS BIGINT) AS mean_x1e4,
        |  CAST(max_key_rows * n_keys * 10000 // n_rows AS BIGINT) AS skew_x1e4,
        |  CAST((max_key_rows * n_keys + n_rows - 1) // n_rows AS BIGINT) AS salt_hint
        |FROM m ORDER BY event_type""",
    ) { (s, dir) =>
      val cumW = Window.partitionBy("event_type").orderBy("c")
      val totW = Window.partitionBy("event_type")
      Tables.events(s, dir)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
        .groupBy("event_type", "c").agg(count(lit(1)).as("nk"))
        .withColumn("cum", sum(col("nk")).over(cumW))
        .withColumn("keys", sum(col("nk")).over(totW))
        .groupBy("event_type")
        .agg(max(col("keys")).cast("long").as("n_keys"),
          sum(col("c") * col("nk")).cast("long").as("n_rows"),
          max(col("c")).cast("long").as("max_key_rows"),
          min(when(col("cum") * 2 >= col("keys"), col("c"))).cast("long").as("median_key_rows"))
        .select(col("event_type"), col("n_rows"), col("n_keys"), col("max_key_rows"),
          col("median_key_rows"),
          expr("CAST(n_rows * 10000 div n_keys AS BIGINT)").as("mean_x1e4"),
          expr("CAST(max_key_rows * n_keys * 10000 div n_rows AS BIGINT)").as("skew_x1e4"),
          expr("CAST((max_key_rows * n_keys + n_rows - 1) div n_rows AS BIGINT)").as("salt_hint"))
        .transform(boundedSort(_, col("event_type")))
    },

    Q(
      "q_topk_per_group",
      """SELECT * FROM (
        |  SELECT p_brand, p_partkey, CAST(CAST(p_retailprice AS DECIMAL(38,2)) * 100 AS BIGINT) AS price_x1e2,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part
        |) WHERE rn <= 3
        |ORDER BY p_brand, rn""",
    ) { (s, dir) =>
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, dir)
        .select(col("p_brand"), col("p_partkey"), Dec.asLong(col("p_retailprice"), 2).as("price_x1e2"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    },

    // Robust (MAD-based) anomaly detection (r8) — the median/MAD
    // complement of q_anomaly_sigma's mean/stddev: a long-tailed metric
    // poisons the mean and explodes sigma, so production monitors flag
    // on |x - median| > 3·MAD. EXACT distributed median: no percentile()
    // (that buffers every group value in executor memory — not a 100 TB
    // shape) and no float interpolation divergence; instead the corpus
    // collapses to the (type, value)-distinct COUNT relation (partial
    // agg'd), a cumulative window over that AGGREGATE-sized relation
    // finds the lo/hi middle elements, and med2 = lo + hi doubles the
    // median into exact integers (odd n: lo = hi). The same machinery
    // reruns on a = |2x - med2| for the MAD, and the flag compare
    // 2a > 3·mad4 stays all-integer end to end. Cost: two corpus scans
    // (med, then deviations) + one aggregate-sized window each — the
    // unavoidable two-pass price of an exact MAD.
    Q(
      "q_anomaly_mad",
      """WITH b AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(38,4)) * 10000 AS BIGINT) AS v4 FROM events),
        |g AS (SELECT event_type, v4, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |w AS (SELECT event_type, v4,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY v4) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n FROM g),
        |med AS (SELECT event_type, MAX(n) AS n,
        |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN v4 END)
        |      + MIN(CASE WHEN cum >= n // 2 + 1 THEN v4 END) AS med2
        |  FROM w GROUP BY event_type),
        |a AS (SELECT b.event_type, abs(2 * b.v4 - med.med2) AS a
        |  FROM b JOIN med ON b.event_type = med.event_type),
        |ga AS (SELECT event_type, a, COUNT(*) AS c FROM a GROUP BY 1, 2),
        |wa AS (SELECT event_type, a,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY a) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n FROM ga),
        |mad AS (SELECT event_type,
        |    MIN(CASE WHEN cum >= (n + 1) // 2 THEN a END)
        |      + MIN(CASE WHEN cum >= n // 2 + 1 THEN a END) AS mad4
        |  FROM wa GROUP BY event_type)
        |SELECT a.event_type, CAST(med.n AS BIGINT) AS n,
        |  CAST(med.med2 AS BIGINT) AS med2_x1e4, CAST(mad.mad4 AS BIGINT) AS mad4_x1e4,
        |  CAST(SUM(CASE WHEN 2 * a.a > 3 * mad.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM a JOIN med ON a.event_type = med.event_type
        |JOIN mad ON a.event_type = mad.event_type
        |GROUP BY a.event_type, med.n, med.med2, mad.mad4
        |ORDER BY a.event_type""",
    ) { (s, dir) =>
      def exactMed2(df: org.apache.spark.sql.DataFrame, vc: String)
          : org.apache.spark.sql.DataFrame = {
        val g = df.groupBy(col("event_type"), col(vc)).agg(count(lit(1)).as("c"))
        val wc = Window.partitionBy("event_type").orderBy(vc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = Window.partitionBy("event_type")
        g.withColumn("cum", sum(col("c")).over(wc))
          .withColumn("n", sum(col("c")).over(wn))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"),
            (min(when(expr("cum >= (n + 1) div 2"), col(vc)))
              + min(when(expr("cum >= n div 2 + 1"), col(vc)))).as(s"med2_$vc"))
      }
      val b = Tables.events(s, dir)
        .select(col("event_type"), Dec.asLong(col("value"), 4).as("v4"))
      val med = exactMed2(b, "v4") // (event_type, n, med2_v4)
      val a = b.join(broadcast(med), "event_type")
        .select(col("event_type"), abs(lit(2) * col("v4") - col("med2_v4")).as("a"))
      val mad = exactMed2(a, "a").select(col("event_type"), col("med2_a").as("mad4"))
      a.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("n"), col("med2_v4"), col("mad4"))
        .agg(sum(when(lit(2) * col("a") > lit(3) * col("mad4"), 1L).otherwise(0L))
          .cast("long").as("n_out"))
        .select(col("event_type"), col("n").cast("long").as("n"),
          col("med2_v4").cast("long").as("med2_x1e4"),
          col("mad4").cast("long").as("mad4_x1e4"), col("n_out"))
        .transform(boundedSort(_, col("event_type")))
    },

    // Empirical-CDF attachment / quantile normalization (r8) — map each
    // raw metric to its within-group cumulative distribution position,
    // the feature transform that makes heavy-tailed metrics comparable
    // across groups (and the exact form of cume_dist, whose built-in is
    // a double division that can round differently across engines):
    // cd = |{v ≤ x}|/n as an x1e6 integer rational, plus the decile
    // bucket 1 + ((n_le−1)·10) div n derived from it. The ≤-count comes
    // from a RANGE frame so tied values agree on their position
    // (row-frame counting would split ties arbitrarily). One keyed
    // window per type — parallelism = #types, no global window.
    // q_win_ntile covers rank-based percent_rank; this is the
    // value-based CDF, a different statistic under ties.
    Q(
      "q_win_cume_dist",
      """WITH b AS (SELECT event_id, event_type,
        |    CAST(CAST(value AS DECIMAL(38,4)) * 10000 AS BIGINT) AS v4 FROM events),
        |w AS (SELECT event_id, event_type,
        |    COUNT(*) OVER (PARTITION BY event_type
        |      ORDER BY v4 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM b)
        |SELECT event_id, event_type,
        |  CAST((n_le * 1000000) // n AS BIGINT) AS cd_x1e6,
        |  CAST(1 + ((n_le - 1) * 10) // n AS BIGINT) AS decile
        |FROM w ORDER BY event_id""",
    ) { (s, dir) =>
      val wLe = Window.partitionBy("event_type").orderBy("v4")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("event_type")
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type"), Dec.asLong(col("value"), 4).as("v4"))
        .withColumn("n_le", count(lit(1)).over(wLe))
        .withColumn("n", count(lit(1)).over(wAll))
        .select(col("event_id"), col("event_type"),
          expr("CAST((n_le * 1000000L) div n AS BIGINT)").as("cd_x1e6"),
          expr("CAST(1 + ((n_le - 1) * 10L) div n AS BIGINT)").as("decile"))
        .orderBy("event_id")
    },

    // Exact least-squares regression per group (r8) — SQL-standard
    // REGR_SLOPE / REGR_INTERCEPT / R² re-derived in integer-exact
    // arithmetic (the built-ins are float and rounding diverges across
    // engines): one partial-agg'd pass collects the five moments (Σx,
    // Σy, Σx², Σy², Σxy), then slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    // etc. land as x1e6 integer rationals. Negative numerators route
    // through sign·(|a| div b) so Spark's truncating `div` and DuckDB's
    // flooring `//` agree. The whole query is ONE two-phase aggregation
    // over the fact — the canonical "distributive statistic" shape that
    // scales to any corpus (moments fit in DECIMAL(38,0) to sf 10³).
    Q(
      "q_agg_regr",
      """WITH b AS (SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |st AS (SELECT rf, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM b GROUP BY rf),
        |d AS (SELECT rf, n, sx, sy,
        |    n * sxy - sx * sy AS num, n * sxx - sx * sx AS denx,
        |    n * syy - sy * sy AS deny FROM st)
        |SELECT rf AS l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN num < 0 THEN -((-num * 1000000) // denx)
        |            ELSE (num * 1000000) // denx END AS BIGINT) AS slope_x1e6,
        |  CAST(CASE WHEN sy * denx - num * sx < 0
        |            THEN -((-(sy * denx - num * sx) * 1000000) // (n * denx))
        |            ELSE ((sy * denx - num * sx) * 1000000) // (n * denx)
        |       END AS BIGINT) AS icept_x1e6,
        |  CAST(((abs(num) * 1000) // denx) * ((abs(num) * 1000) // deny)
        |       AS BIGINT) AS r2_x1e6
        |FROM d ORDER BY l_returnflag""",
    ) { (s, dir) =>
      val b = Tables.lineitem(s, dir).select(
        col("l_returnflag").as("rf"),
        col("l_quantity").cast("long").as("x"),
        Dec.asLong(col("l_extendedprice"), 2).as("y"))
      b.groupBy("rf")
        .agg(
          count(lit(1)).cast(DecimalType(38, 0)).as("n"),
          sum(col("x")).cast(DecimalType(38, 0)).as("sx"),
          sum(col("y")).cast(DecimalType(38, 0)).as("sy"),
          sum(col("x").cast(DecimalType(19, 0)) * col("x")).cast(DecimalType(38, 0)).as("sxx"),
          sum(col("y").cast(DecimalType(19, 0)) * col("y")).cast(DecimalType(38, 0)).as("syy"),
          sum(col("x").cast(DecimalType(19, 0)) * col("y")).cast(DecimalType(38, 0)).as("sxy"))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .withColumn("denx", expr("n * sxx - sx * sx"))
        .withColumn("deny", expr("n * syy - sy * sy"))
        .select(col("rf").as("l_returnflag"), col("n").cast("long").as("n"),
          expr("""CAST(CASE WHEN num < 0 THEN -((-num * 1000000) div denx)
                 ELSE (num * 1000000) div denx END AS BIGINT)""").as("slope_x1e6"),
          expr("""CAST(CASE WHEN sy * denx - num * sx < 0
                 THEN -((-(sy * denx - num * sx) * 1000000) div (n * denx))
                 ELSE ((sy * denx - num * sx) * 1000000) div (n * denx)
                 END AS BIGINT)""").as("icept_x1e6"),
          expr("""CAST(((abs(num) * 1000) div denx) * ((abs(num) * 1000) div deny)
                 AS BIGINT)""").as("r2_x1e6"))
        .transform(boundedSort(_, col("l_returnflag")))
    },

    // Pairwise correlation MATRIX (r10) — Pearson correlation between
    // every pair of event types' hourly value series, the metric-drift
    // screen ("which signals move together?") that q_agg_regr's single
    // x→y regression can't produce. Same integer-rational discipline as
    // regr: the corpus collapses to the (hour, type) aggregate FIRST
    // (one partial-agg'd scan), the pair relation is an equi-join of
    // that AGGREGATE-sized grid with itself on hour (types ordered, so
    // each unordered pair lands once), and the five moments per pair are
    // DECIMAL(38,0)-exact. Output is sign(num) plus corr²·1e6 via the
    // same two-truncation rational regr uses for R² — no sqrt, no float,
    // hash-identical across engines. Scale: the self-join and everything
    // above it runs on |types|·|hours| rows regardless of corpus size;
    // moments fit DECIMAL(38,0) to sf ~10³ (|num|·1000 peaks ~1e27 at
    // sf0.1, ceiling 1e38).
    Q(
      "q_agg_corr_matrix",
      """WITH e AS (SELECT date_trunc('hour', ts) AS hh, event_type,
        |    CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT) AS v2 FROM events),
        |g AS (SELECT hh, event_type, CAST(SUM(v2) AS BIGINT) AS v FROM e GROUP BY 1, 2),
        |p AS (SELECT a.event_type AS ta, b.event_type AS tb, a.v AS x, b.v AS y
        |      FROM g a JOIN g b ON a.hh = b.hh AND a.event_type < b.event_type),
        |st AS (SELECT ta, tb, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM p GROUP BY ta, tb),
        |d AS (SELECT ta, tb, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS denx, n * syy - sy * sy AS deny FROM st)
        |SELECT ta, tb, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN denx = 0 OR deny = 0 OR num = 0 THEN 0
        |            WHEN num < 0 THEN -1 ELSE 1 END AS BIGINT) AS corr_sign,
        |  CAST(CASE WHEN denx = 0 OR deny = 0 THEN 0
        |       ELSE ((abs(num) * 1000) // denx) * ((abs(num) * 1000) // deny)
        |       END AS BIGINT) AS corr2_x1e6
        |FROM d ORDER BY ta, tb""",
    ) { (s, dir) =>
      val g = Tables.events(s, dir)
        .select(date_trunc("hour", col("ts")).as("hh"), col("event_type"),
          Dec.asLong(col("value"), 2).as("v2"))
        .groupBy("hh", "event_type")
        .agg(sum("v2").as("v"))
      val p = g.as("a").join(g.as("b"),
          col("a.hh") === col("b.hh") && col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
          col("a.v").as("x"), col("b.v").as("y"))
      p.groupBy("ta", "tb")
        .agg(
          count(lit(1)).cast(DecimalType(38, 0)).as("n"),
          sum(col("x")).cast(DecimalType(38, 0)).as("sx"),
          sum(col("y")).cast(DecimalType(38, 0)).as("sy"),
          sum(col("x").cast(DecimalType(19, 0)) * col("x")).cast(DecimalType(38, 0)).as("sxx"),
          sum(col("y").cast(DecimalType(19, 0)) * col("y")).cast(DecimalType(38, 0)).as("syy"),
          sum(col("x").cast(DecimalType(19, 0)) * col("y")).cast(DecimalType(38, 0)).as("sxy"))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .withColumn("denx", expr("n * sxx - sx * sx"))
        .withColumn("deny", expr("n * syy - sy * sy"))
        .select(col("ta"), col("tb"), col("n").cast("long").as("n"),
          expr("""CAST(CASE WHEN denx = 0 OR deny = 0 OR num = 0 THEN 0
                 WHEN num < 0 THEN -1 ELSE 1 END AS BIGINT)""").as("corr_sign"),
          expr("""CAST(CASE WHEN denx = 0 OR deny = 0 THEN 0
                 ELSE ((abs(num) * 1000) div denx) * ((abs(num) * 1000) div deny)
                 END AS BIGINT)""").as("corr2_x1e6"))
        .transform(boundedSort(_, col("ta"), col("tb")))
    },

    // Longest-streak / gaps-and-islands (r8) — per-user activity streaks
    // over consecutive calendar days, the canonical engagement metric the
    // window family was still missing (q_sessionize groups by a time GAP
    // on raw events; this groups by calendar-day ISLANDS on the distinct
    // day set — different statistic, different shape). The islands trick:
    // dayNumber − row_number over per-user day order is constant exactly
    // within a run of consecutive days, so one distinct + one keyed
    // window + two aggregations produce total active days, best streak,
    // and streak count. All integer (epoch-day arithmetic). Scale: the
    // distinct collapses the corpus to (user, day) — bounded by
    // users × calendar span — and the window partitions by user, so no
    // global sort anywhere; parallelism = #users.
    Q(
      "q_win_streaks",
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |r AS (SELECT user_id, day,
        |    CAST(day - DATE '1970-01-01' AS BIGINT)
        |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp FROM d),
        |st AS (SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
        |  CAST(MAX(len) AS BIGINT) AS best_streak, CAST(COUNT(*) AS BIGINT) AS n_streaks
        |FROM st GROUP BY user_id ORDER BY user_id""",
    ) { (s, dir) =>
      val d = Tables.events(s, dir)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      d.withColumn("grp",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
            - row_number().over(Window.partitionBy("user_id").orderBy("day")))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum("len").cast("long").as("n_days"),
          max("len").cast("long").as("best_streak"),
          count(lit(1)).cast("long").as("n_streaks"))
        .orderBy("user_id")
    },

    // Exact WEIGHTED median (r8) — the robust center of a weighted
    // distribution (here: price weighted by shipped quantity per return
    // flag — "the price of the median shipped unit", which differs from
    // the median of line prices whenever cheap lines ship big
    // quantities). Same doubling discipline as q_anomaly_mad's exact
    // median — lo = min{v : cum ≥ (W+1) div 2}, hi = min{v : cum ≥
    // W div 2 + 1}, wmed2 = lo + hi — but the cumulative walks SUMMED
    // WEIGHTS over the (group, value)-distinct relation, computed as a
    // hierarchical prefix sum (see the plan note in the body) so no
    // window is ever keyed by the tiny group column alone. percentile()
    // built-ins buffer whole groups and interpolate in float; this
    // neither buffers nor rounds.
    Q(
      "q_agg_weighted_median",
      """WITH b AS (SELECT l_returnflag AS rf,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p2,
        |    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |g AS (SELECT rf, p2, SUM(w) AS w FROM b GROUP BY 1, 2),
        |c AS (SELECT rf, p2,
        |    SUM(w) OVER (PARTITION BY rf ORDER BY p2) AS cum,
        |    SUM(w) OVER (PARTITION BY rf) AS tw FROM g)
        |SELECT rf AS l_returnflag, CAST(MAX(tw) AS BIGINT) AS total_w,
        |  CAST(MIN(CASE WHEN cum >= (tw + 1) // 2 THEN p2 END)
        |     + MIN(CASE WHEN cum >= tw // 2 + 1 THEN p2 END) AS BIGINT) AS wmed2_x1e2
        |FROM c GROUP BY rf ORDER BY rf""",
    ) { (s, dir) =>
      // HIERARCHICAL cumulative sum (r8 plan fix): the one-window-per-
      // group form sorts each group's whole (value → weight) relation in
      // a SINGLE task (3 return flags = 3 tasks — dead at 100 TB, where
      // the distinct-price relation is ~1e8 rows/group). Instead: cum =
      // (running sum over coarse VALUE BUCKETS, a group×~1e3-row window)
      // + (running sum WITHIN the bucket, windows keyed by (group,
      // bucket) — parallelism = groups × buckets). Same exact cum at
      // every row, so the same lo+hi doubling; only the plan changed.
      val b = Tables.lineitem(s, dir).select(
        col("l_returnflag").as("rf"),
        Dec.asLong(col("l_extendedprice"), 2).as("p2"),
        col("l_quantity").cast("long").as("w"))
        // explicit null-key filters in the SHARED plan (the q15 lesson):
        // the (rf, bkt) rejoin infers isnotnull on the p2-derived bucket
        // on the probe branch only, which forked the (rf, p2) rollup's
        // exchange subtrees and silently scanned lineitem twice
        .filter(col("rf").isNotNull && col("p2").isNotNull)
      val g = b.groupBy("rf", "p2").agg(sum("w").as("w"))
        .withColumn("bkt", expr("p2 div 100000")) // ~1e3 coarse buckets
        // the rejoin's inferred isnotnull(bkt) pushes through the rollup
        // aggregate on the probe side only; stating it here puts the same
        // conjunct in BOTH branches so the shared subtrees stay identical
        .filter(col("bkt").isNotNull)
      // bucket-level prefix: tiny relation (groups × buckets), one window
      val perBkt = g.groupBy("rf", "bkt").agg(sum("w").as("bw"))
        .withColumn("boff",
          coalesce(sum(col("bw")).over(Window.partitionBy("rf").orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("tw", sum(col("bw")).over(Window.partitionBy("rf")))
      // within-bucket prefix: windows keyed by (rf, bkt) — fully parallel
      val wIn = Window.partitionBy("rf", "bkt").orderBy("p2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("icum", sum(col("w")).over(wIn))
        .join(broadcast(perBkt.select("rf", "bkt", "boff", "tw")), Seq("rf", "bkt"))
        .withColumn("cum", col("boff") + col("icum"))
        .groupBy("rf")
        .agg(max("tw").cast("long").as("total_w"),
          (min(when(expr("cum >= (tw + 1) div 2"), col("p2")))
            + min(when(expr("cum >= tw div 2 + 1"), col("p2"))))
            .cast("long").as("wmed2_x1e2"))
        .select(col("rf").as("l_returnflag"), col("total_w"), col("wmed2_x1e2"))
        .transform(boundedSort(_, col("l_returnflag")))
    },
  )
}
