package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function surface — SURVEY.md §2B "Scalar functions":
  * string / date / math / array / struct+map / JSON queries.
  *
  * Reference analogues: schema-directed JSON→columnar projection
  * (kafka-bench.rs:261-334 — here from_json with an explicit schema),
  * JSON-in-string fields (kafka-load-gen/main.go:197,203 — events.props),
  * fqdn/name synthesis (main.go:192-193), date strings (main.go:136-141),
  * cpuUsage math (main.go:215), contributingSources arrays (main.go:64,200)
  * and array<struct> custom fields (main.go:155-168).
  *
  * Determinism (SURVEY.md §7.5): outputs are strings, booleans, dates,
  * timestamps and BIGINTs only — no raw doubles, no decimals. DuckDB
  * dialect deltas handled in the oracle SQL: json_extract_string for
  * get_json_object, ((a%b)+b)%b for pmod, CAST(SUM(int) AS BIGINT)
  * because DuckDB's integer SUM yields HUGEINT, CAST(FLOOR/CEIL AS BIGINT)
  * because DuckDB's floor/ceil yield DOUBLE, list_* for array lambdas.
  *
  * Scale notes: everything here is a row-local expression inside
  * whole-stage codegen over a single scan — no shuffle except the final
  * oracle-mandated ORDER BY and the two-level aggregate in q_map_struct
  * (partial agg on (segment, nation) then (segment): both shuffles carry
  * pre-combined state, bounded by |segments|×|nations|).
  */
object FuncQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // Schema-directed JSON projection: parse props against an explicit
    // schema (the from_json analogue of the reference's json_to_arrow).
    Q(
      "q_json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""",
    ) { (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"), lit("k LONG")).getField("k").as("k"))
        .orderBy("event_id")
    },

    // JSON path functions + missing-path null handling + aggregation.
    Q(
      "q_json_funcs",
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_null,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even_k
        |FROM events GROUP BY event_type ORDER BY event_type""",
    ) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables.events(s, dir)
        .select(col("event_type"), k.as("k"),
          get_json_object(col("props"), "$.missing").as("miss"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("miss").isNull, 1).otherwise(0)).cast("long").as("n_missing_null"),
          sum(col("k")).as("sum_k"),
          sum(when(col("k") % 2 === 0, 1).otherwise(0)).cast("long").as("n_even_k"))
        .orderBy("event_type")
    },

    // VARIANT semi-structured path (new type in Spark 4): props is parsed
    // ONCE into the binary variant encoding, then every field access is a
    // typed variant_get — a cheap binary traversal — instead of
    // get_json_object re-parsing the JSON string per path. At 100 TB this
    // is the difference between one parse per row and one per (row ×
    // path); shredded variant columns also carry per-file statistics the
    // string never could. try_variant_get models the schema-drift case
    // (absent path → NULL, no exception). Oracle: DuckDB extracts the
    // same typed values from the JSON text — the OUTPUT contract of
    // variant is engine-portable even though the encoding is not.
    Q(
      "q_variant_json",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        |  CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        |FROM events GROUP BY event_type ORDER BY event_type""",
    ) { (s, dir) =>
      // spread before the parse: the single-file events scan is one task,
      // and the VARIANT binary encode is the most CPU-heavy per-row stage
      // in this pack — same doctrine as the shingling/codec passes
      Tables.spread(Tables.events(s, dir).select(col("event_type"), col("props")))
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("try_variant_get(v, '$.missing', 'string')").as("miss"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          max(col("k")).cast("long").as("max_k"),
          sum(when(col("miss").isNull, 1).otherwise(0)).cast("long").as("n_missing"))
        .orderBy("event_type")
    },

    // Corrupt-record accounting (the reference's parse-error discipline,
    // kafka-bench.rs:203-256: per-message serde_json errors are COUNTED
    // and the loop keeps going — a real ingest hits malformed rows on
    // day one and must neither die nor silently drop them). Planted
    // corruption: every event_id % 7 == 0 line loses its closing brace.
    // PERMISSIVE from_json routes those to _corrupt_record (row kept,
    // fields null) while clean rows project normally; the aggregate
    // proves both accounts: corrupt counted per type, clean values
    // still summed. Row-local in whole-stage codegen — the error path
    // costs nothing at 100 TB beyond the parse already being paid.
    // Oracle: DuckDB json_valid over the identically-corrupted text.
    Q(
      "q_json_corrupt",
      """WITH wire AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 7 = 0
        |         THEN substring(props, 1, length(props) - 1)
        |         ELSE props END AS line
        |  FROM events)
        |SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN json_valid(line) THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt,
        |  CAST(SUM(CASE WHEN json_valid(line)
        |                THEN COALESCE(CAST(json_extract_string(line, '$.k') AS BIGINT), 0)
        |                ELSE 0 END) AS BIGINT) AS sum_k_clean
        |FROM wire GROUP BY event_type ORDER BY event_type""",
    ) { (s, dir) =>
      val wire = Tables.events(s, dir)
        .select(col("event_type"),
          when(col("event_id") % 7 === 0,
            col("props").substr(lit(1), length(col("props")) - lit(1)))
            .otherwise(col("props")).as("line"))
      val opts = new java.util.HashMap[String, String]
      opts.put("mode", "PERMISSIVE")
      opts.put("columnNameOfCorruptRecord", "_corrupt_record")
      val parsed = wire.select(col("event_type"),
        from_json(col("line"), lit("k LONG, _corrupt_record STRING"), opts).as("p"))
      parsed
        .select(col("event_type"), col("p.k").as("k"),
          col("p._corrupt_record").as("corrupt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
          sum(when(col("corrupt").isNull, coalesce(col("k"), lit(0L)))
            .otherwise(0L)).as("sum_k_clean"))
        .orderBy("event_type")
    },

    // string functions: substr/upper/concat/length/regexp over names.
    Q(
      "q_str_funcs",
      """SELECT c_custkey,
        |  upper(substring(c_name, 10, 4)) AS id4,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat_ws('-', c_mktsegment, substring(c_name, 1, 8)) AS tag,
        |  CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS id_num,
        |  replace(c_name, 'Customer', 'Cust') AS short_name
        |FROM customer
        |WHERE c_name LIKE 'Customer#%' AND c_name LIKE '%9%'
        |ORDER BY c_custkey""",
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .filter(col("c_name").like("Customer#%") && col("c_name").like("%9%"))
        .select(col("c_custkey"),
          upper(substring(col("c_name"), 10, 4)).as("id4"),
          length(col("c_name")).cast("long").as("name_len"),
          concat_ws("-", col("c_mktsegment"), substring(col("c_name"), 1, 8)).as("tag"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("id_num"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"))
        .orderBy("c_custkey")
    },

    // date/time functions: extract, trunc, cast-to-date, day arithmetic.
    Q(
      "q_date_funcs",
      """SELECT o_orderkey,
        |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mth,
        |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_end
        |FROM orders ORDER BY o_orderkey""",
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mth"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          // DuckDB's month-trunc of a timestamp yields DATE; align on DATE.
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          col("o_orderdate").cast("date").as("d"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_end"))
        .orderBy("o_orderkey")
    },

    // math functions on exact integer domains: abs/pmod/floor/ceil/greatest.
    Q(
      "q_math_funcs",
      """SELECT l_suppkey,
        |  CAST(SUM(((l_orderkey % 7) + 7) % 7) AS BIGINT) AS sum_mod7,
        |  CAST(SUM(abs(l_orderkey - 3000)) AS BIGINT) AS sum_absdev,
        |  CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_floor_qty,
        |  CAST(SUM(CAST(CEIL(l_quantity) AS BIGINT)) AS BIGINT) AS sum_ceil_qty,
        |  CAST(MAX(GREATEST(l_linenumber, 4)) AS BIGINT) AS max_ln4,
        |  CAST(MIN(LEAST(l_linenumber, 2)) AS BIGINT) AS min_ln2
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_suppkey")
        .agg(
          sum(pmod(col("l_orderkey"), lit(7))).as("sum_mod7"),
          sum(abs(col("l_orderkey") - 3000)).as("sum_absdev"),
          sum(floor(col("l_quantity"))).as("sum_floor_qty"),
          sum(ceil(col("l_quantity"))).as("sum_ceil_qty"),
          max(greatest(col("l_linenumber"), lit(4))).cast("long").as("max_ln4"),
          min(least(col("l_linenumber"), lit(2))).cast("long").as("min_ln2"))
        .orderBy("l_suppkey")
    },

    // array functions over tokenized documents: size/distinct/contains/
    // element access/sort/lambda-filter (contributingSources shape).
    Q(
      "q_array_funcs",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  string_split(text, ' ')[1] AS first_word,
        |  list_sort(string_split(text, ' '))[1] AS min_word,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w = 'value')) AS BIGINT) AS n_value
        |FROM documents ORDER BY doc_id""",
    ) { (s, dir) =>
      val words = split(col("text"), " ")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(words).cast("long").as("n_words"),
          size(array_distinct(words)).cast("long").as("n_unique"),
          array_contains(words, "spark").as("has_spark"),
          element_at(words, 1).as("first_word"),
          element_at(sort_array(words), 1).as("min_word"),
          size(filter(words, w => w === "value")).cast("long").as("n_value"))
        .orderBy("doc_id")
    },

    // struct construction + field access, map_from_entries + lookup over
    // grouped (nation → customer-count) pairs per market segment.
    // Oracle states the same facts relationally: map lookup of NATION_3 ==
    // conditional count; first key of the entry-sorted map == MIN(n_name).
    Q(
      "q_map_struct",
      """SELECT c_mktsegment,
        |  CAST(COUNT(DISTINCT n_name) AS BIGINT) AS n_nations,
        |  CAST(COALESCE(SUM(CASE WHEN n_name = 'NATION_3' THEN 1 END), 0) AS BIGINT) AS nation3_cnt,
        |  MIN(n_name) AS first_nation
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    ) { (s, dir) =>
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val perNation = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("c_mktsegment", "n_name")
        .agg(count(lit(1)).as("cnt"))
      perNation
        .groupBy("c_mktsegment")
        .agg(map_from_entries(array_sort(collect_list(struct(col("n_name"), col("cnt")))))
          .as("nation_counts"))
        .select(col("c_mktsegment"),
          size(col("nation_counts")).cast("long").as("n_nations"),
          coalesce(element_at(col("nation_counts"), "NATION_3"), lit(0L)).as("nation3_cnt"),
          element_at(map_keys(col("nation_counts")), 1).as("first_nation"))
        .orderBy("c_mktsegment")
    },
  )
}
