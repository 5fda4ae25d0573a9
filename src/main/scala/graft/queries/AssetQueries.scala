package graft.queries

import graft.{Q, QueryPack}
import graft.sources.AssetGen
import org.apache.spark.sql.functions._

/** Queries over the generated wide nested event type (A27/B3): the
  * reference ingests 68-field `AssetMessage` JSON from Kafka; here the
  * same shapes — JSON-in-string, string arrays, array<struct<source,
  * values[]>> — are generated deterministically and queried with the
  * array/struct/JSON surface. The generator is a pure arithmetic
  * projection of `id`, so the oracle re-derives the aggregate directly
  * from range(0, n) in DuckDB (the JSON/array round-trips cancel out:
  * `net` = 'net-' || id%5, size(values) = (id+k)%2 + 1, …); AssetGenSpec
  * additionally asserts hand-computed generator facts.
  *
  * Scale: generation is a parallel `spark.range` projection; the query is
  * one explode + one partial-agg shuffle keyed by (attackSurface, source).
  */
object AssetQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(
    Q(
      "q_asset_nested",
      """WITH ids AS (SELECT range AS id FROM range(0, 10000)),
        |ex AS (SELECT id, unnest(range(0,3)) AS k FROM ids),
        |r AS (SELECT id,
        |    ['Other','Internal','External'][CAST(id % 3 AS INT) + 1] AS attackSurface,
        |    ['crowdstrike','qualys','tenable'][CAST((id + k) % 3 AS INT) + 1] AS cf_source,
        |    'net-' || CAST(id % 5 AS VARCHAR) AS net,
        |    CAST((id + k) % 2 AS BIGINT) + 1 AS n_values,
        |    CAST(id % 3 AS BIGINT) + 1 AS n_sources
        |  FROM ex)
        |SELECT attackSurface, cf_source, net,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_values) AS BIGINT) AS total_values,
        |  CAST(SUM(n_sources) AS BIGINT) AS sum_sources,
        |  CAST(COUNT(DISTINCT id) AS BIGINT) AS n_events
        |FROM r GROUP BY 1,2,3 ORDER BY 1,2,3""",
    ) { (s, _) =>
      AssetGen.assets(s, 10000L)
        .select(
          col("eventId"),
          col("attackSurface"),
          get_json_object(col("networkInterface"), "$.networkName").as("net"),
          size(col("contributingSources")).cast("long").as("n_sources"),
          explode_outer(col("customField1")).as("cf"))
        .groupBy(col("attackSurface"), col("cf.source").as("cf_source"), col("net"))
        .agg(
          count(lit(1)).as("n"),
          sum(size(col("cf.values"))).as("total_values"),
          sum(col("n_sources")).as("sum_sources"),
          countDistinct(col("eventId")).as("n_events"))
        .orderBy("attackSurface", "cf_source", "net")
    },

    // FULL-WIDTH asset event (r11; main.go:51-120): the 68-field layout
    // with ALL 40 customField copies — the B3 condensation covers type
    // shapes, this covers COLUMN-COUNT pressure (codegen method-size
    // splitting, 100-wide projections). The query flattens all 40
    // array<struct> fields into one explode and keys the rollup by
    // (attackSurface, source); three wide scalars join the output as a
    // distinct-combination count so the scalar width is read, not
    // pruned away. Scale: one generate-project pass + one keyed partial
    // agg; the 120-struct-per-row explode is the measured width cost
    // (bench records it beside q_asset_nested's 3-struct shape).
    Q(
      "q_asset_wide",
      """WITH ids AS (SELECT range AS id FROM range(0, 5000)),
        |ex AS (SELECT id, unnest(range(1, 41)) AS f FROM ids),
        |ex2 AS (SELECT id, f, unnest(range(0, 3)) AS j FROM ex),
        |r AS (SELECT id, f, j,
        |    ['Other','Internal','External'][CAST(id % 3 AS INT) + 1] AS attackSurface,
        |    ['crowdstrike','qualys','tenable'][CAST((id + f + j) % 3 AS INT) + 1] AS cf_source,
        |    CAST((id + f + j) % 2 AS BIGINT) + 1 AS n_values,
        |    ['dc-east','dc-west','colo-1','colo-2'][CAST(id % 4 AS INT) + 1]
        |      || '|' || ['linux','windows','macos'][CAST(id % 3 AS INT) + 1]
        |      || '|dept-' || CAST(id % 6 AS VARCHAR) AS dims
        |  FROM ex2)
        |SELECT attackSurface, cf_source,
        |  CAST(COUNT(*) AS BIGINT) AS n_structs,
        |  CAST(SUM(n_values) AS BIGINT) AS total_values,
        |  CAST(COUNT(DISTINCT id) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT dims) AS BIGINT) AS n_dims
        |FROM r GROUP BY 1,2 ORDER BY 1,2""",
    ) { (s, _) =>
      AssetGen.assetsWide(s, 5000L)
        .select(
          col("eventId"), col("attackSurface"),
          concat_ws("|", col("location"), col("platform"), col("department"))
            .as("dims"),
          explode(flatten(array((1 to 40).map(k => col(s"customField$k")): _*)))
            .as("cf"))
        .groupBy(col("attackSurface"), col("cf.source").as("cf_source"))
        .agg(
          count(lit(1)).as("n_structs"),
          sum(size(col("cf.values"))).as("total_values"),
          countDistinct(col("eventId")).as("n_events"),
          countDistinct(col("dims")).as("n_dims"))
        .orderBy("attackSurface", "cf_source")
    },
  )
}
