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
  )
}
