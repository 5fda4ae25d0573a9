package graft.queries

import graft.{Q, QueryPack}
import graft.sources.AssetGen
import org.apache.spark.sql.functions._

/** Queries over the generated wide nested event type (A27/B3): the
  * reference ingests 68-field `AssetMessage` JSON from Kafka; here the
  * same shapes — JSON-in-string, string arrays, array<struct<source,
  * values[]>> — are generated deterministically and queried with the
  * array/struct/JSON surface. Rows-only checked (the generator has no
  * DuckDB-side twin); AssetGenSpec asserts hand-computed facts.
  *
  * Scale: generation is a parallel `spark.range` projection; the query is
  * one explode + one partial-agg shuffle keyed by (attackSurface, source).
  */
object AssetQueries extends QueryPack {

  override def queries: Seq[Q] = Seq(
    Q.noOracle("q_asset_nested") { (s, _) =>
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
