package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) joins — the shuffle-elimination pattern SURVEY's
  * scale doctrine calls for on repeated fact-to-fact joins: both tables
  * pre-bucketed on the join key means the join reads matching buckets
  * directly, with NO exchange on either side. At 100 TB, a recurring
  * lineitem⋈orders pipeline pays the bucketing shuffle once at write
  * time instead of on every query.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkSessionFixture.{spark, sf}

  test("bucketed tables join without a shuffle on either side") {
    val base = Files.createTempDirectory("bucketed").toString
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/li").saveAsTable("li_bucketed")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/o").saveAsTable("o_bucketed")
    // at sf0.001 the optimizer would broadcast these tiny tables, hiding
    // the bucket alignment this test demonstrates; disable auto-broadcast
    // to get the plan a large fact-to-fact join would have.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // the whole plan may contain EXACTLY ONE exchange — the aggregation's
      // shuffle on o_custkey. Bucket-aligned join inputs must add none.
      // (Counting tree nodes, not text-prefix slicing: a join's child
      // Exchanges print BELOW the join line in formatted mode, so a prefix
      // check would be vacuous.)
      val exchanges = plan.linesIterator
        .filter(l => l.matches("""\(\d+\) .*Exchange.*""")).toSeq
      assert(exchanges.size == 1, s"expected only the agg exchange, got:\n${exchanges.mkString("\n")}\n$plan")
      assert(plan.contains("SelectedBucketsCount"), "scan did not use buckets")
      // and the result is right: equals the unbucketed join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
