package graft

import graft.sources.AssetGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The A27/B3 nested-event generator: type shapes, determinism, and the
  * streaming (rate-source) variant's plumbing.
  */
class AssetGenSpec extends AnyFunSuite {
  import SparkSessionFixture.spark

  test("asset schema carries every B3 type shape") {
    val sch = AssetGen.assets(spark, 10).schema
    assert(sch("createdTime").dataType == TimestampType)
    assert(sch("createdTimeEpoch").dataType == LongType)
    assert(sch("networkInterface").dataType == StringType) // JSON-in-string
    assert(sch("contributingSources").dataType == ArrayType(StringType, containsNull = false))
    assert(sch("cpuUsage").dataType == DoubleType)
    assert(sch("isActive").dataType == BooleanType)
    sch("customField1").dataType match {
      case ArrayType(StructType(fields), _) =>
        assert(fields.map(_.name).toSeq == Seq("source", "values"))
        assert(fields(1).dataType.isInstanceOf[ArrayType])
      case other => fail(s"customField1 is $other")
    }
  }

  test("assetsWide restores the reference's 68-column width and survives the parquet reader") {
    val wide = AssetGen.assetsWide(spark, 50)
    assert(wide.schema.fields.length == 68,
      s"main.go:51-120 declares 68 fields, got ${wide.schema.fields.length}")
    assert((1 to 40).forall(k => wide.schema.fieldNames.contains(s"customField$k")))
    // the vectorized reader's per-column state at 100-column width is the
    // effect the B3 condensation could not exercise: write the full
    // layout, read it back, and the roundtrip must be exact
    val dir = java.nio.file.Files.createTempDirectory("graft_assetwide")
      .resolve("t").toString
    wide.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema.fields.length == 68)
    assert(back.count() == 50)
    val row = back.filter(col("eventId") === 7L)
      .select(col("platform"), col("department"),
        expr("customField40[0].source").as("s40"),
        expr("size(customField40[0].values)").as("v40"))
      .collect().head
    // id=7: platform arr[(7%3)+1]='windows', dept-1; customField40 j=0:
    // source arr[((7+40)%3)+1] = arr[3] = 'tenable', values size (47%2)+1 = 2
    assert(row.getString(0) == "windows" && row.getString(1) == "dept-1")
    assert(row.getString(2) == "tenable" && row.getInt(3) == 2)
  }

  test("generation is deterministic and id-pure") {
    val a = AssetGen.assets(spark, 500).collect()
    val b = AssetGen.assets(spark, 500).collect()
    assert(a.sameElements(b))
    // spot-check row id=5: fields derive from id exactly
    val r5 = AssetGen.assets(spark, 10).filter(col("eventId") === 5).collect()(0)
    assert(r5.getAs[String]("name") == "asset-5")
    assert(r5.getAs[String]("fqdn") == "asset-5.example.internal")
    assert(r5.getAs[Long]("createdTimeEpoch") == 1704067200000000L + 5000000L)
    assert(r5.getAs[String]("lastAssessmentDate") == "2018-03-07") // 5*13=65 days
  }

  test("JSON-in-string field parses back to its struct") {
    val parsed = AssetGen.assets(spark, 100)
      .select(from_json(col("networkInterface"),
        lit("ipAddress STRING, macAddress STRING, networkName STRING")).as("ni"))
      .select("ni.*")
    assert(parsed.filter(col("ipAddress").startsWith("10.")).count() == 100)
    assert(parsed.filter(length(col("macAddress")) === 12).count() == 100)
  }

  test("q_asset_nested aggregates are internally consistent") {
    val rows = SparkEntry.queries("q_asset_nested")(spark, SparkSessionFixture.sf).collect()
    assert(rows.nonEmpty)
    // every event contributes exactly 3 customField1 entries
    assert(rows.map(_.getAs[Long]("n")).sum == 30000L)
    // values arrays have 1 or 2 entries
    val (n, tv) = (rows.map(_.getAs[Long]("n")).sum, rows.map(_.getAs[Long]("total_values")).sum)
    assert(tv > n && tv < 2 * n)
  }

  test("rate-source stream shares the batch schema and is streaming") {
    val stream = AssetGen.assetStream(spark, 1000)
    assert(stream.isStreaming)
    // same columns and types (nullability differs: rate's value is nullable)
    def shape(s: org.apache.spark.sql.types.StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(stream.schema) == shape(AssetGen.assets(spark, 1).schema))
  }
}
