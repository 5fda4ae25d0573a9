package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic generator for the reference's wide nested event type —
  * the Spark-native analogue of the Go Kafka load generator's
  * `AssetMessage` (kafka-load-gen/main.go:51-120, generator
  * main.go:122-257): timestamp + epoch pair, identity/network strings, a
  * JSON-in-string field (main.go:197), a string array (main.go:64), and
  * `array<struct<source, values array<string>>>` custom fields
  * (main.go:155-168), with the B3 condensation of FIXTURES.md (all type
  * shapes, not all 40 copies).
  *
  * Everything is a pure expression of `id`, so the data is reproducible
  * across runs and generation is embarrassingly parallel (`spark.range`
  * splits the id space across executors — the analogue of the generator's
  * 10 partition workers, main.go:294-314).
  */
object AssetGen {

  private val surfaces = array(lit("Other"), lit("Internal"), lit("External"))

  /** the AssetMessage projection over any relation with an `id` column. */
  private def project(idDf: DataFrame): DataFrame = {
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z in epoch µs
    idDf.select(
      col("id").as("eventId"),
      timestamp_micros(lit(baseUs) + col("id") * 1000000L).as("createdTime"),
      (lit(baseUs) + col("id") * 1000000L).as("createdTimeEpoch"), // µs epoch (main.go:53,189)
      concat(lit("asset-"), col("id")).as("name"),
      concat(lit("asset-"), col("id"), lit(".example.internal")).as("fqdn"),
      concat(lit("acct-"), pmod(col("id"), lit(7))).as("account"),
      element_at(array(lit("us-east-1"), lit("eu-west-1"), lit("ap-south-1")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("cloudRegion"),
      // JSON-in-string network metadata (main.go:197)
      to_json(struct(
        concat(lit("10."), pmod(col("id"), lit(255)), lit("."),
          pmod(col("id") * 7, lit(255)), lit("."), pmod(col("id") * 13, lit(255))).as("ipAddress"),
        lpad(hex(pmod(col("id") * 31, lit(0xFFFFFFL))), 12, "0").as("macAddress"),
        concat(lit("net-"), pmod(col("id"), lit(5))).as("networkName")))
        .as("networkInterface"),
      // variable-length string array (main.go:64,200)
      expr("transform(sequence(0, CAST(id % 3 AS INT)), i -> element_at(array('crowdstrike','qualys','tenable'), i + 1))")
        .as("contributingSources"),
      pmod(col("id"), lit(2)).cast("int").as("delFlag"),
      (pmod(col("id"), lit(2)) === 0).as("isActive"),
      (pmod(col("id") * 97, lit(10000)).cast("double") / 100.0).as("cpuUsage"), // main.go:215
      // "yyyy-MM-dd" date string in [2018-01-01, …] (main.go:136-141)
      date_format(date_add(to_date(lit("2018-01-01")), pmod(col("id") * 13, lit(2900)).cast("int")),
        "yyyy-MM-dd").as("lastAssessmentDate"),
      element_at(surfaces, (pmod(col("id"), lit(3)) + 1).cast("int")).as("attackSurface"),
      // array<struct<source, values array<string>>> ×3 (main.go:155-168)
      expr(
        """transform(sequence(0, 2), k -> named_struct(
          |  'source', element_at(array('crowdstrike','qualys','tenable'), CAST((id + k) % 3 AS INT) + 1),
          |  'values', transform(sequence(0, CAST((id + k) % 2 AS INT)), v -> concat('val-', CAST((id * 3 + k + v) % 100 AS STRING)))))""".stripMargin)
        .as("customField1"))
  }

  /** n deterministic AssetMessage-shaped rows (batch). */
  def assets(s: SparkSession, n: Long): DataFrame =
    project(s.range(n).toDF("id"))

  /** one `array<struct<source, values array<string>>>` custom field at
    * the wide layout's field number — same type shape as customField1,
    * arithmetic offset by the field number so every copy carries
    * distinct (still id-derivable) content.
    */
  private def cfExpr(fieldNo: Int): org.apache.spark.sql.Column = expr(
    s"""transform(sequence(0, 2), j -> named_struct(
       |  'source', element_at(array('crowdstrike','qualys','tenable'), CAST((eventId + $fieldNo + j) % 3 AS INT) + 1),
       |  'values', transform(sequence(0, CAST((eventId + $fieldNo + j) % 2 AS INT)), v -> concat('val-', CAST((eventId * 3 + $fieldNo + j + v) % 100 AS STRING)))))""".stripMargin)

  private def dateStr(mult: Int): org.apache.spark.sql.Column =
    date_format(date_add(to_date(lit("2018-01-01")),
      pmod(col("eventId") * mult, lit(2900)).cast("int")), "yyyy-MM-dd")

  /** FULL 68-field AssetMessage width (main.go:51-120): all 28 scalar
    * fields of the Go struct PLUS all 40 `customField` copies — the B3
    * condensation covers every type SHAPE; this variant restores the
    * reference's actual COLUMN COUNT, because whole-stage codegen and
    * the vectorized parquet reader behave differently at 100-column
    * width (generated-method size limits, per-column reader state).
    * Still a pure arithmetic projection of `id`: embarrassingly
    * parallel, reproducible, oracle-derivable from range().
    */
  def assetsWide(s: SparkSession, n: Long): DataFrame = {
    val base = project(s.range(n).toDF("id"))
    // ONE projection for all 53 added/replaced columns — a withColumn
    // per column would stack 50+ Project nodes and pay an analyzer pass
    // each (the classic withColumn-in-a-loop trap; r11 review)
    val wideScalars: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "id" -> concat(lit("uuid-"), col("eventId")),
      "cmdbid" -> concat(lit("cmdb-"), pmod(col("eventId"), lit(9999))),
      "location" -> element_at(
        array(lit("dc-east"), lit("dc-west"), lit("colo-1"), lit("colo-2")),
        (pmod(col("eventId"), lit(4)) + 1).cast("int")),
      "department" -> concat(lit("dept-"), pmod(col("eventId"), lit(6))),
      "onboardingSource" -> element_at(
        array(lit("cmdb"), lit("scan"), lit("manual")),
        (pmod(col("eventId"), lit(3)) + 1).cast("int")),
      "parentResourceId" -> concat(lit("parent-"), pmod(col("eventId"), lit(100))),
      "assetTypes" -> element_at(
        array(lit("host"), lit("container"), lit("vm")),
        (pmod(col("eventId"), lit(3)) + 1).cast("int")),
      "platform" -> element_at(
        array(lit("linux"), lit("windows"), lit("macos")),
        (pmod(col("eventId"), lit(3)) + 1).cast("int")),
      "lastEDRAssessmentDate" -> dateStr(17),
      "lastVAAssessmentDate" -> dateStr(19),
      "lastCAAssessmentDate" -> dateStr(23),
      "lastPAAssessmentDate" -> dateStr(29),
      "createdAt" -> date_format(
        timestamp_micros(lit(1704067200000000L) + col("eventId") * 1000000L),
        "yyyy-MM-dd'T'HH:mm:ss'Z'"),
      "updatedAt" -> date_format(
        timestamp_micros(lit(1704067200000000L) + col("eventId") * 2000000L),
        "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    base.select(
      base.columns.filterNot(_ == "customField1").map(col).toSeq ++
        wideScalars.map { case (name, c) => c.as(name) } ++
        (1 to 40).map(k => cfExpr(k).as(s"customField$k")): _*)
  }

  /** Streaming variant — the rate-limited produce shape (A28: token-bucket
    * 1000 QPS, main.go:330; 10 topic partitions, main.go:328): a `rate`
    * source emits rowsPerSecond rows whose `value` plays the generator's
    * sequence id through the same deterministic projection.
    */
  def assetStream(s: SparkSession, rowsPerSecond: Int): DataFrame =
    project(s.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .option("numPartitions", 10)
      .load()
      .select(col("value").as("id")))
}
