package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ingestion seam: a streaming relation of raw records for the
  * decoupled-ingest pipeline (reference: Kafka consumer,
  * bench-kafka.rs:52-64). The engine consumes this interface, so the
  * offline JSON-lines stand-in (SURVEY §7.4) and a real Kafka source are
  * interchangeable — swapping one for the other changes a constructor
  * call, not the pipeline.
  */
trait IngestSource {
  /** a STREAMING DataFrame of raw records (isStreaming == true). */
  def load(s: SparkSession): DataFrame
}

/** JSON-lines files as micro-batches — the offline Kafka stand-in: files
  * play partitions of the topic, `maxFilesPerTrigger` plays
  * `ready_chunks` / `maxOffsetsPerTrigger` (kafka-bench.rs:191-194), and
  * earliest-offset semantics fall out of the file listing.
  */
final case class JsonFileSource(
    dir: String,
    schemaDdl: String,
    maxFilesPerTrigger: Int = 2) extends IngestSource {
  override def load(s: SparkSession): DataFrame =
    s.readStream
      .schema(schemaDdl)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
}

/** The real-Kafka shape (consumer group, earliest, subscribe —
  * bench-kafka.rs:52-62). This environment has no spark-sql-kafka
  * connector jar (zero-egress, SURVEY §7.1), so constructing the reader
  * will fail at runtime here — the class documents the exact drop-in:
  * the value column is the JSON payload, parsed downstream identically
  * to JsonFileSource's records.
  */
final case class KafkaSource(
    brokers: String,
    topic: String,
    maxOffsetsPerTrigger: Long = 10000L) extends IngestSource {
  override def load(s: SparkSession): DataFrame =
    s.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .selectExpr("CAST(value AS STRING) AS json")
}
