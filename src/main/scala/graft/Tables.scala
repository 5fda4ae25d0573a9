package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided star-schema testdata (TESTDATA.md /
  * FIXTURES.md §A). These are the tables our engine's query surface runs
  * over — the Spark-native analogue of the Iceberg tables the reference
  * playground writes and then queries through its Spark container
  * (reference: docker-compose.yml:58-81).
  *
  * All loaders are plain parquet scans so Catalyst predicate pushdown /
  * column pruning reach the file source unimpeded.
  */
object Tables {
  private def p(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame   = p(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = p(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = p(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = p(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = p(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = p(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = p(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = p(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = p(s, dir, "embeddings")

  /** Spread a scan across the cluster before compute-heavy row-local
    * stages (shingling, hashing, vector math). The testdata tables are
    * single-file/single-row-group parquet, so Spark scans them with ONE
    * task and every higher-order-function pipeline above them would run
    * serially; one tiny shuffle of the raw rows buys full parallelism.
    * At production scale the same call is a cheap no-op-ish rebalance —
    * and compute-heavy stages after a scan want an explicit spread anyway
    * when file sizes skew.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** events.ts: the shipped parquet stores TIMESTAMP(NANOS) — a session
    * without spark.sql.legacy.parquet.nanosAsLong=true throws
    * PARQUET_TYPE_ILLEGAL on the scan (verified empirically; the flag is
    * pinned in SparkEntry's per-query wrapper and in every session
    * builder — this loader stays pure, no conf mutation). With the flag,
    * ts arrives as a raw ns LONG and the branch below normalizes to a µs
    * timestamp; the TimestampType branch covers a µs-encoded variant.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(p(s, dir, "events"))

  private def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Integer division: ns values (~1.7e18) exceed double's 2^53 exact
        // range, so a float `/` would corrupt the microsecond value.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] with no zone: with the session timezone pinned
        // UTC (SparkEntry wrapper + every session builder) this cast maps
        // each wall-clock value to the same instant the ns-epoch encoding
        // produced, and downstream unix_micros/window functions (which
        // reject NTZ inputs) resolve again.
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // Spark read it as a zoned timestamp natively
    }

  /** [[events]] as a Structured Streaming file source: same file, same ts
    * normalization, with the schema pinned from a batch footer read (file
    * streams cannot infer). FileStreamSource monitors a DIRECTORY, so the
    * single testdata file is staged behind a symlink in a temp landing
    * dir — the same landing-zone shape a real ingest has, where a Kafka
    * topic (connector jar absent offline) would drop in as the source.
    *
    * The landing dir is cached per resolved source file (ADVICE r4): a
    * long-lived driver session runs the streamed queries dozens of times
    * (Verify, Bench + its warmup, tests), and a fresh temp dir per call
    * would accumulate both disk dirs and deleteOnExit entries in JVM
    * memory for the session lifetime. The dir's content is just a link to
    * an immutable file, so one dir per source is always valid, for every
    * session. Filesystems without symlink support fall back to a copy.
    */
  private val landingDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val path = Paths.get(s"$dir/events.parquet").toAbsolutePath
    val landing = landingDirs.computeIfAbsent(path.toString, { _ =>
      val d = Files.createTempDirectory("graft_events_landing")
      val staged =
        try Files.createSymbolicLink(d.resolve("events.parquet"), path)
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(path, d.resolve("events.parquet"))
        }
      // registration order matters: deleteOnExit runs LIFO, so the dir is
      // registered first and deleted last (after its content)
      d.toFile.deleteOnExit()
      staged.toFile.deleteOnExit()
      d
    })
    val schema = s.read.parquet(path.toString).schema
    normalizeEventsTs(s.readStream.schema(schema).parquet(landing.toString))
  }
}
