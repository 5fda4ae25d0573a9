package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark harness: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver. Materialization is a noop-format
  * write — unlike count(), it executes the full plan (projections, window
  * sorts, top-k, decimal arithmetic) instead of letting Catalyst prune
  * everything under a count (VERDICT r1 item 3).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: the bench contract is local[32]-class parallelism;
    // a fixed "4" fallback quietly ran the driver's bench on 4 threads
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: session init + codegen/JIT paths land here instead
    // of inflating whichever query happens to run first
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // deterministic name order so per-query timings compare across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // a crash must not masquerade as a fast run: failed queries report
      // -1 and are excluded from the total
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // millisecond precision keeps the whole line ~1.6 KB: the driver stores a
    // bounded tail of stdout, and full-double timings pushed the line start
    // out of that window in r1 AND r2 ("parsed": null both rounds).
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout for the driver (build.sbt outputStrategy keeps it unprefixed),
    // plus a file copy in case the launcher decorates the stream anyway.
    println(line)
    Files.writeString(Paths.get("BENCH_LOCAL.json"), line)
    spark.stop()
  }
}
