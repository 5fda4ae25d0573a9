package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.table.GraftTable

/** Dev-only: time GraftTable.append for a tiny fixed-size batch at the
  * session default parallelism vs a size-matched single partition, and a
  * read() after N appends — quantifies the accidental-small-files overhead
  * (guide §6) before touching scenario fixtures.
  * Usage: runMain graft.AppendProbe
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[aprobe] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // warm-up
    val w = GraftTable.createOrReplace(spark,
      Files.createTempDirectory("aprobe_warm").toString)
    w.append(spark.range(0, 100).toDF("id"))
    w.read().count()

    val t1 = GraftTable.createOrReplace(spark,
      Files.createTempDirectory("aprobe_wide").toString)
    timeIt("10 appends of range(100) default slices") {
      (1 to 10).foreach(_ => t1.append(spark.range(0, 100).toDF("id")))
    }
    timeIt("read().count() after (wide)") { t1.read().count() }
    println(s"[aprobe] wide table files: ${t1.snapshots.size} commits")

    val t2 = GraftTable.createOrReplace(spark,
      Files.createTempDirectory("aprobe_one").toString)
    timeIt("10 appends of range(100) 1 slice") {
      (1 to 10).foreach(_ => t2.append(spark.range(0, 100, 1, 1).toDF("id")))
    }
    timeIt("read().count() after (one)") { t2.read().count() }

    // local Seq.toDF (scenario fixture shape)
    import spark.implicits._
    val t3 = GraftTable.createOrReplace(spark,
      Files.createTempDirectory("aprobe_seq").toString)
    timeIt("10 appends of 6-row Seq.toDF") {
      (1 to 10).foreach(_ => t3.append(
        Seq(("A", 1), ("B", 2), ("C", 3), ("D", 4), ("E", 5), ("F", 6))
          .toDF("name", "count")))
    }
    val t4 = GraftTable.createOrReplace(spark,
      Files.createTempDirectory("aprobe_seq1").toString)
    timeIt("10 appends of 6-row Seq.toDF coalesce(1)") {
      (1 to 10).foreach(_ => t4.append(
        Seq(("A", 1), ("B", 2), ("C", 3), ("D", 4), ("E", 5), ("F", 6))
          .toDF("name", "count").coalesce(1)))
    }
    def filesUnder(t: GraftTable): Int = {
      val s = Files.walk(t.root)
      try s.filter(p => p.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    println(s"[aprobe] files: wide=${filesUnder(t1)} one=${filesUnder(t2)} " +
      s"seq=${filesUnder(t3)} seq1=${filesUnder(t4)}")
    spark.stop()
  }
}
