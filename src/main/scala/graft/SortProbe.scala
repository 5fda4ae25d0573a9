package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: cost of a final global orderBy (RangePartitioning: sampling
  * pass + range exchange) vs one-partition sortWithinPartitions on an
  * output-sized result — the pattern question for every oracle-ordered
  * entry. Usage: runMain graft.SortProbe <sfDir>
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def agg = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"),
        expr("l_partkey % 1000").as("pk"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      (1 to 5).foreach(_ => f)
      println(f"[sort] $label%-34s ${(System.nanoTime() - t0) / 5e9}%7.3f s/run")
    }
    time("orderBy (range sample + exchange)") {
      agg.orderBy("l_returnflag", "l_linestatus", "l_linenumber", "pk")
        .write.format("noop").mode("overwrite").save()
    }
    time("repartition(1)+sortWithinParts") {
      agg.repartition(1)
        .sortWithinPartitions("l_returnflag", "l_linestatus", "l_linenumber", "pk")
        .write.format("noop").mode("overwrite").save()
    }
    time("no final sort (reference)") {
      agg.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
