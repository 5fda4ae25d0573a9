package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe for environment behaviors (ns timestamps, etc). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      println("RAW SCHEMA: " + raw.schema.treeString)
      raw.show(3, false)
    } catch { case e: Throwable => println("RAW READ FAILED: " + e.getMessage.take(300)) }
    val ev = Tables.events(spark, dir)
    println("NORMALIZED SCHEMA: " + ev.schema.treeString)
    ev.show(3, false)
    spark.stop()
  }
}
