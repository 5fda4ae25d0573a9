package graft.table

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A Spark-managed table over the CommitLog: the capability port of the
  * reference's Iceberg table (create/append/equality-delete/time-travel/
  * compaction), re-expressed as parquet + a snapshot log instead of a
  * REST catalog (SURVEY.md §7.3; reference main.rs / decouple.rs /
  * deletes.rs).
  *
  * Read path (merge-on-read): data files are unioned with their commit
  * seq; equality deletes anti-join rows whose key matches AND whose data
  * seq ≤ the delete's seq — later appends are untouched, matching
  * Iceberg's sequence-number scoping of equality deletes. Catalyst sees
  * an ordinary left_anti join and optimizes it like any other (broadcast
  * when the delete set is small — the common case).
  *
  * Write path: executors write parquet shards in parallel (df.write),
  * then the driver performs exactly ONE O(1) commit — the decoupled
  * many-writers/one-committer architecture of decouple.rs:112-300.
  */
final class GraftTable(spark: SparkSession, val root: Path) {
  private val log = new CommitLog(root)

  private def newShardDir(kind: String): Path =
    root.resolve(kind).resolve(UUID.randomUUID().toString)

  /** walk with the stream closed (Files.walk leaks a directory fd
    * until GC otherwise).
    */
  private def walked[A](dir: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(dir)
    try f(s.iterator().asScala) finally s.close()
  }

  private def parquetFilesIn(dir: Path): Seq[String] =
    walked(dir)(_.filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted)

  /** fast_append: write data files, commit one `add` entry. With
    * `statsCols`, the commit records min/max of those (numeric) columns —
    * the manifest statistics Iceberg uses for scan pruning — computed in
    * one aggregate over the batch being appended.
    */
  def append(df: DataFrame, statsCols: Seq[String] = Nil): Long = {
    val dir = newShardDir("data")
    df.write.parquet(dir.toString)
    val stats =
      if (statsCols.isEmpty) Nil
      else {
        val aggs = statsCols.flatMap(c =>
          Seq(min(col(c)).cast("decimal(38,6)").as(s"mn_$c"),
            max(col(c)).cast("decimal(38,6)").as(s"mx_$c")))
        val row = spark.read.parquet(dir.toString).agg(aggs.head, aggs.tail: _*).collect()(0)
        // A column that is all-null in this batch (or non-numeric, nulled by
        // the decimal cast) has null min/max: record NO stats for it, so
        // mayContain falls back to never-prune-blind instead of choking on a
        // literal "null" at read time (ADVICE r2).
        statsCols.zipWithIndex.flatMap { case (c, i) =>
          if (row.isNullAt(2 * i) || row.isNullAt(2 * i + 1)) None
          else Some((c, row.get(2 * i).toString, row.get(2 * i + 1).toString))
        }
      }
    log.commit("add", dataFiles = parquetFilesIn(dir), stats = stats,
      schemaJson = df.schema.json)
  }

  /** equality delete: persist the key set as a delete file, commit a
    * `delete` entry scoped to the given equality columns
    * (deletes.rs:65-92).
    */
  def delete(keys: DataFrame, equalityCols: Seq[String]): Long = {
    val dir = newShardDir("deletes")
    keys.select(equalityCols.map(col): _*).distinct().write.parquet(dir.toString)
    log.commit("delete", deleteFiles = parquetFilesIn(dir), equalityCols = equalityCols)
  }

  /** atomic mixed commit: new data files AND a delete in ONE log entry
    * (deletes.rs:94-110 — appends + deletes in a single transaction).
    */
  def appendAndDelete(df: DataFrame, keys: DataFrame, equalityCols: Seq[String]): Long = {
    val dDir = newShardDir("data")
    df.write.parquet(dDir.toString)
    val delDir = newShardDir("deletes")
    keys.select(equalityCols.map(col): _*).distinct().write.parquet(delDir.toString)
    log.commit("mixed", dataFiles = parquetFilesIn(dDir),
      deleteFiles = parquetFilesIn(delDir), equalityCols = equalityCols,
      schemaJson = df.schema.json)
  }

  /** snapshot read; `asOf` = time travel to that committed seq. */
  def read(asOf: Long = Long.MaxValue): DataFrame = readPruned(asOf, None)

  /** range read with data skipping: commits whose recorded [min,max] for
    * `colName` cannot intersect [lo, hi] contribute NO files to the scan
    * (verify with prunedFileCount), and the residual filter is applied to
    * the surviving rows. The 100 TB payoff: a time- or id-bounded query
    * reads only the matching ingest epochs instead of the whole table.
    */
  def readRange(colName: String, lo: BigDecimal, hi: BigDecimal): DataFrame =
    readPruned(Long.MaxValue, Some((colName, lo, hi)))
      .filter(col(colName) >= lo && col(colName) <= hi)

  /** data files a readRange scan would actually open. */
  def prunedFileCount(colName: String, lo: BigDecimal, hi: BigDecimal): Int =
    log.state(Long.MaxValue, Some((colName, lo, hi)))._1.size

  private def readPruned(
      asOf: Long,
      prune: Option[(String, BigDecimal, BigDecimal)]): DataFrame = {
    val (dataFiles, deleteFiles) = log.state(asOf, prune)
    if (dataFiles.isEmpty) {
      // preserve the table schema on an all-pruned/empty read so callers
      // (readRange's residual filter included) can still resolve columns
      return schemaAt(asOf) match {
        case Some(sch) =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
        case None => spark.emptyDataFrame
      }
    }
    // allowMissingColumns = schema evolution on read: snapshots written
    // before a column was added contribute nulls for it (add-column
    // evolution; the per-snapshot schema is recorded in the log entry).
    val data = dataFiles
      .groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (seq, files) =>
        spark.read.parquet(files.map(_._1): _*).withColumn("_seq", lit(seq))
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val result = deleteFiles.groupBy(x => (x._2, x._3)).toSeq.sortBy(_._1._1)
      .foldLeft(data) { case (acc, ((dseq, eqCols), files)) =>
        // prefix the delete-side keys so the anti-join condition is
        // unambiguous; left_anti output keeps only left columns.
        val dels = spark.read.parquet(files.map(_._1): _*)
          .select(eqCols.map(c => col(c).as(s"_d_$c")): _*)
        // strictly-less: an equality delete applies to data committed
        // BEFORE it — data in the same (mixed) commit is untouched,
        // matching Iceberg's sequence-number rule.
        val keyCond = eqCols.map(c => col(c) <=> col(s"_d_$c")).reduce(_ && _)
        acc.join(dels, keyCond && (col("_seq") < lit(dseq)), "left_anti")
      }
    result.drop("_seq")
  }

  /** compaction: materialize the MoR view into fresh files and commit a
    * `replace` — deletes are folded in, history before the replace is
    * superseded (but still time-travelable).
    */
  def compact(): Long = {
    val dir = newShardDir("data")
    val view = read()
    view.write.parquet(dir.toString)
    log.commit("replace", dataFiles = parquetFilesIn(dir),
      schemaJson = view.schema.json)
  }

  /** Snapshot expiration + orphan-file removal (Iceberg's
    * expire_snapshots ∘ remove_orphan_files): compacts the current MoR
    * view into a replace commit, drops every older log entry, and deletes
    * data/delete files no longer referenced. Reads are unchanged; time
    * travel before the expiration point is — deliberately — gone, which
    * is what bounds metadata and reclaims storage on a long-lived table.
    */
  def expireSnapshots(): Long = {
    val seq = compact()
    log.expireBefore(seq)
    val referenced = log.state()._1.map(x => Paths.get(x._1)).toSet
    Seq("data", "deletes").foreach { kind =>
      val dir = root.resolve(kind)
      if (Files.exists(dir)) {
        walked(dir)(_.toSeq)
          .filter(p => p.getFileName.toString.endsWith(".parquet") && !referenced.contains(p))
          .foreach(Files.delete)
      }
    }
    seq
  }

  /** schema recorded at (the latest data commit ≤) `seq` — the evolution
    * history a catalog would serve.
    */
  def schemaAt(seq: Long = Long.MaxValue): Option[org.apache.spark.sql.types.StructType] =
    log.entries(seq).filter(_.schemaJson.nonEmpty).lastOption
      .map(e => org.apache.spark.sql.types.DataType.fromJson(e.schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType])

  def snapshots: Seq[LogEntry] = log.entries()
  def headSeq: Long = log.headSeq()
  def commitLog: CommitLog = log
}

object GraftTable {
  /** idempotent create: drop-if-exists then create — the reference's
    * init() shape (lib.rs:44-78: exists → drop → create).
    */
  def createOrReplace(spark: SparkSession, dir: String): GraftTable = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
    }
    Files.createDirectories(p)
    new GraftTable(spark, p)
  }

  def open(spark: SparkSession, dir: String): GraftTable =
    new GraftTable(spark, Paths.get(dir))
}
