package graft

import java.nio.file.Files

import graft.sql.GraftSql
import graft.table.{GraftCatalog, GraftTable}

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Differential fuzz for the SQL front end: a random DML lineage runs
  * TWICE — once as SQL text through GraftSql, once through the Scala API
  * on a twin table — and the two tables must agree at head AND at every
  * time-travel version. The table layer under both is the same code, so
  * what this pins is the front end's TRANSLATION: predicate routing
  * (equality vs IN vs range), literal conversion (UTF8String/decimal →
  * the API's Scala values), by-name INSERT conformance, and the MERGE
  * clause mapping — any of which could silently hit the wrong rows while
  * still "working".
  */
object GraftSqlProps extends Properties("graft-sql-differential") {

  // each case runs ~2 tables × ~6 ops × several Spark jobs
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSessionFixture.spark

  private type Row = (String, String, Int)

  sealed private trait Op
  private case class Insert(rows: List[Row]) extends Op
  private case class DeleteEq(name: String) extends Op
  private case class DeleteIn(names: List[String]) extends Op
  private case class DeleteRange(lo: Int, hi: Int) extends Op
  private case class UpdateEq(name: String, delta: Int) extends Op
  private case class Merge(rows: List[Row], deleteZero: Boolean) extends Op
  // r11: SQL CALL maintenance mid-lineage — the API twin runs the same
  // table-layer op, so sequence numbers stay aligned and every snapshot
  // must still agree: maintenance rewrites files, never visible rows
  private case class MaintOp(stats: Boolean) extends Op

  private val genName = Gen.oneOf("A", "B", "C", "D", "E", "F")
  private val genRow: Gen[Row] = for {
    n <- genName
    s <- Gen.oneOf("small", "medium", "large")
    c <- Gen.chooseNum(0, 99)
  } yield (n, s, c)

  private val genOp: Gen[Op] = Gen.frequency(
    4 -> Gen.nonEmptyListOf(genRow).map(r => Insert(r.take(4))),
    2 -> genName.map(DeleteEq),
    2 -> Gen.nonEmptyListOf(genName).map(ns => DeleteIn(ns.distinct.take(3))),
    1 -> (for { a <- Gen.chooseNum(0, 99); b <- Gen.chooseNum(0, 99) }
      yield DeleteRange(math.min(a, b), math.max(a, b))),
    2 -> (for { n <- genName; d <- Gen.chooseNum(-5, 50) } yield UpdateEq(n, d)),
    2 -> (for { rows <- Gen.nonEmptyListOf(genRow); dz <- Gen.oneOf(true, false) }
      yield Merge(rows.groupBy(_._1).map(_._2.head).toList.take(3), dz)),
    1 -> Gen.oneOf(true, false).map(MaintOp))

  private val genOps: Gen[List[Op]] = for {
    seed <- Gen.nonEmptyListOf(genRow).map(_.take(5))
    ops <- Gen.listOf(genOp).map(_.take(6))
  } yield Insert(seed) :: ops

  private def df(rows: Seq[Row]) = {
    import spark.implicits._
    rows.toDF("name", "size", "count")
  }

  private def applySql(cat: GraftCatalog, op: Op): Unit = op match {
    case Insert(rows) =>
      val v = s"sqlprop_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      df(rows).createOrReplaceTempView(v)
      try GraftSql.sql(spark, cat, s"INSERT INTO graft.fz.t SELECT * FROM $v")
      finally spark.catalog.dropTempView(v)
    case DeleteEq(n) =>
      GraftSql.sql(spark, cat, s"DELETE FROM graft.fz.t WHERE name = '$n'")
    case DeleteIn(ns) =>
      val list = ns.map(n => s"'$n'").mkString(", ")
      GraftSql.sql(spark, cat, s"DELETE FROM graft.fz.t WHERE name IN ($list)")
    case DeleteRange(lo, hi) =>
      GraftSql.sql(spark, cat,
        s"DELETE FROM graft.fz.t WHERE count BETWEEN $lo AND $hi")
    case UpdateEq(n, d) =>
      GraftSql.sql(spark, cat,
        s"UPDATE graft.fz.t SET count = count + ($d) WHERE name = '$n'")
    case Merge(rows, dz) =>
      val v = s"sqlprop_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      df(rows).createOrReplaceTempView(v)
      val delClause = if (dz) "WHEN MATCHED AND s.count = 0 THEN DELETE\n" else ""
      try GraftSql.sql(spark, cat,
        s"""MERGE INTO graft.fz.t AS t USING $v AS s ON t.name = s.name
           |${delClause}WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      finally spark.catalog.dropTempView(v)
    case MaintOp(stats) =>
      if (stats) GraftSql.sql(spark, cat,
        "CALL graft.system.compute_stats('fz.t', cols => 'count')")
      else GraftSql.sql(spark, cat,
        "CALL graft.system.rewrite_data_files('fz.t')")
  }

  private def applyApi(t: GraftTable, op: Op): Unit = op match {
    case Insert(rows) => t.append(df(rows))
    case DeleteEq(n) =>
      t.delete(df(Seq((n, "", 0))).select("name"), Seq("name"))
    case DeleteIn(ns) =>
      t.delete(df(ns.map(n => (n, "", 0))).select("name"), Seq("name"))
    case DeleteRange(lo, hi) => t.deleteWhereRange("count", lo, hi)
    case UpdateEq(n, d) =>
      t.updateWhereEq("name", n, Map("count" -> (col("count") + d)))
    case Merge(rows, dz) =>
      t.merge(df(rows), Seq("name"),
        deleteWhen = if (dz) col("count") === 0 else org.apache.spark.sql.functions.lit(false))
    case MaintOp(stats) =>
      // same defaults the CALL surface maps to, so both lineages commit
      // (or no-op) identically and version numbers stay comparable
      if (stats) t.recomputeStats(Seq("count"))
      else t.compactSmall(128L * 1024 * 1024)
  }

  private def snap(t: GraftTable, asOf: Long): Seq[(String, String, Int)] = {
    import spark.implicits._
    t.read(asOf).as[(String, String, Int)].collect().toSeq.sorted
  }

  property("a random SQL DML lineage equals the same lineage through the Scala API") =
    forAll(genOps) { ops =>
      val root = Files.createTempDirectory("prop_sqldiff")
      val cat = GraftCatalog(spark, root.resolve("wh").toString)
      cat.createNamespace("fz")
      val sqlT = cat.createTable("fz", "t")
      val apiT = GraftTable.createOrReplace(spark, root.resolve("api").toString)
      ops.foreach { op => applySql(cat, op); applyApi(apiT, op) }
      // the SQL-built table is also READ through SQL text (head and every
      // VERSION AS OF), so the comparison exercises the front end's read
      // path at every snapshot, not just its write path
      def snapSql(k: Long): Seq[(String, String, Int)] = {
        import spark.implicits._
        val rel = if (k == Long.MaxValue) "graft.fz.t"
          else s"graft.fz.t VERSION AS OF $k"
        GraftSql.sql(spark, cat, s"SELECT name, size, count FROM $rel")
          .as[(String, String, Int)].collect().toSeq.sorted
      }
      val headOk = sqlT.headSeq == apiT.headSeq &&
        snapSql(Long.MaxValue) == snap(apiT, Long.MaxValue)
      val historyOk = (0L to math.max(sqlT.headSeq, 0L)).forall { k =>
        snapSql(k) == snap(apiT, k)
      }
      if (!(headOk && historyOk)) {
        println(s"SQL/API DIVERGENCE ops=$ops\n sql head=${sqlT.headSeq} " +
          s"${snapSql(Long.MaxValue)}\n api head=${apiT.headSeq} " +
          s"${snap(apiT, Long.MaxValue)}")
      }
      headOk && historyOk
    }

  // r12 (VERDICT r11 #3): INTERLEAVED two-writer arm. INSERTs commute,
  // so the one exact invariant under a nondeterministic interleaving is
  // multiset equality: whatever order the CAS serializes the commits in,
  // the final table must hold exactly the union of both writers' batches
  // and the head must count every statement — no lost commit, no double
  // apply, regardless of which writer won each seq.
  private val genBatches: Gen[List[List[Row]]] =
    Gen.listOfN(4, Gen.nonEmptyListOf(genRow).map(_.take(3)))

  property("two interleaved SQL INSERT writers lose nothing: final state " +
      "is the exact multiset union") =
    forAll(genBatches, genBatches) { (b1, b2) =>
      val root = Files.createTempDirectory("prop_sqlrace")
      val cat = GraftCatalog(spark, root.resolve("wh").toString)
      cat.createNamespace("fz")
      cat.createTable("fz", "t").append(df(Seq(("Z", "seed", -1)))) // seq 0
      def insertAll(batches: List[List[Row]]): Unit = batches.foreach { rows =>
        val v = s"sqlprop2_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        df(rows).createOrReplaceTempView(v)
        try GraftSql.sql(spark, cat, s"INSERT INTO graft.fz.t SELECT * FROM $v")
        finally spark.catalog.dropTempView(v)
      }
      val errs = Array[Throwable](null, null)
      val t1 = new Thread(() => try insertAll(b1)
        catch { case e: Throwable => errs(0) = e })
      val t2 = new Thread(() => try insertAll(b2)
        catch { case e: Throwable => errs(1) = e })
      t1.start(); t2.start(); t1.join(120000); t2.join(120000)
      val t = cat.openTable("fz", "t")
      val expected = (Seq(("Z", "seed", -1)) ++ b1.flatten ++ b2.flatten)
        .groupBy(identity).view.mapValues(_.size).toMap
      val got = {
        import spark.implicits._
        GraftSql.sql(spark, cat, "SELECT name, size, count FROM graft.fz.t")
          .as[(String, String, Int)].collect().toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
      }
      val ok = errs.forall(_ == null) && got == expected &&
        t.headSeq == (b1.size + b2.size).toLong
      if (!ok) println(s"INTERLEAVE DIVERGENCE errs=${errs.toSeq} " +
        s"head=${t.headSeq} expected ${b1.size + b2.size} commits\n" +
        s" got=$got\n exp=$expected")
      ok
    }
}
