package graft

import java.nio.file.Files

import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based algebraic laws over the engine (SURVEY §5.3): random
  * predicates/keys at sf0.001, 10 cases per law (each case runs real
  * Spark jobs — 100-case defaults would be all JVM overhead).
  */
object AlgebraProps extends Properties("graft-algebra") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSessionFixture.spark
  private lazy val sf = SparkSessionFixture.sf
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_discount").cache()
  private lazy val localLi = li.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))

  property("filter composition commutes and equals conjunction") =
    forAll(Gen.choose(1.0, 50.0), Gen.choose(0.0, 0.1)) { (qty, disc) =>
      val a = li.filter(col("l_quantity") < qty).filter(col("l_discount") < disc).count()
      val b = li.filter(col("l_discount") < disc).filter(col("l_quantity") < qty).count()
      val c = li.filter(col("l_quantity") < qty && col("l_discount") < disc).count()
      val local = localLi.count(t => t._2 < qty && t._3 < disc).toLong
      a == b && b == c && c == local
    }

  property("intersect + except partition the distinct left side") =
    forAll(Gen.choose(1.0, 50.0)) { split =>
      val left = li.filter(col("l_quantity") < split).select("l_orderkey")
      val right = li.filter(col("l_discount") >= 0.05).select("l_orderkey")
      val inter = left.intersect(right).count()
      val exc = left.except(right).count()
      inter + exc == left.distinct().count()
    }

  property("top-k equals the k-prefix of the full sort") =
    forAll(Gen.choose(1, 50)) { k =>
      // (l_orderkey, l_quantity) repeats in the data, so the exact ROW set
      // at the k-boundary is tie-dependent; the quantity multiset is the
      // well-defined invariant.
      val topk = li.orderBy(col("l_quantity").desc, col("l_orderkey"))
        .limit(k).select("l_quantity").collect().map(_.getDouble(0)).toSeq
      val full = localLi.map(_._2).sortBy(-_).take(k).toSeq
      topk == full
    }

  property("MoR equality delete reads as eager filter") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("A", "B", "C", "D", "E"))) { keys0 =>
      val keys = keys0.distinct
      val t = GraftTable.createOrReplace(spark,
        Files.createTempDirectory("prop_mor").toString)
      val items = Seq(("A", 1), ("A", 2), ("B", 3), ("C", 4), ("D", 5), ("E", 6))
        .toDF("name", "count")
      t.append(items)
      t.delete(keys.toDF("name"), Seq("name"))
      val got = t.read().select("name", "count").collect()
        .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
      val want = Seq(("A", 1), ("A", 2), ("B", 3), ("C", 4), ("D", 5), ("E", 6))
        .filterNot(p => keys.contains(p._1)).sorted
      got == want
    }

  property("delete + compact equals delete (compaction is read-transparent)") =
    forAll(Gen.someOf("A", "B", "C", "D", "E")) { keys =>
      val t = GraftTable.createOrReplace(spark,
        Files.createTempDirectory("prop_compact").toString)
      t.append(Seq(("A", 1), ("B", 2), ("C", 3), ("D", 4), ("E", 5)).toDF("name", "count"))
      if (keys.nonEmpty) t.delete(keys.toDF("name"), Seq("name"))
      val before = t.read().collect().map(_.toString).sorted.toSeq
      t.compact()
      val after = t.read().collect().map(_.toString).sorted.toSeq
      before == after
    }

  property("exact dedup is idempotent") =
    forAll(Gen.choose(1L, 400L)) { cut =>
      val docs = Tables.documents(spark, sf).filter(col("doc_id") <= cut)
      val once = docs.dropDuplicates("text")
      val twice = once.dropDuplicates("text")
      once.count() == twice.count()
    }

  property("PageRank integer rounding identity: (2n+d) div (2d) = round(n/d) for positive longs") =
    // pure arithmetic (no Spark job): the identity q_graph_pagerank leans
    // on for float-free, order-independent contribution sums
    forAll(Gen.choose(1L, 1L << 40), Gen.choose(1L, 1L << 20)) { (n, d) =>
      val viaInt = (2 * n + d) / (2 * d)
      val viaRational = BigDecimal(n) / BigDecimal(d)
      viaInt == viaRational.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
}
