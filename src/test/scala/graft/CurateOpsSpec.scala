package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side replays of the corpus-curation operators (CurateQueries):
  * ground truth recomputed in plain Scala at sf0.001 and compared exactly
  * — the same Java regex engine Spark's codegen'd regexp_* calls use, so
  * any drift is an operator bug, not a dialect artifact. (The DuckDB/RE2
  * side is covered by the oracle gate.)
  */
class CurateOpsSpec extends AnyFunSuite {
  import SparkSessionFixture.{spark, sf}

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val rawDocs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  // --- q_text_pii ---

  private def piiAug(id: Long, text: String): String =
    text + s" contact u$id@mail${id % 7}.com ip 10.${id % 256}.0.${id % 100} tel 555-${1000 + id % 9000}"

  private val emailRe = "[a-z0-9]+@[a-z0-9.]*[a-z]"
  private val ipRe = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  private val phoneRe = "555-[0-9]{4}"

  test("q_text_pii equals a driver replay; scrub leaves no detectable span") {
    val expected = rawDocs.map { case (id, text) =>
      val t = piiAug(id, text)
      def n(re: String) = re.r.findAllIn(t).length.toLong
      val scrubbed = t.replaceAll(emailRe, "<EMAIL>")
        .replaceAll(ipRe, "<IP>").replaceAll(phoneRe, "<PHONE>")
      id -> ((n(emailRe), n(ipRe), n(phoneRe), scrubbed))
    }.toMap
    val got = q("q_text_pii").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == expected)
    // the synthetic suffix guarantees at least one span of each kind
    assert(got.values.forall { case (e, i, p, _) => e >= 1 && i >= 1 && p >= 1 })
    // scrubbing is a fixpoint: no pattern survives in any scrubbed text
    got.values.foreach { case (_, _, _, s) =>
      assert(emailRe.r.findFirstIn(s).isEmpty)
      assert(phoneRe.r.findFirstIn(s).isEmpty)
    }
  }

  // --- q_dedup_url ---

  private def makeUrl(id: Long): String = {
    val slash = if (id % 3 == 0) "/" else ""
    val qs = if (id % 2 == 0) s"?utm_source=feed&utm_campaign=x&ref=${id % 3}"
             else "?b=1&utm_medium=m"
    val frag = if (id % 5 == 0) s"#frag${id % 4}" else ""
    // canonical-key period lcm(5,7,2,3) = 210 < corpus size, so genuine
    // duplicates exist at every sf
    s"HTTPS://WWW.SRC${id % 5}.Example.COM/Page/${id % 7}$slash$qs$frag"
  }

  private def canonicalize(url: String): String =
    Seq(
      "#.*" -> "", "^https://" -> "http://", "^http://www\\." -> "http://",
      "utm_[a-z]+=[^&#]*&?" -> "", "\\?&" -> "?", "[?&]$" -> "", "/$" -> "")
      .foldLeft(url.toLowerCase) { case (u, (re, repl)) => u.replaceAll(re, repl) }

  test("q_dedup_url equals a driver replay of the canonicalization") {
    val groups = rawDocs.map { case (id, _) => (canonicalize(makeUrl(id)), id) }
      .groupBy(_._1).map { case (c, xs) =>
        c -> ((xs.map(_._2).min, xs.size.toLong))
      }
    val got = q("q_dedup_url").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == groups)
    assert(got.values.map(_._2).sum == rawDocs.size)
    // canonical keys carry none of the mess the canonicalizer removes
    got.keys.foreach { c =>
      assert(c.startsWith("http://") && !c.startsWith("http://www."))
      assert(!c.contains("#") && !c.contains("utm_") && !c.endsWith("/"))
      assert(c == c.toLowerCase)
    }
    // the generator produces genuine duplicates (same canonical key)
    assert(got.values.exists(_._2 > 1))
  }

  // --- q_quality_gopher ---

  test("q_quality_gopher equals a driver replay of the rule set") {
    val stop = Set("the", "a", "row", "data", "value")
    val expected = rawDocs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val n = w.length.toLong
      val sumLen = w.map(_.length.toLong).sum
      val maxLen = w.map(_.length.toLong).max
      val nUniq = w.distinct.length.toLong
      val nStop = w.count(stop).toLong
      val r = Seq(
        n >= 50 && n <= 100000,
        sumLen >= 3 * n && sumLen <= 10 * n,
        nStop >= 2,
        nUniq * 2 >= n,
        maxLen <= 15).map(b => if (b) 1L else 0L)
      val mask = r.zipWithIndex.map { case (b, i) => b << i }.sum
      id -> ((n, r(0), r(1), r(2), r(3), r(4), mask, r.product))
    }.toMap
    val got = q("q_quality_gopher").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(got == expected)
    // both outcomes occur on the synthetic corpus (the gate gates)
    assert(got.values.exists(_._8 == 1L) || got.values.forall(_._8 == 0L))
  }

  // --- q_tokenizer_bpe ---

  test("q_tokenizer_bpe equals a driver replay of weighted pair counts") {
    val wf = rawDocs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val pairs = scala.collection.mutable.Map.empty[String, Long]
    wf.foreach { case (w, cnt) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairs(p) = pairs.getOrElse(p, 0L) + cnt
      }
    }
    val expected = pairs.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = q("q_tokenizer_bpe").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.size == 20)
  }
}
