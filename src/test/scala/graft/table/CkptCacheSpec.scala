package graft.table

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The r8 parsed-checkpoint cache (CommitLog.cachedCkptParse): repeated
  * read-plans at an unchanged head must skip the O(live files) JSON
  * parse, while every way the checkpoint can legally change — a new
  * checkpoint at a higher top-seq path, or expiration's in-place shrink
  * of the SAME path — must invalidate by content identity (path, size,
  * mtime) alone, with no explicit hook. Stale-serve here would be a
  * correctness bug (a reader planning against dropped files), so the
  * invalidation cases are the point of this spec, not the hit rate.
  */
class CkptCacheSpec extends AnyFunSuite {

  private def fresh(prefix: String): CommitLog =
    new CommitLog(Files.createTempDirectory(prefix))

  private def counters(): (Long, Long) =
    (CommitLog.ckptCacheHits.sum(), CommitLog.ckptCacheMisses.sum())

  test("unchanged head: second read is a parse-cache hit with identical entries") {
    val log = fresh("ckc_hit")
    (0 until 3).foreach(i => log.commit("add", dataFiles = Seq(s"data/f$i.parquet")))
    log.checkpoint()
    val (h0, m0) = counters()
    val first = log.entries()
    val (h1, m1) = counters()
    assert(m1 == m0 + 1, "cold read must parse")
    val second = log.entries()
    val (h2, m2) = counters()
    assert(h2 == h1 + 1 && m2 == m1, "warm read must hit, not re-parse")
    assert(first.map(e => (e.seq, e.dataFiles)) == second.map(e => (e.seq, e.dataFiles)))
  }

  test("new checkpoint at a higher seq: fresh parse, new commits visible") {
    val log = fresh("ckc_advance")
    log.commit("add", dataFiles = Seq("data/a.parquet"))
    log.checkpoint()
    assert(log.entries().size == 1) // prime the cache on ckpt #1
    log.commit("add", dataFiles = Seq("data/b.parquet"))
    log.checkpoint() // new path: _ckpt/<new top seq>.json
    val (_, m0) = counters()
    val es = log.entries()
    val (_, m1) = counters()
    assert(m1 == m0 + 1, "a new checkpoint path must miss the cache")
    // entries() resolves data-file paths against the table root
    assert(es.flatMap(_.dataFiles).map(_.split('/').last).toSet == Set("a.parquet", "b.parquet"))
  }

  test("expiration's in-place shrink invalidates by size/mtime — no stale serve") {
    val log = fresh("ckc_expire")
    (0 until 4).foreach(i => log.commit("add", dataFiles = Seq(s"data/f$i.parquet")))
    log.checkpoint()
    assert(log.entries().size == 4) // cache now holds the 4-entry parse
    val dropped = log.expireBefore(2) // rewrites the SAME ckpt path smaller
    assert(dropped > 0)
    val es = log.entries()
    assert(es.map(_.seq).min >= 2,
      s"read served expired entries: ${es.map(_.seq)} — stale cache")
    assert(es.flatMap(_.dataFiles).map(_.split('/').last).toSet == Set("f2.parquet", "f3.parquet"))
  }

  test("cap eviction: churning >64 tables stays correct (wholesale clear, no stale cross-talk)") {
    val logs = (0 until 70).map { i =>
      val log = fresh(f"ckc_churn$i%02d")
      log.commit("add", dataFiles = Seq(s"data/t$i.parquet"))
      log.checkpoint()
      log
    }
    // first pass populates past the 64-entry cap (forcing at least one
    // wholesale clear); second pass re-reads through whatever survived
    logs.zipWithIndex.foreach { case (log, i) =>
      assert(log.entries().flatMap(_.dataFiles).map(_.split('/').last) == Seq(s"t$i.parquet"))
    }
    logs.zipWithIndex.foreach { case (log, i) =>
      assert(log.entries().flatMap(_.dataFiles).map(_.split('/').last) == Seq(s"t$i.parquet"))
    }
  }
}
