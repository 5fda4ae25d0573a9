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

  private def bloomCounters(): (Long, Long) =
    (CommitLog.bloomCacheHits.sum(), CommitLog.bloomCacheMisses.sum())

  test("bloom cache under two-table contention: a 50-commit hydration stays warm through interleaved probes") {
    // the r8 regression this budget replaced an entry cap for: table B's
    // sidecars wholesale-cleared table A's 50-commit hydration
    // mid-stream. With a BYTE budget, two small tables coexist — after
    // hydrating both, re-probing A must be all hits, zero re-parses.
    def bloomTable(prefix: String, commits: Int): CommitLog = {
      val log = fresh(prefix)
      (0 until commits).foreach { i =>
        log.commit("add", dataFiles = Seq(s"data/f$i.parquet"),
          fileBlooms = Seq(Map("k" -> ("deadbeef" * 64 + i.toString))))
      }
      log
    }
    val a = bloomTable("blm_a", 50)
    val b = bloomTable("blm_b", 20)
    def hydrate(log: CommitLog): Unit =
      log.entries().foreach(e => assert(CommitLog.bloomsOf(e).nonEmpty))
    hydrate(a) // cold: 50 misses
    // interleave: B's hydration must not evict A (both fit the byte budget)
    hydrate(b)
    val (h0, m0) = bloomCounters()
    hydrate(a)
    val (h1, m1) = bloomCounters()
    assert(m1 == m0, s"re-probing A re-parsed ${m1 - m0} sidecars — hydration was evicted")
    assert(h1 == h0 + 50, "warm hydration must be all cache hits")
  }

  test("bloom byte budget: racing probes of one sidecar charge its size exactly once") {
    val log = fresh("blm_race")
    val payload = Map("k" -> ("cafebabe" * 512))
    log.commit("add", dataFiles = Seq("data/f0.parquet"), fileBlooms = Seq(payload))
    val entry = log.entries().head
    assert(entry.bloomsRef.nonEmpty && entry.fileBlooms.isEmpty, "bloom must spill to a sidecar")
    val before = CommitLog.bloomCacheBytes.get()
    val barrier = new java.util.concurrent.CyclicBarrier(16)
    val threads = (0 until 16).map { _ =>
      new Thread(() => { barrier.await(); CommitLog.cachedBloomParse(entry.bloomsRef); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val size = CommitLog.cachedBloomParse(entry.bloomsRef)
      .iterator.map(_.valuesIterator.map(_.length).sum).sum.toLong
    assert(CommitLog.bloomCacheBytes.get() == before + size,
      s"racing double-parses double-charged the budget: ${CommitLog.bloomCacheBytes.get() - before} != $size")
  }

  test("swept sidecar degrades to no-bloom pruning and negative-caches; the file's return is irrelevant") {
    val log = fresh("blm_swept")
    log.commit("add", dataFiles = Seq("data/f0.parquet"),
      fileBlooms = Seq(Map("k" -> "feedface")))
    val e = log.entries().head
    Files.delete(java.nio.file.Paths.get(e.bloomsRef)) // the orphan sweep
    val (_, m0) = bloomCounters()
    assert(CommitLog.bloomsOf(e).isEmpty, "vanished sidecar must degrade to Nil, never throw")
    assert(CommitLog.bloomsOf(e).isEmpty)
    val (_, m1) = bloomCounters()
    assert(m1 == m0 + 1, "a permanent absence (NoSuchFile) must negative-cache, not re-stat per probe")
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
