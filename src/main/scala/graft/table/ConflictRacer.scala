package graft.table

/** Standalone commit racer for the CROSS-PROCESS conflict tests — the
  * reference DECLARES an independent-process conflict binary
  * (Cargo.toml:53-55 "conflict" bin) but never shipped it; this is that
  * workload against our commit log. TableLayerSpec spawns this main in a
  * SECOND JVM racing the test JVM on one table directory:
  *
  *  - mode `add`: commits n append entries — proves the CAS claim
  *    (`Files.createFile` = O_EXCL) holds between PROCESSES, not just
  *    threads: O_EXCL is a kernel-level filesystem primitive, but only a
  *    real two-process race demonstrates no JVM-level state (channel
  *    caches, metadata caching) weakens it.
  *  - mode `rewrite` (r7): performs n metadata-only REPLACE commits,
  *    each adopting the live file set it read and carrying
  *    `expectedCommittedSeqs` — the optimistic rewrite validation. A
  *    conflict (an append from the other process landed mid-build) is
  *    caught and the rewrite rebuilds from fresh state, exactly what
  *    GraftTable.rewriteRetry does around compaction. Proves BOTH the
  *    maintenance flock and the committed-set validation hold across
  *    processes: without them, a stale replace silently drops the other
  *    process's concurrent appends from table state.
  *
  * No Spark — the commit path is pure NIO by design (a commit is one
  * small JSON write regardless of data size), so the racer needs only
  * scala-library on its classpath.
  *
  * args: logRoot mode nCommits tag — prints the final head seq.
  */
object ConflictRacer {
  def main(args: Array[String]): Unit = {
    val Array(root, mode, nStr, tag) = args
    val log = CommitLog(root)
    var i = 0
    mode match {
      case "add" =>
        while (i < nStr.toInt) {
          log.commit("add", dataFiles = Seq(s"$tag-$i"))
          i += 1
        }
      case "rewrite" =>
        while (i < nStr.toInt) {
          val es = log.entries()
          val (files, _) = CommitLog.stateFrom(es)
          try {
            log.commit("replace", dataFiles = files.map(_._1),
              expectedCommittedSeqs = Some(es.map(_.seq).toSet))
            i += 1
          } catch {
            // stale read: another process committed mid-build — rebuild
            // from fresh state, the rewriteRetry loop's exact response
            case _: CommitConflictException => ()
          }
        }
      case other => sys.error(s"unknown racer mode: $other")
    }
    println(log.headSeq())
  }
}
