package graft.table

/** Standalone commit racer for the CROSS-PROCESS conflict test — the
  * reference DECLARES an independent-process conflict binary
  * (Cargo.toml:53-55 "conflict" bin) but never shipped it; this is that
  * workload against our commit log. TableLayerSpec spawns this main in a
  * SECOND JVM racing the test JVM's own committers on one table
  * directory, proving the CAS claim (`Files.createFile` = O_EXCL) holds
  * between PROCESSES, not just threads: O_EXCL is a kernel-level
  * filesystem primitive, but only a real two-process race demonstrates
  * no JVM-level state (channel caches, metadata caching) weakens it.
  *
  * No Spark — the commit path is pure NIO by design (a commit is one
  * small JSON write regardless of data size), so the racer needs only
  * scala-library on its classpath.
  *
  * args: logRoot nCommits tag — commits nCommits entries whose single
  * dataFile is "tag-i", then prints the final head seq.
  */
object ConflictRacer {
  def main(args: Array[String]): Unit = {
    val Array(root, nStr, tag) = args
    val log = CommitLog(root)
    var i = 0
    while (i < nStr.toInt) {
      log.commit("add", dataFiles = Seq(s"$tag-$i"))
      i += 1
    }
    println(log.headSeq())
  }
}
