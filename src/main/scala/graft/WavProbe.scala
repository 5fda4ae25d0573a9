package graft

/** Dev-only micro-benchmark: where does the WAV roundtrip spend time —
  * AudioSystem.write (encode), getAudioInputStream (decode container
  * parse), or the sample loops? Single-threaded and 32-thread contention
  * runs (javax.sound SPI lookups serialize on shared state).
  * Usage: runMain graft.WavProbe
  */
object WavProbe {
  def main(args: Array[String]): Unit = {
    val n = 2000
    def bench(label: String)(f: Long => Unit): Unit = {
      (0 until 200).foreach(i => f(i.toLong)) // warm JIT
      val t0 = System.nanoTime()
      (0 until n).foreach(i => f(i.toLong))
      val dt = (System.nanoTime() - t0) / 1e6
      println(f"[wav] $label%-34s ${dt / n}%8.4f ms/doc ($dt%.0f ms / $n)")
    }
    def benchThreads(label: String, threads: Int)(f: Long => Unit): Unit = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread { override def run(): Unit = (0 until n).foreach(i => f(t * 100000L + i)) }
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e6
      println(f"[wav] $label%-34s ${dt * threads / (n.toLong * threads)}%8.4f ms/doc-cpu (${dt}%.0f ms wall, $threads thr)")
    }
    import graft.queries.MultimodalQueries.{encodeWav, decodeWav, encodePng, decodePng, encodePhashPng, phashOf}
    val sample = encodeWav(7L)
    bench("encodeWav (AudioSystem.write)")(d => encodeWav(d))
    bench("decodeWav (getAudioInputStream)")(_ => decodeWav(sample))
    bench("roundtrip")(d => decodeWav(encodeWav(d)))
    benchThreads("encode x32", 32)(d => encodeWav(d))
    benchThreads("decode x32", 32)(_ => decodeWav(sample))
    benchThreads("roundtrip x32", 32)(d => decodeWav(encodeWav(d)))
    val png = encodePng(7L)
    bench("encodePng (ImageIO.write)")(d => encodePng(d))
    bench("decodePng (ImageIO.read)")(_ => decodePng(png))
    benchThreads("png roundtrip x32", 32)(d => decodePng(encodePng(d)))
    val pp = encodePhashPng(7L)
    benchThreads("phash roundtrip x32", 32)(d => phashOf(encodePhashPng(d)))
  }
}
