package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Genuinely-incremental streaming semantics over MemoryStream: windowed
  * aggregation batch-equivalence, session merging, watermark late-drop,
  * keyed dedup, and custom accumulator state — the behaviors the
  * batch-equivalent q_stream_* oracle entries cannot observe.
  * (Reference shape: micro-batch chunks kafka-bench.rs:191-194; the
  * committer accumulator decouple.rs:224-300.)
  */
class StreamingSpec extends AnyFunSuite {
  import SparkSessionFixture.spark
  import spark.implicits._

  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("session_window MERGES an event landing exactly at the previous window's end") {
    // pins the q_stream_session oracle's strict `> gap` break predicate:
    // Spark's operator extends a session whose end equals the next start
    // (verified against the engine — a `>=` oracle would diverge the
    // moment the data contains an exact-gap pair)
    import org.apache.spark.sql.functions._
    val df = Seq(("u", ts(0)), ("u", ts(30)), ("v", ts(0)), ("v", ts(30, 1)))
      .toDF("user_id", "t")
    val sessions = df.groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .count().groupBy("user_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sessions("u") == 1L) // exact-gap event merges
    assert(sessions("v") == 2L) // one second past the gap breaks
  }

  test("registered q_stream_tumble/slide/dedup/join/enrich execute GENUINE streaming queries") {
    // guard against a refactor silently reverting the registered entries
    // to batch: a StreamingQueryListener must observe one started
    // graft_sink_* streaming query per invocation.
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val started = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new StreamingQueryListener {
      // String.valueOf: an UNNAMED query has a null name, and
      // ConcurrentLinkedQueue.add(null) would throw inside the listener
      // bus — exactly masking the regression (dropped queryName) this
      // test exists to surface
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        started.add(String.valueOf(e.name))
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      Seq("q_stream_tumble", "q_stream_slide", "q_stream_session",
        "q_stream_dedup", "q_stream_stateful", "q_stream_join",
        "q_stream_enrich")
        .foreach { n =>
          assert(SparkEntry.queries(n)(spark, SparkSessionFixture.sf).count() > 0)
        }
      // listener events arrive via the async bus
      val deadline = System.nanoTime() + 10_000_000_000L
      while (started.size < 7 && System.nanoTime() < deadline) Thread.sleep(100)
      val names = started.toArray(Array.empty[String]).filter(_ != null)
      assert(names.count(_.startsWith("graft_sink_")) >= 7,
        s"expected 7 streaming executions, saw: ${names.mkString(", ")}")
    } finally spark.streams.removeListener(listener)
  }

  test("q_stream_session under the RocksDB state store equals the default provider") {
    // the warehouse-scale configuration (per-user session state cannot
    // live on the JVM heap — RocksDB spills to native memory/disk): the
    // SAME entry must produce identical sessions under either provider,
    // so flipping the conf at deployment is a pure operational choice.
    // withRocksDbState also restores the prior conf on every path.
    val dflt = SparkEntry.queries("q_stream_session")(spark, SparkSessionFixture.sf)
      .collect().toSeq
    val rocks = graft.queries.StreamQueries.withRocksDbState(spark) {
      SparkEntry.queries("q_stream_session")(spark, SparkSessionFixture.sf)
        .collect().toSeq
    }
    assert(rocks == dflt && rocks.nonEmpty)
    // getOption surfaces the conf DEFAULT (HDFSBacked...), so "restored"
    // means "no longer RocksDB", not None
    assert(!spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDB"),
      "provider conf must be restored after the RocksDB-scoped run")
  }

  test("streaming tumbling window equals batch aggregation on same data") {
    val ms = MemoryStream[(Timestamp, String, Double)]
    val df = ms.toDF().toDF("ts", "typ", "v")
    val agg = df.groupBy(window(col("ts"), "5 minutes").as("w"), col("typ"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("typ"), col("n"))
    val q = agg.writeStream.format("memory").queryName("tumble")
      .outputMode(OutputMode.Complete()).start()
    try {
      ms.addData((ts(0), "a", 1.0), (ts(2), "a", 2.0), (ts(6), "b", 3.0))
      q.processAllAvailable()
      ms.addData((ts(7), "a", 4.0), (ts(12), "b", 5.0))
      q.processAllAvailable()
      val streamed = spark.table("tumble").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = Seq((ts(0), "a", 1.0), (ts(2), "a", 2.0), (ts(6), "b", 3.0),
        (ts(7), "a", 4.0), (ts(12), "b", 5.0)).toDF("ts", "typ", "v")
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("typ"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("typ"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("session_window merges events within the 30-minute gap") {
    val ms = MemoryStream[(Timestamp, Long)]
    val df = ms.toDF().toDF("ts", "user")
    val agg = df.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("w.start").as("ss"), col("w.end").as("se"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Complete()).start()
    try {
      // user 1: 10:00, 10:10 (one session), 11:30 (a new session)
      ms.addData((ts(0), 1L), (ts(10), 1L),
        (Timestamp.valueOf("2024-01-01 11:30:00"), 1L))
      q.processAllAvailable()
      val rows = spark.table("sess").orderBy("ss").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(3) == 2) // merged session holds both events
      assert(rows(1).getLong(3) == 1)
      // session end extends 30 min past the last contained event
      assert(rows(0).getTimestamp(2) == Timestamp.valueOf("2024-01-01 10:40:00"))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    // the two-stream flavor of the as-of/banded family (q_join_asof /
    // q_join_range_theta register the batch forms): both sides carry
    // watermarks and the join condition bounds event-time distance, which
    // is exactly what lets the engine evict join state — unbounded
    // stream-stream joins retain both streams forever.
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("cts", "cuser").withWatermark("cts", "10 minutes")
    val p = purchases.toDF().toDF("pts", "puser").withWatermark("pts", "10 minutes")
    val joined = p.join(c,
      expr("puser = cuser AND cts BETWEEN pts - INTERVAL 15 minutes AND pts"))
      .select(col("puser"), col("pts"), col("cts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((ts(0), 1L), (ts(5), 1L), (ts(0), 2L))
      purchases.addData((ts(10), 1L)) // in range of both user-1 clicks
      q.processAllAvailable()
      purchases.addData((ts(30), 2L)) // user-2 click is 30 min old: out of range
      q.processAllAvailable()
      val rows = spark.table("ssjoin").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(rows == Set((1L, ts(10), ts(0)), (1L, ts(10), ts(5))))
    } finally q.stop()
  }

  test("watermark drops events later than 10 minutes behind max event time") {
    val ms = MemoryStream[(Timestamp, String)]
    val df = ms.toDF().toDF("ts", "typ")
    val agg = df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm")
      .outputMode(OutputMode.Update()).start()
    try {
      ms.addData((ts(0), "x"), (ts(25), "x")) // watermark advances to 10:15
      q.processAllAvailable()
      ms.addData((ts(1), "late")) // 10:01 < watermark → dropped
      q.processAllAvailable()
      ms.addData((ts(26), "x"))
      q.processAllAvailable()
      val counts = spark.table("wm").collect()
        .groupBy(_.getTimestamp(0)).view.mapValues(_.map(_.getLong(1)).max).toMap
      // the 10:00 window never saw the late event: count stays 1
      assert(counts(ts(0)) == 1L)
    } finally q.stop()
  }

  test("dropDuplicates keeps one row per key across micro-batches") {
    val ms = MemoryStream[(Long, String)]
    val df = ms.toDF().toDF("id", "payload")
    val q = df.dropDuplicates("id")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((1L, "a-again"), (3L, "c")) // id=1 is a cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("dedup").select("id").as[Long].collect().sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    val ms = MemoryStream[(Timestamp, Long)]
    val df = ms.toDF().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = df.writeStream.format("memory").queryName("wmdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      ms.addData((ts(0), 1L), (ts(1), 1L)) // in-batch dup collapses
      q.processAllAvailable()
      ms.addData((ts(2), 1L)) // within the watermark window: still a dup
      q.processAllAvailable()
      // advance the watermark past id 1's expiry (10:01 + 10 min); the
      // eviction applies at the NEXT batch, so this one uses a fresh id
      ms.addData((ts(40), 99L))
      q.processAllAvailable()
      ms.addData((ts(41), 1L)) // state evicted → id 1 re-admitted
      q.processAllAvailable()
      val ones = spark.table("wmdedup").filter(col("id") === 1L).count()
      assert(ones == 2, s"expected re-admission after state expiry, got $ones id-1 rows")
    } finally q.stop()
  }

  test("flatMapGroupsWithState accumulates per-user counts across batches") {
    val ms = MemoryStream[(Long, Double)]
    val counted = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, sum0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var sm = sum0
          rows.foreach { r => n += 1; sm += r._2 }
          state.update((n, sm))
          Iterator.single((user, n, sm))
      }
      .toDF("user", "n", "total")
    val q = counted.writeStream.format("memory").queryName("state")
      .outputMode(OutputMode.Update()).start()
    try {
      ms.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      ms.addData((1L, 5.0))
      q.processAllAvailable()
      val last = spark.table("state").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1)).toMap
      assert(last(1L) == ((3L, 10.0))) // state carried across batches
      assert(last(2L) == ((1L, 10.0)))
    } finally q.stop()
  }

  test("CEP automaton carries an open pattern across micro-batches") {
    // the q_stream_cep state machine: a funnel STARTED in batch 1
    // (view, click) must complete on batch 2's purchase — the open
    // stage is streaming state, not per-batch bookkeeping
    val ms = MemoryStream[(Long, String, Long)] // (user, type, seq-as-ts)
    val matched = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Int), (Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long)], state: GroupState[(Long, Int)]) =>
          var (matches, stage) = state.getOption.getOrElse((0L, 0))
          rows.toSeq.sortBy(_._3).foreach { case (_, typ, _) =>
            if (stage == 0) { if (typ == "view") stage = 1 }
            else if (stage == 1) { if (typ == "click") stage = 2 }
            else if (typ == "purchase") { matches += 1; stage = 0 }
          }
          state.update((matches, stage))
          Iterator.single((user, matches, stage.toLong))
      }
      .toDF("user", "matches", "stage")
    val q = matched.writeStream.format("memory").queryName("cep")
      .outputMode(OutputMode.Update()).start()
    try {
      ms.addData((1L, "view", 1L), (1L, "click", 2L), (2L, "view", 1L))
      q.processAllAvailable()
      ms.addData((1L, "purchase", 3L), (1L, "view", 4L), (2L, "error", 2L))
      q.processAllAvailable()
      // sink row order across batches is not guaranteed; the match count
      // is monotone, so max selects each user's latest emission
      val last = spark.table("cep").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).maxBy(_._1)).toMap
      assert(last(1L) == ((1L, 1L)), "batch-1 open funnel completes in batch 2, a new one opens")
      assert(last(2L) == ((0L, 1L)), "non-advancing events leave the open stage untouched")
    } finally q.stop()
  }

  test("transformWithState (v2 arbitrary-state API) accumulates ValueState across batches") {
    // the successor API to flatMapGroupsWithState (Spark 4): explicit
    // typed state handles (ValueState here) + time modes + TTL, backed by
    // the RocksDB state store provider it requires. Same accumulator
    // semantics as the registered q_stream_stateful — state carried
    // across micro-batches, one update emitted per key per batch.
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
    class AccProcessor extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
      @transient private var acc: ValueState[(Long, Double)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        acc = getHandle.getValueState[(Long, Double)]("acc",
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
          timers: TimerValues): Iterator[(Long, Long, Double)] = {
        val (n0, s0) = if (acc.exists()) acc.get() else (0L, 0.0)
        var n = n0; var sm = s0
        rows.foreach { r => n += 1; sm += r._2 }
        acc.update((n, sm))
        Iterator.single((key, n, sm))
      }
    }
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(Long, Double)]
    val out = ms.toDS().groupByKey(_._1)
      .transformWithState(new AccProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user", "n", "total")
    val q = out.writeStream.format("memory").queryName("tws")
      .outputMode(OutputMode.Update()).start()
    try {
      ms.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      ms.addData((1L, 5.0))
      q.processAllAvailable()
      val last = spark.table("tws").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1)).toMap
      assert(last(1L) == ((3L, 10.0))) // state carried across batches
      assert(last(2L) == ((1L, 10.0)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("q_stream_session batch form equals session_window streaming on events slice") {
    // same dataset through both paths: the gaps-and-islands batch query
    // (registered, oracle-checked) vs Spark's session_window operator
    val sf = SparkSessionFixture.sf
    val ev = Tables.events(spark, sf).filter(col("user_id") < 10)
    val viaOp = ev
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("w.start")).as("ss"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaQuery = SparkEntry.queries("q_stream_session")(spark, sf)
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("session_start_us"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaOp == viaQuery)
  }

  test("t_decoupled_ingest commits one snapshot per micro-batch epoch") {
    val rows = SparkEntry.queries("t_decoupled_ingest")(spark, SparkSessionFixture.sf).collect()
    // 6 files / 2 per trigger = 3 epochs → 3 add commits
    assert(rows.length == 3)
    assert(rows.forall(_.getString(1) == "add"))
    assert(rows.map(_.getLong(0)).sorted.sameElements(Array(0L, 1L, 2L)))
    // all 300 source rows landed
    assert(rows.head.getLong(3) == 300L)
  }
}
