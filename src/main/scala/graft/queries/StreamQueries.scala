package graft.queries

import java.nio.file.Files

import graft.{Dec, Q, QueryPack, Tables}
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming surface — SURVEY.md §2B "Streaming". q_stream_tumble,
  * q_stream_slide, q_stream_session, q_stream_dedup and q_stream_stateful
  * execute GENUINE incremental Structured Streaming in their registered
  * form (AvailableNow file stream → streaming state → memory sink, via
  * [[streamedEvents]]; the stateful entry runs flatMapGroupsWithState in
  * update mode), q_stream_join runs a real watermarked stream-stream
  * interval join (via [[streamedJoin]]), q_stream_enrich joins each
  * micro-batch against a static broadcast dim under a windowed streaming
  * agg, t_decoupled_ingest streams end-to-end into the commit-log
  * table, and q_stream_watermark runs a real two-micro-batch watermarked
  * aggregation whose late-row drops the oracle reproduces exactly (the
  * staged-arrival recipe below). Incremental behavior beyond the
  * registered paths (state updates across micro-batches, watermark
  * eviction, session merging) is exercised with MemoryStream in
  * StreamingSpec.
  *
  * Reference analogues: micro-batch chunking (kafka-bench.rs:191-194),
  * consume→convert→write→commit pipeline (bench-kafka.rs:66-173), the
  * decoupled writer/committer epochs (decouple.rs:224-300).
  *
  * Scale notes: tumble/slide/dedup/stateful all shuffle once on their
  * group key with partial aggregation; the slide variant expands each row
  * into window_size/slide (=4) rows before aggregating — the same expand
  * Structured Streaming performs. q_stream_watermark holds windowed-agg
  * state like tumble plus the engine's watermark bookkeeping; no query
  * in this pack sorts or windows the world through one task.
  */
object StreamQueries extends QueryPack {

  /** Run `agg` as a REAL incremental Structured Streaming aggregation over
    * the events table: an AvailableNow file stream (the offline stand-in
    * for the reference's Kafka topic) drives micro-batches through the
    * streaming state store; the final complete-mode state lands in a
    * memory sink and is returned as a batch DataFrame for the oracle.
    * Complete-mode results here are aggregates (windows × types, users ×
    * types) — orders of magnitude smaller than the stream — so the sink
    * is driver-safe at any supported sf. Unique sink name per invocation:
    * Verify/Bench/tests may run the same query repeatedly in one session.
    *
    * Complete mode is the ORACLE's requirement, not the production shape:
    * the oracle compares against the full history, so state must retain
    * every group. A continuous 100 TB deployment of the same aggregation
    * runs withWatermark + append/update mode instead — state bounded by
    * the watermark horizon, emitted windows finalized and evicted — the
    * exact path exercised in StreamingSpec's watermark/eviction tests.
    */
  /** Size streaming state parallelism to the BOUNDED source: a streaming
    * query instantiates one state store per shuffle partition for its
    * whole lifetime, and each store pays a fixed commit cost per
    * micro-batch — AQE's partition coalescing never applies inside
    * streaming, so a small source under a large session default (32)
    * spends more wall time committing empty stores than processing rows
    * (measured 7.7 s → 2.7 s on the sf0.1 interval join). One state
    * partition per 4 MB of source, floor 4, capped at the session
    * setting so a genuinely large source keeps full parallelism. The conf
    * is restored after the query terminates — the streaming query is
    * fully executed (awaitTermination) inside the entry, so the restore
    * cannot affect results, and later batch queries see their session
    * value unchanged.
    */
  private def withStreamParallelism[A](s: SparkSession, dir: String)(body: => A): A = {
    val cap = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val bytes =
      try java.nio.file.Files.size(java.nio.file.Paths.get(s"$dir/events.parquet"))
      catch { case _: Exception => Long.MaxValue }
    val parts = math.min(cap.toLong, math.max(4L, bytes / (4L << 20) + 1)).toString
    val prev = s.conf.get("spark.sql.shuffle.partitions", cap.toString)
    s.conf.set("spark.sql.shuffle.partitions", parts)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Run `body` with the RocksDB state store provider (in Spark 4 core,
    * no extra jar). Session windows hold per-user merging state that
    * grows with the key space — the HDFS-backed default keeps ALL of it
    * on the JVM heap, which is the thing that falls over at warehouse
    * scale; RocksDB spills to native memory/disk and compacts. Measured
    * locally it is also ~10% faster per run on the session entry (r10
    * verdict #7: floor decomposition showed lifecycle+state-commit
    * dominating, floor_lifecycle_s in BENCH_LOCAL). Conf is restored
    * after the run so the other stream entries keep their settled
    * provider.
    */
  private[graft] def withRocksDbState[A](s: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    val w = Files.walk(p)
    try w.sorted(java.util.Comparator.reverseOrder())
      .forEach(Files.deleteIfExists(_))
    finally w.close()
  }

  private def streamedEvents(s: SparkSession, dir: String, mode: String = "complete")(
      agg: DataFrame => DataFrame): DataFrame = withStreamParallelism(s, dir) {
    val sink = "graft_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = agg(Tables.eventsStream(s, dir)).writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(mode)
      .format("memory")
      .queryName(sink)
      .start()
    // detach the result from the sink (eager localCheckpoint), then drop
    // the temp view ON EVERY PATH — otherwise an invocation (failing ones
    // included) pins its full result in the driver for the session
    // lifetime (Verify/Bench/tests run these queries dozens of times in
    // one JVM)
    try {
      query.awaitTermination()
      s.table(sink).localCheckpoint(true)
    } finally s.catalog.dropTempView(sink)
  }

  /** Run a STREAM-STREAM join for real: two independent AvailableNow file
    * streams over the events landing dir, joined with watermarks on both
    * sides, append-mode into a memory sink. Inner-join pairs are emitted
    * as matches arrive (append mode is the only mode stream-stream joins
    * support), and the single staged file arrives as ONE micro-batch
    * (file source, no maxFilesPerTrigger), so no match can straddle a
    * watermark eviction — the emitted pair set is exactly the batch
    * join's, making the entry oracle-able. In a continuous deployment the
    * same query holds state bounded by watermark + join window, the exact
    * eviction path exercised in StreamingSpec's interval-join test.
    */
  private def streamedJoin(s: SparkSession, dir: String)(
      join: (DataFrame, DataFrame) => DataFrame): DataFrame = withStreamParallelism(s, dir) {
    val sink = "graft_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = join(Tables.eventsStream(s, dir), Tables.eventsStream(s, dir))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    // detach the result from the sink (eager localCheckpoint), then drop
    // the temp view ON EVERY PATH — a failing query must not pin its
    // partial sink state in the driver for the session lifetime
    try {
      query.awaitTermination()
      s.table(sink).localCheckpoint(true)
    } finally s.catalog.dropTempView(sink)
  }

  override def queries: Seq[Q] = Seq(

    // tumbling 1-hour windows: count + exact sum per (window, type),
    // executed INCREMENTALLY: the registered entry runs the streaming
    // aggregation for real (kafka-bench.rs:191-196 is continuous; this is
    // the same operator under AvailableNow), not a batch rewrite.
    Q(
      "q_stream_tumble",
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_value_x1e4
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",
    ) { (s, dir) =>
      streamedEvents(s, dir) { ev =>
        ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            Dec.asLong(sum(Dec.d4(col("value"))), 4).as("sum_value_x1e4"))
          .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value_x1e4"))
      }.orderBy("ws", "event_type")
    },

    // sliding 1-hour windows every 15 minutes: each event lands in 4
    // windows (the streaming Expand shape) — executed INCREMENTALLY like
    // tumble: the Expand runs inside the streaming aggregation.
    Q(
      "q_stream_slide",
      """SELECT time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' AS ws,
        |       COUNT(*) AS n
        |FROM events, (SELECT unnest(range(4)) AS i)
        |GROUP BY 1 ORDER BY ws""",
    ) { (s, dir) =>
      streamedEvents(s, dir) { ev =>
        ev.groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("ws"), col("n"))
      }.orderBy("ws")
    },

    // streaming top-k: per tumbling hour, the 2 most frequent event
    // types (count DESC, type ASC tie-break — total order, so the cut is
    // deterministic). The COUNTING runs incrementally (the same genuine
    // streaming aggregation as q_stream_tumble); the rank-and-cut is a
    // batch window over the streaming RESULT — (window × type)-sized,
    // i.e. aggregate-sized, never the event stream. That split is the
    // production shape: a dashboard's top-k is re-derived per refresh
    // from the continuously-maintained counts, because rank itself is
    // not incrementally maintainable under append-only state.
    Q(
      "q_stream_topk",
      """WITH wc AS (SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n
        |            FROM events GROUP BY 1, 2)
        |SELECT ws, event_type, n, rk FROM (
        |  SELECT ws, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY ws ORDER BY n DESC, event_type) AS rk
        |  FROM wc)
        |WHERE rk <= 2 ORDER BY ws, rk""",
    ) { (s, dir) =>
      val counts = streamedEvents(s, dir) { ev =>
        ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("ws"), col("event_type"), col("n"))
      }
      val rk = Window.partitionBy("ws").orderBy(col("n").desc, col("event_type"))
      counts
        .withColumn("rk", row_number().over(rk).cast("long"))
        .filter(col("rk") <= 2)
        .orderBy("ws", "rk")
    },

    // streaming anomaly detection: per-type hourly event counts run as
    // the GENUINE incremental streaming aggregation; the 2σ outlier
    // flagging is a batch pass over the (window × type)-sized RESULT
    // using q_anomaly_sigma's exact integer inequality
    // (n·x − S)² > 4(nQ − S²) — no float moments, no sqrt, bit-exact in
    // both engines. The monitoring split mirrors q_stream_topk: counts
    // maintain incrementally, thresholds re-derive per evaluation
    // because σ over all windows is not incrementally maintainable
    // append-only. Cost of the post-pass ∝ windows × types, never the
    // stream.
    Q(
      "q_stream_anomaly",
      """WITH wc AS (SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS x
        |            FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS q
        |       FROM wc GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_windows,
        |  CAST(COUNT(*) FILTER (
        |    WHERE (n * x - s) * (n * x - s) > 4 * (n * q - s * s)) AS BIGINT) AS n_anomalous
        |FROM wc JOIN st USING (event_type)
        |GROUP BY event_type, n ORDER BY event_type""",
    ) { (s, dir) =>
      val wc = streamedEvents(s, dir) { ev =>
        ev.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("x"))
          .select(col("event_type"), col("x"))
      }
      val st = wc.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("q"))
      wc.join(broadcast(st), "event_type")
        .groupBy(col("event_type"), col("n"))
        .agg(sum(when(
          (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s")) >
            (col("n") * col("q") - col("s") * col("s")) * 4, 1L).otherwise(0L))
          .as("n_anomalous"))
        .select(col("event_type"), col("n").as("n_windows"), col("n_anomalous"))
        .orderBy("event_type")
    },

    // session windows (30-minute gap), executed INCREMENTALLY: the
    // registered entry runs Spark's session_window operator through real
    // Structured Streaming (AvailableNow file stream → merging session
    // state → sink). The oracle stays the gaps-and-islands formulation —
    // session_end = w.end − gap (a session window extends exactly gap
    // past its last event) and sid re-derives as the per-user ordinal by
    // start, so the streaming operator's output maps 1:1 onto the
    // windowed batch definition (equality also asserted in
    // StreamingSpec). Complete mode is the oracle's requirement;
    // production runs watermark + append with sessions finalized and
    // evicted — the path exercised in StreamingSpec's session test.
    Q(
      "q_stream_session",
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
        |         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |                   - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
        |                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, tus,
        |             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |      FROM g)
        |SELECT user_id, sid, MIN(tus) AS session_start_us, MAX(tus) AS session_end_us, COUNT(*) AS n
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""",
    ) { (s, dir) =>
      // state-store provider: measured both (r11). Warm within one JVM
      // RocksDB edges the HDFS-backed default (~1.15 vs ~1.28 s/run at
      // sf0.01), but each bench rep opens a FRESH checkpoint and pays
      // RocksDB's per-instance cold init, which at bench scale exceeds
      // the win — and the floor decomposition (floor_lifecycle_s in
      // BENCH_LOCAL) attributes the entry's fixed cost to the streaming
      // lifecycle, not session merging. So the ENTRY keeps the default
      // provider; a warehouse-scale deployment (per-user state that
      // cannot live on the JVM heap) flips to RocksDB via
      // withRocksDbState — equivalence is spec-pinned in StreamingSpec.
      val sessions = streamedEvents(s, dir) { ev =>
        ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"))
      }
      sessions
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          (unix_micros(col("w.end")) - 1800000000L).as("session_end_us"),
          col("n"))
        .withColumn("sid",
          (row_number().over(Window.partitionBy("user_id")
            .orderBy("session_start_us")) - 1).cast("long"))
        .select("user_id", "sid", "session_start_us", "session_end_us", "n")
        .orderBy("user_id", "sid")
    },

    // REAL watermarked streaming aggregation with DETERMINISTIC late-row
    // dropping: the events table arrives as TWO source files — first half
    // (even event_id), then second half — each consumed by its own
    // AvailableNow run over ONE shared checkpoint, the restart shape of a
    // production ingest (state and watermark recovered from the
    // checkpoint between arrivals, so batch order is deterministic by
    // construction — no reliance on source rate limits). After run 0
    // commits, the engine's watermark is max(batch-0 event time) −
    // 10 min, so run 1's rows whose 1-hour window closed at-or-before
    // that watermark are dropped by the streaming aggregation itself
    // (Spark's late-filter/eviction predicate `window.end <= watermark`
    // — the genuine state-eviction path, not a simulation). Update-mode
    // emissions fold to each group's LAST value, which the batch oracle
    // reproduces exactly: keep batch-0 rows plus batch-1 rows with
    // window end > watermark. The fold is driver-side but
    // AGGREGATE-sized (windows × types), like every streaming sink here.
    // Watermark arithmetic matches the engine's millisecond granularity:
    // window ends are ms-aligned, so flooring max event time to ms can
    // never flip the comparison.
    Q(
      "q_stream_watermark",
      """WITH e AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
        |wm AS (SELECT MAX(t) - INTERVAL 10 MINUTE AS w FROM e WHERE event_id % 2 = 0),
        |kept AS (
        |  SELECT * FROM e WHERE event_id % 2 = 0
        |  UNION ALL
        |  SELECT * FROM e WHERE event_id % 2 = 1
        |    AND date_trunc('hour', t) + INTERVAL 1 HOUR > (SELECT w FROM wm))
        |SELECT date_trunc('hour', t) AS ws, event_type, COUNT(*) AS n
        |FROM kept GROUP BY 1, 2 ORDER BY 1, 2""",
    ) { (s, dir) => withStreamParallelism(s, dir) {
      import s.implicits._
      val land = Files.createTempDirectory("graft_wm_land")
      val ckpt = Files.createTempDirectory("graft_wm_ckpt")
      try {
        val ev = Tables.events(s, dir).select("event_id", "event_type", "ts")
        // stage one arrival file per half into the landing dir
        def stage(name: String, even: Boolean): Unit = {
          val tmp = land.resolve(s"_stage_$name")
          ev.filter(col("event_id") % 2 === (if (even) 0 else 1))
            .coalesce(1).write.parquet(tmp.toString)
          val lst = Files.list(tmp)
          val part =
            try lst.filter(p => p.getFileName.toString.endsWith(".parquet"))
              .findFirst().get()
            finally lst.close()
          Files.move(part, land.resolve(s"$name.parquet"))
          rmTree(tmp)
        }
        val updates =
          scala.collection.mutable.ArrayBuffer.empty[(Long, java.sql.Timestamp, String, Long)]
        // one AvailableNow run per arrival; the SHARED checkpoint carries
        // state + watermark from run to run (restart recovery)
        def runOnce(): Unit = {
          val q = s.readStream.schema(ev.schema)
            .parquet(land.toString)
            .withWatermark("ts", "10 minutes")
            .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
            .agg(count(lit(1)).as("n"))
            .select(col("w.start").as("ws"), col("event_type"), col("n"))
            .writeStream
            .outputMode("update")
            .option("checkpointLocation", ckpt.toString)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (df: DataFrame, id: Long) =>
              val rows = df.collect().map(r =>
                (id, r.getTimestamp(0), r.getString(1), r.getLong(2)))
              updates.synchronized { updates ++= rows }
              ()
            }
            .start()
          q.awaitTermination()
        }
        stage("batch0", even = true)
        runOnce()
        stage("batch1", even = false)
        runOnce()
        updates.groupBy(u => (u._2, u._3)).toSeq
          .map { case ((ws, et), us) => (ws, et, us.maxBy(_._1)._4) }
          .toDF("ws", "event_type", "n")
          .orderBy("ws", "event_type")
      } finally { rmTree(land); rmTree(ckpt) }
    }},

    // streaming dedup shape: first arrival wins per (user_id, event_type),
    // executed INCREMENTALLY as a streaming keyed aggregation — the same
    // per-key state a dropDuplicates job holds, plus the duplicate count.
    // (The state-eviction flavor, dropDuplicatesWithinWatermark, is
    // exercised in StreamingSpec where arrival order is controllable.)
    Q(
      "q_stream_dedup",
      """SELECT user_id, event_type,
        |  MIN(event_id) AS first_event_id,
        |  COUNT(*) - 1 AS n_dupes
        |FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""",
    ) { (s, dir) =>
      streamedEvents(s, dir) { ev =>
        ev.groupBy("user_id", "event_type")
          .agg(min(col("event_id")).as("first_event_id"),
            (count(lit(1)) - 1).as("n_dupes"))
      }.orderBy("user_id", "event_type")
    },

    // stream-stream interval join, executed GENUINELY streaming: each
    // purchase joined to the same user's clicks in the preceding 10
    // minutes — attribution, the canonical stream-stream shape. Both
    // sides carry watermarks (required for state eviction) and the join
    // condition time-bounds the match window, so state per key is bounded
    // by watermark + 10 min in a continuous deployment. Registered form
    // emits the exact pair set of the batch interval join (see
    // [[streamedJoin]]); output is pair-level but interval-bounded —
    // ∝ clicks-per-user-per-10-min, not clicks².
    Q(
      "q_stream_join",
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS lead_us
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
        |ORDER BY purchase_id, click_id""",
    ) { (s, dir) =>
      streamedJoin(s, dir) { (l, r) =>
        val p = l.filter(col("event_type") === "purchase")
          .withWatermark("ts", "10 minutes")
          .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
            col("ts").as("p_ts"))
        val c = r.filter(col("event_type") === "click")
          .withWatermark("ts", "10 minutes")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            col("ts").as("c_ts"))
        p.join(c,
          col("p_user") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
            col("c_ts") < col("p_ts"))
          .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lead_us"))
      }.orderBy("purchase_id", "click_id")
    },

    // stream-static dimension enrichment — the canonical continuous-ETL
    // shape (the reference's Kafka asset events carry ids a serving layer
    // resolves against catalog dims): each streaming micro-batch joins the
    // STATIC customer dim with a broadcast hash join — stateless, no join
    // state store, nothing watermarked on the dim side; only the windowed
    // aggregation above it holds (bounded) streaming state. Executed
    // INCREMENTALLY like tumble (AvailableNow file stream → broadcast
    // enrich → windowed agg → sink). At 100 TB/day of events the dim
    // broadcast is per-executor-constant and the agg state is
    // O(segments × open windows); a dim too large to broadcast shifts to
    // the keyed shuffle the optimizer picks unhinted.
    Q(
      "q_stream_enrich",
      """SELECT c.c_mktsegment AS segment, date_trunc('hour', e.ts) AS ws,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_value_x1e4
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY segment, ws""",
    ) { (s, dir) =>
      val dim = broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment")))
      streamedEvents(s, dir) { ev =>
        ev.join(dim, col("user_id") === col("c_custkey"))
          .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            Dec.asLong(sum(Dec.d4(col("value"))), 4).as("sum_value_x1e4"))
          .select(col("c_mktsegment").as("segment"), col("w.start").as("ws"),
            col("n"), col("sum_value_x1e4"))
      }.orderBy("segment", "ws")
    },

    // per-user accumulator state (the committer-accumulator shape A14),
    // executed as GENUINE arbitrary-state streaming: flatMapGroupsWithState
    // holds one accumulator per user — count, distinct-type set, max ts,
    // exact scaled value total. The engine forbids COUNT(DISTINCT) in
    // streaming AGGREGATIONS, but explicit state implements it exactly:
    // the distinct set is state the job owns, the precise capability
    // arbitrary stateful processing exists for. Value totals accumulate as
    // ×10⁴-scaled longs (each row's DECIMAL(18,4) cast is exact before
    // scaling), so the running sum is integer-exact and equals the
    // oracle's decimal-sum-then-scale. Update-mode emission: the staged
    // file arrives as ONE micro-batch (file source, no maxFilesPerTrigger),
    // so each user emits exactly one final accumulator row — the same
    // single-batch staging contract streamedJoin documents. A continuous
    // deployment keeps the identical code with a state TIMEOUT for
    // eviction; cross-batch accumulation is exercised in StreamingSpec.
    // State scale: one tuple per user, hash-partitioned by key across
    // state stores — never a global structure.
    Q(
      "q_stream_stateful",
      """SELECT user_id,
        |  COUNT(*) AS n_events,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |  MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_ts_us,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS total_value_x1e4
        |FROM events GROUP BY user_id ORDER BY user_id""",
    ) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      streamedEvents(s, dir, "update") { ev =>
        ev.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"),
            Dec.asLong(Dec.d4(col("value")), 4).as("v4"))
          .as[(Long, String, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Seq[String], Long, Long), (Long, Long, Long, Long, Long)](
            OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
            (user: Long, rows: Iterator[(Long, String, Long, Long)],
             state: GroupState[(Long, Seq[String], Long, Long)]) =>
              val (n0, types0, last0, tot0) = state.getOption.getOrElse((0L, Seq.empty[String], Long.MinValue, 0L))
              var n = n0; var last = last0; var tot = tot0
              val types = scala.collection.mutable.Set[String](types0: _*)
              rows.foreach { case (_, typ, tus, v4) =>
                n += 1; types += typ; last = math.max(last, tus); tot += v4
              }
              state.update((n, types.toSeq, last, tot))
              Iterator.single((user, n, types.size.toLong, last, tot))
          }
          .toDF("user_id", "n_events", "n_types", "last_ts_us", "total_value_x1e4")
      }.orderBy("user_id")
    },

    // Streaming CEP — sequential PATTERN detection (r7), the
    // Flink-MATCH_RECOGNIZE-class operator the windowed aggs cannot
    // express: per user, a greedy non-overlapping state machine counts
    // completed view → click → purchase funnels (non-matching events
    // between stages are skipped, a completed match resets the machine).
    // Runs as GENUINE incremental streaming state: one (n_matches,
    // open_stage, n_seen) tuple per user in flatMapGroupsWithState,
    // carried across micro-batches — O(1) state per key regardless of
    // stream length, hash-partitioned across state stores. Within a
    // micro-batch the group's rows replay in (ts, event_id) order (the
    // iterator is not time-ordered; buffering is per-user-per-BATCH,
    // bounded by batch size, never stream length). The oracle reproduces
    // the automaton in closed form: the ordered event-initial string per
    // user, lazy-regex 'v.*?c.*?p' global matching — non-overlapping
    // lazy matches ARE the greedy automaton (first v, earliest c after
    // it, earliest p after that) — and the open stage falls out of the
    // match-stripped remainder.
    Q(
      "q_stream_cep",
      """WITH r AS (SELECT user_id, substr(event_type, 1, 1) AS c, ts, event_id
        |           FROM events WHERE event_type IN ('view','click','purchase')),
        |s AS (SELECT user_id, string_agg(c, '' ORDER BY ts, event_id) AS seq
        |      FROM r GROUP BY user_id),
        |m AS (SELECT user_id, seq,
        |        CAST(len(regexp_extract_all(seq, 'v.*?c.*?p')) AS BIGINT) AS n_matches,
        |        regexp_replace(seq, 'v.*?c.*?p', '', 'g') AS rem
        |      FROM s)
        |SELECT user_id, n_matches,
        |  CAST(CASE WHEN regexp_matches(rem, 'v.*c') THEN 2
        |            WHEN regexp_matches(rem, 'v') THEN 1 ELSE 0 END AS BIGINT) AS open_stage,
        |  CAST(len(seq) AS BIGINT) AS n_relevant
        |FROM m ORDER BY user_id""",
    ) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      streamedEvents(s, dir, "update") { ev =>
        ev.filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"), col("event_id"))
          .as[(Long, String, Long, Long)]
          .groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Int, Long), (Long, Long, Long, Long)](
            OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
            (user: Long, rows: Iterator[(Long, String, Long, Long)],
             state: GroupState[(Long, Int, Long)]) =>
              var (matches, stage, n) = state.getOption.getOrElse((0L, 0, 0L))
              rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, typ, _, _) =>
                n += 1
                if (stage == 0) { if (typ == "view") stage = 1 }
                else if (stage == 1) { if (typ == "click") stage = 2 }
                else if (typ == "purchase") { matches += 1; stage = 0 }
              }
              state.update((matches, stage, n))
              Iterator.single((user, matches, stage.toLong, n))
          }
          .toDF("user_id", "n_matches", "open_stage", "n_relevant")
      }.orderBy("user_id")
    },

    // A8–A15 end-to-end: JSON-lines files (the offline Kafka stand-in,
    // SURVEY §7.4) → Structured Streaming micro-batches (2 files per
    // trigger = the reference's ready_chunks(2)) → foreachBatch, where
    // executors write parquet shards and the driver performs exactly ONE
    // commit-log append per epoch (decouple.rs:224-300).
    // Golden oracle: AvailableNow + maxFilesPerTrigger=2 deterministically
    // batches the 6 files (listing order) into 3 epochs of 100 rows, each
    // committed once. Row counts — not physical shard counts, which depend
    // on file-source bin-packing — are the observable pinned here.
    Q(
      "t_decoupled_ingest",
      """SELECT CAST(seq AS BIGINT) AS seq, action, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(total_rows AS BIGINT) AS total_rows
        |FROM (VALUES (0,'add',100,300),(1,'add',100,300),(2,'add',100,300))
        |  AS t(seq, action, n_rows, total_rows)
        |ORDER BY seq""",
    ) { (s, dir) =>
      import s.implicits._
      val src = Files.createTempDirectory("graft_ingest_src")
      val tblDir = Files.createTempDirectory("graft_ingest_tbl")
      try {
      // 6 JSON-lines files of B2-shaped items (bench-kafka.rs:17)
      (0 until 6).foreach { f =>
        val lines = (0 until 50).map(i =>
          s"""{"name":"item-$f-$i","size":"${Seq("small", "medium", "large")(i % 3)}","count":${f * 100 + i}}""")
        Files.write(src.resolve(f"part-$f%02d.json"), String.join("\n", lines: _*).getBytes)
      }
      val table = GraftTable.createOrReplace(s, tblDir.toString)
      // IngestSource seam: the JSON-file stand-in is interchangeable with
      // graft.sources.KafkaSource when a Kafka connector jar is present
      val stream = _root_.graft.sources.JsonFileSource(
        src.toString, "name STRING, size STRING, count INT",
        maxFilesPerTrigger = 2 /* micro-batch = 2 files (A18) */).load(s)
      val epochRows = scala.collection.concurrent.TrieMap.empty[Long, Long]
      val query = stream.writeStream
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.persist()
          val n = batch.count()
          epochRows(table.append(batch)) = n // ONE commit per epoch
          batch.unpersist(): Unit
        }
        .start()
      query.awaitTermination()
      // observable result: committed snapshots and their row payloads —
      // total is EAGER and snaps is driver-local, so the temp table/src
      // dirs can be reclaimed before returning (each invocation used to
      // leak both for the machine lifetime)
      val snaps = table.snapshots.map(e => (e.seq, e.action, epochRows(e.seq)))
        .toDF("seq", "action", "n_rows")
      val total = table.read().agg(count(lit(1))).as[Long].head()
      snaps.withColumn("total_rows", lit(total)).orderBy("seq")
      } finally { rmTree(src); rmTree(tblDir) }
    },

    // Streaming CDC-apply (the Debezium-to-lakehouse loop): each
    // micro-batch of a change stream MERGEs into the table via one atomic
    // upsert commit — latest row per key wins across epochs, and every
    // intermediate state stays time-travelable. Epoch ORDER matters for
    // upserts (unlike the append-only ingest above), so the staged files
    // carry strictly increasing modification times — the file source's
    // processing order. Three epochs: seed {A,B,C} → update A, insert D
    // → update B, update A again.
    Q(
      "t_streaming_upsert",
      """SELECT name, count, 3 AS n_commits, CAST(3 AS BIGINT) AS rows_at_seq0
        |FROM (VALUES ('A',30),('B',20),('C',1),('D',1)) AS t(name, count)
        |ORDER BY name""",
    ) { (s, _) =>
      val src = Files.createTempDirectory("graft_cdc_src")
      val tblDir = Files.createTempDirectory("graft_cdc_tbl")
      try {
      val epochs = Seq(
        Seq("A" -> 1, "B" -> 1, "C" -> 1),
        Seq("A" -> 10, "D" -> 1),
        Seq("B" -> 20, "A" -> 30))
      epochs.zipWithIndex.foreach { case (rows, f) =>
        val p = src.resolve(f"part-$f%02d.json")
        Files.write(p, rows.map { case (k, v) => s"""{"name":"$k","count":$v}""" }
          .mkString("\n").getBytes)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + f * 60000L))
      }
      val table = GraftTable.createOrReplace(s, tblDir.toString)
      val stream = _root_.graft.sources.JsonFileSource(
        src.toString, "name STRING, count INT", maxFilesPerTrigger = 1).load(s)
      val query = stream.writeStream
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          table.upsert(batch, keyCols = Seq("name")): Unit // ONE MERGE commit per epoch
        }
        .start()
      query.awaitTermination()
      // eager localCheckpoint detaches the result from the table's
      // parquet, so the temp dirs can be reclaimed before returning
      table.read()
        .withColumn("n_commits", lit(table.snapshots.size))
        .withColumn("rows_at_seq0", lit(table.read(asOf = 0).count()))
        .orderBy("name")
        .localCheckpoint(true)
      } finally { rmTree(src); rmTree(tblDir) }
    },

    // ONLINE dedup at ingest (VERDICT r7 #6 — "dedup before it lands"):
    // each micro-batch is deduped batch-locally, then checked against a
    // PERSISTENT bucket-partitioned hash index covering ALL history, and
    // only the novel rows land — corpus append and index append publish
    // ATOMICALLY per epoch via one multi-table transaction, so a crash
    // between the two can never leave a row indexed-but-absent (ghost
    // dup suppression) or landed-but-unindexed (future double-admit).
    // Index maintenance is incremental by construction: each epoch
    // appends exactly the novel hashes (cost ∝ delta — pinned by the
    // per-epoch n_novel counts and index_commits = one per epoch), and
    // at 100 TB the check is ONE keyed left-anti join against the
    // bucket-partitioned index — history is never rescanned and the
    // optimizer picks the join strategy (no broadcast of a growing
    // index). Three epochs with a within-batch dup, a cross-epoch dup,
    // and a twice-seen late dup. Reference shape: decouple.rs ingest
    // epochs + the north star's dedup requirement.
    Q(
      "t_online_dedup",
      """SELECT CAST(epoch AS BIGINT) AS epoch, CAST(n_in AS BIGINT) AS n_in,
        |  CAST(n_novel AS BIGINT) AS n_novel, CAST(6 AS BIGINT) AS corpus_rows,
        |  CAST(6 AS BIGINT) AS index_rows, 3 AS index_commits
        |FROM (VALUES (0,4,3),(1,4,2),(2,3,1)) AS t(epoch, n_in, n_novel)
        |ORDER BY epoch""",
    ) { (s, _) =>
      import s.implicits._
      val src = Files.createTempDirectory("graft_odedup_src")
      val wh = Files.createTempDirectory("graft_odedup_wh")
      try {
      val epochs = Seq(
        // alpha repeats inside epoch 0; bravo re-arrives in epoch 1;
        // delta repeats inside epoch 1; alpha and echo re-arrive in 2
        Seq("d00" -> "alpha", "d01" -> "bravo", "d02" -> "charlie", "d03" -> "alpha"),
        Seq("d10" -> "bravo", "d11" -> "delta", "d12" -> "delta", "d13" -> "echo"),
        Seq("d20" -> "alpha", "d21" -> "echo", "d22" -> "foxtrot"))
      epochs.zipWithIndex.foreach { case (rows, f) =>
        val p = src.resolve(f"part-$f%02d.json")
        Files.write(p, rows.map { case (id, tx) => s"""{"name":"$id","text":"$tx"}""" }
          .mkString("\n").getBytes)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + f * 60000L))
      }
      val cat = _root_.graft.table.GraftCatalog(s, wh.toString)
      cat.createTable("lake", "corpus")
      cat.createTable("lake", "dedup_idx")
      val counts = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long)]
      val stream = _root_.graft.sources.JsonFileSource(
        src.toString, "name STRING, text STRING", maxFilesPerTrigger = 1).load(s)
      val query = stream.writeStream
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          // batch-local dedup first (min doc id survives — deterministic),
          // then ONE anti-join against the published index
          val local = batch.withColumn("th", md5(col("text")))
            .groupBy("th").agg(min(col("name")).as("name"), max(col("text")).as("text"))
            .persist()
          val idx = cat.openTable("lake", "dedup_idx")
          val novel = (if (idx.snapshots.isEmpty) local
            else local.join(idx.read().select("th"), Seq("th"), "left_anti"))
            .persist()
          val nNovel = novel.count()
          if (nNovel > 0) cat.transact { txn =>
            txn.append("lake", "corpus", novel.select("name", "text", "th"))
            txn.appendPartitioned("lake", "dedup_idx", novel.select("th"),
              _root_.graft.table.PartitionSpec("th",
                _root_.graft.table.Transform.Bucket(8))): Unit
          }
          counts(bid) = (batch.count(), nNovel)
          local.unpersist(); novel.unpersist(): Unit
        }
        .start()
      query.awaitTermination()
      val corpusRows = cat.openTable("lake", "corpus").read().count()
      val idx = cat.openTable("lake", "dedup_idx")
      val idxRows = idx.read().count()
      counts.toSeq.sortBy(_._1)
        .map { case (e, (i, n)) => (e, i, n) }
        .toDF("epoch", "n_in", "n_novel")
        .withColumn("corpus_rows", lit(corpusRows))
        .withColumn("index_rows", lit(idxRows))
        .withColumn("index_commits", lit(idx.snapshots.size))
        .orderBy("epoch")
        .localCheckpoint(true)
      } finally { rmTree(src); rmTree(wh) }
    },

    // EXACTLY-ONCE online ingest (r9): the replay-safety composition the
    // online-dedup scenarios assumed but never proved. A foreachBatch
    // sink is at-least-once — after a crash the same batch id is
    // REDELIVERED, and t_online_dedup's transaction, replayed, would
    // re-admit every row its first delivery landed (they're in the
    // corpus, so the anti-join... catches dups, but a NON-duplicate row
    // would double-land — and the index would double-grow). The fix is
    // Delta's txnAppId/txnVersion lifted into the multi-table txn: the
    // corpus append stages a `txn.ingest = batchId` watermark ON ITS
    // ENTRY (CatalogTxn.appendIdempotent), so the watermark becomes
    // visible ATOMICALLY with the transaction's publish. The processor
    // checks the VISIBLE watermark before opening a transaction:
    //   crash BEFORE publish → no watermark leaked (staged entries are
    //     invisible) → replay reprocesses — correct, nothing landed;
    //   crash AFTER publish → watermark folded with the data → replay
    //     skips the whole transaction — correct, everything landed.
    // The golden drives all four arms: two fresh epochs, a replay of a
    // published epoch (skipped), a crash mid-transaction (aborted,
    // watermark NOT advanced), and the crashed epoch's redelivery
    // (processed). At 100 TB the watermark check is one metadata-sized
    // properties fold — no data read, no extra commit.
    Q(
      "t_ingest_exactly_once",
      """SELECT step, action, CAST(watermark AS BIGINT) AS watermark,
        |  CAST(corpus_rows AS BIGINT) AS corpus_rows,
        |  CAST(index_rows AS BIGINT) AS index_rows
        |FROM (VALUES
        |  (0, 'committed', 0, 2, 2), (1, 'committed', 1, 3, 3),
        |  (2, 'skipped',   1, 3, 3), (3, 'aborted',   1, 3, 3),
        |  (4, 'committed', 2, 4, 4))
        |AS t(step, action, watermark, corpus_rows, index_rows)
        |ORDER BY step""",
    ) { (s, _) =>
      import s.implicits._
      val wh = Files.createTempDirectory("graft_e1x_wh")
      try {
      val cat = _root_.graft.table.GraftCatalog(s, wh.toString)
      cat.createTable("lake", "corpus")
      cat.createTable("lake", "dedup_idx")
      def corpus = cat.openTable("lake", "corpus")
      def watermark: Long =
        corpus.properties().get("txn.ingest").map(_.toLong).getOrElse(-1L)
      def process(rows: Seq[(String, String)], bid: Long, crash: Boolean): String = {
        if (watermark >= bid) return "skipped" // replay of a published epoch
        val batch = rows.toDF("name", "text").withColumn("th", md5(col("text")))
        val idx = cat.openTable("lake", "dedup_idx")
        val novel = (if (idx.snapshots.isEmpty) batch
          else batch.join(idx.read().select("th"), Seq("th"), "left_anti")).persist()
        novel.count(): Unit // materialize before staging (non-deterministic sources)
        try {
          cat.transact { txn =>
            txn.appendIdempotent("lake", "corpus",
              novel.select("name", "text", "th"), "ingest", bid)
            txn.appendPartitioned("lake", "dedup_idx", novel.select("th"),
              _root_.graft.table.PartitionSpec("th",
                _root_.graft.table.Transform.Bucket(8))): Unit
            if (crash) throw new IllegalStateException("crash before publish")
          }
          "committed"
        } catch {
          case _: IllegalStateException => "aborted" // staged entries never publish
        } finally novel.unpersist(): Unit
      }
      val e0 = Seq("a1" -> "alpha", "a2" -> "bravo")
      val e1 = Seq("b1" -> "bravo", "b2" -> "charlie") // bravo: cross-epoch dup
      val e2 = Seq("c1" -> "delta")
      // observable state snapshotted AFTER EACH step (a driver-side fold
      // of tiny tables — the scenario IS the state machine), never in a
      // deferred map that would read everything at the end
      val plan = Seq((e0, 0L, false), (e1, 1L, false),
        (e1, 1L, false), (e2, 2L, true), (e2, 2L, false))
      val steps = plan.zipWithIndex.map { case ((rows, bid, crash), step) =>
        val action = process(rows, bid, crash)
        (step, action, watermark,
          corpus.read().count(), cat.openTable("lake", "dedup_idx").read().count())
      }
      steps.toDF("step", "action", "watermark", "corpus_rows", "index_rows")
        .orderBy("step")
        .localCheckpoint(true)
      } finally rmTree(wh)
    },

    // ONLINE NEAR-dup at ingest (r9, VERDICT r8 #6 — the production
    // fuzzy-dedup loop): t_online_dedup catches byte-identical arrivals;
    // this closes the real gap — a REWORDED duplicate arriving epochs
    // later. Each micro-batch computes MinHash band keys through the
    // SAME construction the batch pipeline uses (DedupQueries
    // .minhashDocs/.minhashBandKeys — one definition, so index and probe keys can never
    // drift), drops batch-local near-dups (band-bucket candidate pairs,
    // exact-Jaccard ≥ 0.5 verify on the shingle sets, larger id loses),
    // probes the PERSISTENT band index for cross-epoch candidates with
    // the same verify, and lands corpus rows + the novel docs' 8 band
    // rows ATOMICALLY in one multi-table transaction (a crash can never
    // leave a doc indexed-but-absent or landed-but-unindexed). Index
    // cost stays ∝ delta: each epoch appends exactly 8·novel band rows
    // (pinned by index_rows = 8 × corpus_rows and one index commit per
    // novel epoch), and the probe is ONE keyed join of the batch's
    // bands against the bucket-partitioned index — history is never
    // rescanned, and exact verification touches only candidate pairs
    // (banding recall ≥ 1-(1-j²)^8: a 0.75-Jaccard rewrite is missed
    // with p < 0.2%; the fixture's pairs are deterministic md5 hits).
    // Exact dups are the j=1 special case of the same path. Short
    // (<3-token) docs emit no bands — production composes the exact
    // md5 index (t_online_dedup) in the same transaction for those.
    Q(
      "t_online_neardup",
      """SELECT CAST(epoch AS BIGINT) AS epoch, CAST(n_in AS BIGINT) AS n_in,
        |  CAST(n_novel AS BIGINT) AS n_novel, CAST(5 AS BIGINT) AS corpus_rows,
        |  CAST(40 AS BIGINT) AS index_rows, 3 AS index_commits
        |FROM (VALUES (0,4,3),(1,3,1),(2,3,1)) AS t(epoch, n_in, n_novel)
        |ORDER BY epoch""",
    ) { (s, _) =>
      import s.implicits._
      val src = Files.createTempDirectory("graft_oneardup_src")
      val wh = Files.createTempDirectory("graft_oneardup_wh")
      try {
      val epochs = Seq(
        Seq( // d02 is a batch-local NEAR dup of d00 (last token reworded)
          "d00" -> "the quick brown fox jumps over the lazy dog tonight",
          "d01" -> "spark engines shuffle data across the cluster nodes efficiently",
          "d02" -> "the quick brown fox jumps over the lazy dog today",
          "d03" -> "completely unrelated third document about language models"),
        Seq( // d10: CROSS-EPOCH NEAR dup of d00 (not byte-equal — the
          // exact md5 path would admit it); d12: exact dup of d01 (j=1)
          "d10" -> "the quick brown fox jumps over the lazy dog forever",
          "d11" -> "fresh content describing streaming ingestion pipelines end to end",
          "d12" -> "spark engines shuffle data across the cluster nodes efficiently"),
        Seq( // d20: near dup of epoch-1's d11; d22: exact dup of d00
          "d20" -> "fresh content describing streaming ingestion pipelines end to end again",
          "d21" -> "a genuinely novel document closing out the online scenario",
          "d22" -> "the quick brown fox jumps over the lazy dog tonight"))
      epochs.zipWithIndex.foreach { case (rows, f) =>
        val p = src.resolve(f"part-$f%02d.json")
        Files.write(p, rows.map { case (id, tx) => s"""{"name":"$id","text":"$tx"}""" }
          .mkString("\n").getBytes)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + f * 60000L))
      }
      val cat = _root_.graft.table.GraftCatalog(s, wh.toString)
      cat.createTable("lake", "corpus")
      cat.createTable("lake", "band_idx")
      val counts = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long)]
      // exact-Jaccard verify on the shingle h1 sets: banding proposes,
      // this disposes — probabilistic recall, exact precision
      def verified(df: DataFrame): DataFrame = df
        .filter(size(array_intersect(col("sa"), col("sb"))) * 2 >=
          size(array_union(col("sa"), col("sb"))))
      val stream = _root_.graft.sources.JsonFileSource(
        src.toString, "name STRING, text STRING", maxFilesPerTrigger = 1).load(s)
      val query = stream.writeStream
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          // §8 DECOUPLING (r13, mirrors q_dedup_minhash) — scoped to
          // where it scales: the PERSISTENT index stores band keys only
          // (the r12 schema duplicated each doc's bh payload across its
          // 8 index rows forever), and the landed corpus row carries the
          // doc's ONE bh copy for future probes. The BATCH-side band
          // rows keep carrying bh (`carry`): the micro-batch is bounded
          // by maxFilesPerTrigger, so 8× duplication there is free and
          // saves a per-epoch payload join.
          val bands = _root_.graft.queries.DedupQueries.minhashBandKeys(
            _root_.graft.queries.DedupQueries.minhashDocs(batch, "name"),
            "name", carry = Map("bh" -> col("hs.h1s"))).persist()
          // batch-local near-dups: same-band candidates, larger id loses
          val localDups = verified(
            bands.as("a").join(bands.as("b"),
              col("a.bb") === col("b.bb") && col("a.name") < col("b.name"))
              .groupBy(col("a.name").as("da"), col("b.name").as("db"))
              .agg(first(col("a.bh")).as("sa"), first(col("b.bh")).as("sb")))
            .select(col("db").as("name")).distinct()
          val keptBands = bands.join(localDups, Seq("name"), "left_anti").persist()
          // cross-epoch: ONE keyed probe of the persistent band index —
          // keys only; the stored side's verify payload joins in from
          // the CORPUS rows on the candidate-sized hit set
          val idx = cat.openTable("lake", "band_idx")
          val hits =
            if (idx.snapshots.isEmpty) s.emptyDataFrame.withColumn("name", lit(""))
              .select("name")
            else verified(
              keptBands.as("n").join(idx.read().as("o"),
                col("n.bb.band") === col("o.band") &&
                  col("n.bb.k1") === col("o.k1") && col("n.bb.k2") === col("o.k2"))
                .groupBy(col("n.name").as("nname"), col("o.doc_id").as("odoc"))
                .agg(first(col("n.bh")).as("sa"))
                .join(cat.openTable("lake", "corpus").read()
                  .select(col("name").as("odoc"), col("bh").as("sb")), "odoc"))
              .select(col("nname").as("name")).distinct()
          val novelBands = keptBands.join(hits, Seq("name"), "left_anti").persist()
          val novelDocs = batch.join(
            novelBands.groupBy("name").agg(first(col("bh")).as("bh")),
            Seq("name")).persist()
          val nNovel = novelDocs.count()
          if (nNovel > 0) cat.transact { txn =>
            txn.append("lake", "corpus", novelDocs.select("name", "text", "bh"))
            txn.appendPartitioned("lake", "band_idx",
              novelBands.select(col("name").as("doc_id"), col("bb.band").as("band"),
                col("bb.k1").as("k1"), col("bb.k2").as("k2")),
              _root_.graft.table.PartitionSpec("k1",
                _root_.graft.table.Transform.Bucket(8))): Unit
          }
          counts(bid) = (batch.count(), nNovel)
          bands.unpersist(); keptBands.unpersist()
          novelBands.unpersist(); novelDocs.unpersist(): Unit
        }
        .start()
      query.awaitTermination()
      val corpusRows = cat.openTable("lake", "corpus").read().count()
      val idx = cat.openTable("lake", "band_idx")
      counts.toSeq.sortBy(_._1)
        .map { case (e, (i, n)) => (e, i, n) }
        .toDF("epoch", "n_in", "n_novel")
        .withColumn("corpus_rows", lit(corpusRows))
        .withColumn("index_rows", lit(idx.read().count()))
        .withColumn("index_commits", lit(idx.snapshots.size))
        .orderBy("epoch")
        .localCheckpoint(true)
      } finally { rmTree(src); rmTree(wh) }
    },
  )
}
