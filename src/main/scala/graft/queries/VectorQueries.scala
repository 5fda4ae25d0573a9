package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding / similarity-search operators (north star): exact per-label
  * statistics, brute-force cosine top-k (the correctness baseline), an
  * LSH-bucketed approximate variant (the scale path), and embedding
  * near-dup detection — over the `embeddings` table (dim-64 float arrays).
  *
  * Scale notes:
  *  - q_sim_topk broadcasts the K probe vectors against one linear scan of
  *    embeddings (never a vectors × vectors cross join): cost K·N dot
  *    products, embarrassingly parallel, then a per-probe top-k window
  *    over K·N rows.
  *  - q_sim_ann_lsh / q_dedup_embed bucket vectors by an 8-bit random-
  *    hyperplane signature (deterministic planes from a seeded SplitMix64),
  *    so the self-join is an equi-join on the bucket key with ~N/256-sized
  *    groups — the pattern that survives 100× data growth; candidates are
  *    re-scored exactly inside each bucket. Unlike the text-dedup buckets
  *    (whose hot-key cap drops stop-shingles), hyperplane buckets grow
  *    uniformly with N — the scaling knob is the PLANE COUNT: each added
  *    plane halves expected bucket size, so hold Σ bucket² ≈ N²/2^planes
  *    at budget by setting planes ≈ log2(N / target_bucket_size).
  *  - Dot products are higher-order-function expressions (zip_with +
  *    aggregate) — no Scala UDF in the hot path.
  *
  * Determinism: q_embed_stats quantizes components to scale-6 integers
  * (exact, associative sums → DuckDB-oracle-able). The cosine queries
  * round scores to x1e6 ints and break ties by neighbor id — and they ARE
  * oracle-able: graft_vecdot accumulates float→double products
  * left-to-right, which is bit-identical to DuckDB's list_dot_product
  * over the FLOAT[]→DOUBLE[] cast, so the rounded scores match exactly
  * (validated at sf0.001/0.01/0.1). LlmOpsSpec additionally re-derives
  * them brute-force on the driver and asserts equality.
  */
object VectorQueries extends QueryPack {

  /** SplitMix64 — public-domain PRNG (Steele et al.), used to derive
    * deterministic pseudo-random hyperplanes for LSH.
    */
  private def sm64(seed: Long): Long = {
    var x = seed + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 8 deterministic hyperplanes over dim-64 vectors, components in
    * [-1, 1). private[graft]: LlmOpsSpec replays the bucketing driver-side
    * (same constants, independent arithmetic) for the recall eval.
    */
  private[graft] val planes: Array[Array[Double]] =
    Array.tabulate(8, 64)((j, i) => (sm64(j * 64L + i + 42L) % 1000L).toDouble / 1000.0)

  /** native codegen'd dot product (graft_vecdot, a Catalyst Expression —
    * see graft.functions.VecDot): scores stay inside one
    * whole-stage-codegen span instead of interpreted zip_with/aggregate
    * lambdas.
    */
  private[queries] def dot(x: Column, y: Column): Column = call_function("graft_vecdot", x, y)

  /** cosine(a, b) with PRECOMPUTED self-dots: dot(v,v) is a function of
    * the vector alone, so it is evaluated once per vector (a projection
    * before the join) and reused across every candidate pair — 3× fewer
    * dot products in the pair-scoring hot loop than the naive
    * dot(a,b)/sqrt(dot(a,a)·dot(b,b)) per row, which Catalyst cannot CSE
    * across rows. Bit-identical scores: the precomputed value is the
    * same sequential accumulation of the same array, so the DuckDB
    * oracles (which inline the norms) still agree exactly.
    */
  private[queries] def cosine(ab: Column, na: Column, nb: Column): Column =
    ab / sqrt(na * nb)

  /** LSH bucket id: sign bit of the native dot product against each plane. */
  private def bucketOf(v: Column): Column =
    planes.indices.map { j =>
      val plane = array(planes(j).map(lit): _*)
      val d = call_function("graft_vecdot", v, plane)
      when(d > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.embeddings(s, dir)) // single-file scan → spread before vector math

  /** the shared IVF / SemDeDup / k-means assignment kernel: broadcast
    * codebook (cid, cv, cn) × every vector, argmax as a map-side max_by
    * partial agg (nothing sorts, the scored rows collapse before the
    * shuffle), tie-break = lowest cid via the lexicographic (csim, -cid)
    * max — ONE definition so the tie-break/NaN semantics can never drift
    * between the three queries that promise "the same assignment kernel".
    * first(vec)/first(vn) are deterministic: every row in a group carries
    * the same vector.
    */
  private def nearestCentroid(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, out: String): DataFrame =
    df.crossJoin(broadcast(cents))
      .withColumn("csim", cosine(dot(col(vecCol), col("cv")), col("vn"), col("cn")))
      .groupBy(col(idCol))
      .agg(max_by(col("cid"), struct(col("csim"), (-col("cid")).as("nc"))).as(out),
        first(col(vecCol)).as(vecCol), first(col("vn")).as("vn"))

  /** the shared LSH-bucketed projection (q_sim_ann_lsh / q_dedup_embed):
    * bucket id + precomputed self-dot per vector, one definition so both
    * bucketed queries always agree on bucket ids.
    */
  private def withBucket(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(col("vec_id"), col("embedding"),
      bucketOf(col("embedding")).as("bucket"),
      dot(col("embedding"), col("embedding")).as("vn"))

  // ---- DuckDB oracle fragments for the cosine queries ----

  /** cosine in DuckDB over DOUBLE[] lists: list_dot_product accumulates
    * left-to-right in double, bit-identical to graft_vecdot's
    * float→double sequential loop, so ROUND(score*1e6) agrees exactly.
    */
  private[queries] def cosSql(a: String, b: String): String =
    s"list_dot_product($a,$b) / sqrt(list_dot_product($a,$a) * list_dot_product($b,$b))"

  /** plane literals via Double.toString (shortest repr): DuckDB's
    * correctly-rounded parse recovers the identical double.
    */
  private def planeSql(j: Int): String = planes(j).map(_.toString).mkString("[", ",", "]")

  /** the 8-bit hyperplane bucket, exactly as bucketOf computes it (CAST:
    * DuckDB's CASE-sum is INTEGER, Spark's is BIGINT).
    */
  private val bucketSql: String =
    planes.indices.map(j =>
      s"(CASE WHEN list_dot_product(v, ${planeSql(j)}) > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("CAST(", " + ", " AS BIGINT)")

  override def queries: Seq[Q] = Seq(

    // per-label stats on quantized components: vector count and the
    // squared L2 norm of the label's component-wise SUM vector — all
    // integer-exact, so order-independent and oracle-able.
    Q(
      "q_embed_stats",
      """WITH q AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS pos,
        |         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qc,
        |         vec_id
        |  FROM embeddings),
        |p AS (SELECT label, pos, CAST(SUM(qc) AS BIGINT) AS s,
        |        CAST(COUNT(*) AS BIGINT) AS c FROM q GROUP BY label, pos)
        |SELECT label,
        |  CAST(SUM(CASE WHEN pos = 1 THEN c ELSE 0 END) AS BIGINT) AS n_vecs,
        |  CAST(SUM(CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))) AS BIGINT) AS sumvec_normsq_x1e12
        |FROM p GROUP BY label ORDER BY label""",
    ) { (s, dir) =>
      // quantize via double-multiply-then-round: float→double is exact on
      // both engines and ROUND(double) agrees except within half-ulp of a
      // .5 tie (a float→decimal cast does NOT agree: Spark goes through the
      // shortest string repr, DuckDB through the exact binary expansion).
      val quant = emb(s, dir)
        .select(col("label"), col("vec_id"),
          expr("transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000000) AS BIGINT))").as("q"))
      val perPos = quant
        // outer: skip the optimizer's pushed-down non-empty guard, which
        // would re-evaluate the quantization transform at the scan
        .select(col("label"), posexplode_outer(col("q")).as(Seq("pos", "qc")))
        .groupBy("label", "pos")
        .agg(sum(col("qc")).as("s"), count(lit(1)).as("c"))
      // n_vecs rides the SAME exploded relation (r10): every vector lands
      // exactly once in its label's pos-0 group (pos IS NULL for an
      // empty-array vector, outer-exploded), so the vector count is the
      // pos-0 + pos-null group sizes — the former second corpus scan for
      // a bare COUNT(*) is gone (ScanAudit at sf0.01 showed AQE stopped
      // reusing the forked exchange there; single-scan by construction
      // beats reuse-dependent sharing). Oracle mirrors via pos = 1
      // (generate_subscripts is 1-based; DuckDB's unnest of an empty list
      // emits no row, matching: the testdata has no empty vectors and the
      // hash gate pins that).
      perPos
        .groupBy("label")
        .agg(
          sum(when(col("pos") === 0 || col("pos").isNull, col("c")).otherwise(0L))
            .cast("long").as("n_vecs"),
          sum(expr("CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))")).cast("long")
            .as("sumvec_normsq_x1e12"))
        .select(col("label"), col("n_vecs"), col("sumvec_normsq_x1e12"))
        .orderBy("label")
    },

    // brute-force cosine top-10 for 5 probe vectors: broadcast probes ×
    // linear scan (the exact baseline every ANN variant is judged against).
    Q(
      "q_sim_topk",
      s"""WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv FROM embeddings WHERE vec_id < 5),
         |a AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
         |s AS (SELECT probe_id, neighbor_id, ${cosSql("pv", "nv")} AS score
         |      FROM a, p WHERE neighbor_id <> probe_id),
         |r AS (SELECT probe_id, neighbor_id, score,
         |      row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rn FROM s)
         |SELECT probe_id, rn, neighbor_id, CAST(ROUND(score * 1e6) AS BIGINT) AS score_x1e6
         |FROM r WHERE rn <= 10 ORDER BY probe_id, rn""",
    ) { (s, dir) =>
      val probes = emb(s, dir).filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
        .withColumn("pn", dot(col("pv"), col("pv")))
      val all = emb(s, dir).select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
        .withColumn("nn", dot(col("nv"), col("nv")))
      val scored = all.crossJoin(broadcast(probes))
        .filter(col("neighbor_id") =!= col("probe_id"))
        .withColumn("score", cosine(dot(col("pv"), col("nv")), col("pn"), col("nn")))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("neighbor_id"))
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .select(col("probe_id"), col("rn"), col("neighbor_id"),
          round(col("score") * 1e6).cast("long").as("score_x1e6"))
        .orderBy("probe_id", "rn")
    },

    // LSH-bucketed approximate top-5: probes search only their own
    // hyperplane bucket (~N/256 of the data) — the 100 TB-shaped plan.
    Q(
      "q_sim_ann_lsh",
      s"""WITH wb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM wb),
         |p AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM b WHERE vec_id < 5),
         |s AS (SELECT p.probe_id, p.bucket, c.vec_id AS neighbor_id, ${cosSql("p.pv", "c.v")} AS score
         |      FROM b c JOIN p ON c.bucket = p.bucket AND c.vec_id <> p.probe_id),
         |r AS (SELECT probe_id, bucket, neighbor_id, score,
         |      row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rn FROM s)
         |SELECT probe_id, rn, neighbor_id, bucket, CAST(ROUND(score * 1e6) AS BIGINT) AS score_x1e6
         |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""",
    ) { (s, dir) =>
      val withBucket = VectorQueries.this.withBucket(s, dir)
      val probes = withBucket.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"), col("bucket"),
          col("vn").as("pn"))
      val cands = withBucket
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
          col("bucket").as("bucket_n"), col("vn").as("nn"))
      val scored = cands.join(broadcast(probes),
          col("bucket") === col("bucket_n") && col("neighbor_id") =!= col("probe_id"))
        .withColumn("score", cosine(dot(col("pv"), col("nv")), col("pn"), col("nn")))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("neighbor_id"))
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("rn"), col("neighbor_id"), col("bucket"),
          round(col("score") * 1e6).cast("long").as("score_x1e6"))
        .orderBy("probe_id", "rn")
    },

    // ANN RECALL eval (r10) — the calibration pass a vector platform
    // ships next to its index (the q_dedup_minhash_recall of the
    // similarity family): per probe, recall@5 of the LSH-bucketed search
    // against the exact brute-force top-5 — THE number that tunes the
    // plane count (each added plane halves bucket size and trades
    // recall for cost; this query measures what that trade actually
    // buys). Both rankings come from the SAME shared constructions the
    // deployed queries use (withBucket / graft_vecdot), so the estimator
    // audited is the estimator served. Scale: exact side is the
    // broadcast-probes × one-scan plan (never vectors²), approx side the
    // bucket equi-join; the recall join runs on 5·k rank-cut rows.
    Q(
      "q_sim_ann_recall",
      s"""WITH wb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM wb),
         |p AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM b WHERE vec_id < 5),
         |exs AS (SELECT p.probe_id, c.vec_id AS neighbor_id, ${cosSql("p.pv", "c.v")} AS score
         |       FROM wb c, p WHERE c.vec_id <> p.probe_id),
         |ex AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT probe_id, neighbor_id,
         |      row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rn
         |    FROM exs) WHERE rn <= 5),
         |aps AS (SELECT p.probe_id, c.vec_id AS neighbor_id, ${cosSql("p.pv", "c.v")} AS score
         |       FROM b c JOIN p ON c.bucket = p.bucket AND c.vec_id <> p.probe_id),
         |ap AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT probe_id, neighbor_id,
         |      row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rn
         |    FROM aps) WHERE rn <= 5)
         |SELECT ex.probe_id, CAST(COUNT(ap.neighbor_id) AS BIGINT) AS n_matched,
         |  CAST((COUNT(ap.neighbor_id) * 10000) // 5 AS BIGINT) AS recall_x1e4
         |FROM ex LEFT JOIN ap ON ap.probe_id = ex.probe_id AND ap.neighbor_id = ex.neighbor_id
         |GROUP BY ex.probe_id ORDER BY ex.probe_id""",
    ) { (s, dir) =>
      val base = withBucket(s, dir)
      val probes = base.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          col("bucket").as("pbucket"), col("vn").as("pn"))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("neighbor_id"))
      val exact = base
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("vn").as("nn"))
        .crossJoin(broadcast(probes))
        .filter(col("neighbor_id") =!= col("probe_id"))
        .withColumn("score", cosine(dot(col("pv"), col("nv")), col("pn"), col("nn")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("neighbor_id"))
      val approx = base
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
          col("bucket"), col("vn").as("nn"))
        .join(broadcast(probes),
          col("bucket") === col("pbucket") && col("neighbor_id") =!= col("probe_id"))
        .withColumn("score", cosine(dot(col("pv"), col("nv")), col("pn"), col("nn")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("neighbor_id").as("a_neighbor"))
      // the approx rank-cut is ≤ 5·k rows BY CONSTRUCTION (probes × rn
      // cut) — broadcast it explicitly rather than leaving the estimator
      // to guess sizes above two windows
      exact.join(broadcast(approx),
          exact("probe_id") === approx("probe_id")
            && exact("neighbor_id") === approx("a_neighbor"), "left")
        .groupBy(exact("probe_id"))
        .agg(count(col("a_neighbor")).as("n_matched"))
        .select(col("probe_id"), col("n_matched"),
          expr("CAST((n_matched * 10000) div 5 AS BIGINT)").as("recall_x1e4"))
        .orderBy("probe_id")
    },

    // IVF-flat approximate top-5: seed codebook = first 16 vectors, ONE
    // k-means refinement pass (assign → recompute means → reassign), then
    // probes search the nprobe=2 nearest inverted lists. Centroid means
    // are computed in EXACT quantized-integer space — sum of
    // ROUND(e*1e6) longs, one correctly-rounded double division — so the
    // refined codebook is deterministic and the DuckDB oracle replays it
    // bit-for-bit. The 100 TB shape: the codebook broadcasts, each
    // assignment is an embarrassingly-parallel pass whose per-vector
    // argmax is a max_by PARTIAL aggregation (the 16 scored rows collapse
    // map-side — no sort, no extra shuffled rows; VERDICT r3), the
    // refinement aggregates 64·nlist cells, and each query touches
    // ~nprobe/nlist of the data.
    Q(
      "q_sim_ann_ivf",
      s"""WITH av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM av WHERE vec_id < 16),
         |la0 AS (SELECT a.vec_id, a.v, c.cid, ${cosSql("a.v", "c.cv")} AS csim FROM av a, c0 c),
         |a1 AS (SELECT vec_id, v, cid AS cid0 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crn FROM la0)
         |  WHERE crn = 1),
         |qx AS (SELECT cid0, generate_subscripts(v, 1) AS pos,
         |        CAST(ROUND(unnest(v) * 1000000) AS BIGINT) AS qc FROM a1),
         |cs AS (SELECT cid0, pos, CAST(SUM(qc) AS BIGINT) AS s, COUNT(*) AS n FROM qx GROUP BY cid0, pos),
         |c1 AS (SELECT cid0 AS cid,
         |        list(CAST(CAST(ROUND(CAST(s AS DOUBLE) / n) AS BIGINT) AS DOUBLE) / 1000000 ORDER BY pos) AS cv
         |      FROM cs GROUP BY cid0),
         |la AS (SELECT a.vec_id, a.v, c.cid, ${cosSql("a.v", "c.cv")} AS csim FROM av a, c1 c),
         |lists AS (SELECT vec_id, v, cid AS list_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crn FROM la)
         |  WHERE crn = 1),
         |pa AS (SELECT a.vec_id AS probe_id, a.v AS pv, c.cid, ${cosSql("a.v", "c.cv")} AS csim
         |  FROM av a, c1 c WHERE a.vec_id < 5),
         |probes AS (SELECT probe_id, pv, cid AS probe_list FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY csim DESC, cid) AS crn FROM pa)
         |  WHERE crn <= 2),
         |s AS (SELECT p.probe_id, l.vec_id AS neighbor_id, l.list_id, ${cosSql("p.pv", "l.v")} AS score
         |  FROM lists l JOIN probes p ON l.list_id = p.probe_list AND l.vec_id <> p.probe_id),
         |r AS (SELECT probe_id, neighbor_id, list_id, score,
         |  row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rn FROM s)
         |SELECT probe_id, rn, neighbor_id, list_id, CAST(ROUND(score * 1e6) AS BIGINT) AS score_x1e6
         |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""",
    ) { (s, dir) =>
      val all = emb(s, dir).select(col("vec_id"), col("embedding"))
        .withColumn("vn", dot(col("embedding"), col("embedding")))
      val c0 = all.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("vn").as("cn"))
      // nearest centroid per vector: argmax as a max_by partial agg — the
      // 16 scored rows per vector collapse map-side before the shuffle,
      // and nothing sorts. Tie-break = lowest cid (mirrors the oracle's
      // ORDER BY csim DESC, cid) via the lexicographic (csim, -cid) max.
      // first(vec)/first(vn) are deterministic here: every row in a group
      // carries the same vector. Centroid/vector norms ride along
      // precomputed ("cn"/"vn"), so assignment costs ONE dot per pair.
      val a1 = nearestCentroid(all, "vec_id", "embedding", c0, "cid0")
      val c1 = a1
        .select(col("cid0"), posexplode_outer(
          expr("transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000000) AS BIGINT))"))
          .as(Seq("pos", "qc")))
        .groupBy("cid0", "pos")
        .agg(sum(col("qc")).as("s"), count(lit(1)).as("n"))
        .withColumn("m", expr("CAST(ROUND(CAST(s AS DOUBLE) / n) AS BIGINT)"))
        .groupBy(col("cid0").as("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS DOUBLE) / 1000000)")
          .as("cv"))
        .withColumn("cn", dot(col("cv"), col("cv")))
      val lists = nearestCentroid(all, "vec_id", "embedding", c1, "list_id")
      // nprobe = 2 nearest lists per probe: top-k needs the window form,
      // but only over 5 probes × nlist rows — driver-scale, not data-scale
      val wp = Window.partitionBy("probe_id").orderBy(col("csim").desc, col("cid"))
      val probes = all.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"), col("vn").as("pn"))
        .crossJoin(broadcast(c1))
        .withColumn("csim", cosine(dot(col("pv"), col("cv")), col("pn"), col("cn")))
        .withColumn("crn", row_number().over(wp))
        .filter(col("crn") <= 2)
        .select(col("probe_id"), col("pv"), col("pn"), col("cid").as("probe_list"))
      val scored = lists.join(broadcast(probes),
          col("list_id") === col("probe_list") && col("vec_id") =!= col("probe_id"))
        .withColumn("score", cosine(dot(col("pv"), col("embedding")), col("pn"), col("vn")))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("vec_id"))
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor_id"),
          col("list_id"), round(col("score") * 1e6).cast("long").as("score_x1e6"))
        .orderBy("probe_id", "rn")
    },

    // embedding near-dup: nearest bucket-mate per vector with a
    // near-duplicate flag at cosine ≥ 0.95. One row per vector that has at
    // least one bucket-mate (the synthetic corpus has no true embedding
    // dups — the flag column is the operator surface; the join stays the
    // scale-safe bucketed self-join, never all-pairs).
    Q(
      "q_dedup_embed",
      s"""WITH wb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM wb),
         |s AS (SELECT a.vec_id, bb.vec_id AS nn_id, ${cosSql("a.v", "bb.v")} AS score
         |      FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id <> bb.vec_id),
         |r AS (SELECT vec_id, nn_id, score,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn FROM s)
         |SELECT vec_id, nn_id, CAST(ROUND(score * 1e6) AS BIGINT) AS score_x1e6, score >= 0.95 AS is_near_dup
         |FROM r WHERE rn = 1 ORDER BY vec_id""",
    ) { (s, dir) =>
      val withBucket = VectorQueries.this.withBucket(s, dir)
      val a = withBucket.select(col("vec_id"), col("embedding").as("va"), col("bucket"),
        col("vn").as("na"))
      val b = withBucket.select(col("vec_id").as("nn_id"), col("embedding").as("vb"),
        col("bucket").as("bucket_b"), col("vn").as("nb"))
      val scored = a.join(b, col("bucket") === col("bucket_b") && col("vec_id") =!= col("nn_id"))
        .withColumn("score", cosine(dot(col("va"), col("vb")), col("na"), col("nb")))
      val w = Window.partitionBy("vec_id").orderBy(col("score").desc, col("nn_id"))
      scored
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("nn_id"),
          round(col("score") * 1e6).cast("long").as("score_x1e6"),
          (col("score") >= 0.95).as("is_near_dup"))
        .orderBy("vec_id")
    },

    // SemDeDup-style semantic dedup (cluster-then-prune, the published
    // two-stage doctrine): vectors are k-means-assigned to K coarse
    // clusters (seed codebook = first 16 vectors, same assignment kernel
    // as IVF), then near-duplicate pruning runs ONLY within a cluster —
    // each pair above cosine 0.95 drops the higher vec_id. The output is
    // the per-cluster audit a curation run reports: member count, pairs
    // scored, drops at the threshold, and the top pair (the synthetic
    // corpus has no semantic dups — max cosine ≈ 0.51 — so n_dropped
    // pins 0 and top_score pins the real pairwise computation). The
    // 100 TB shape: assignment is a broadcast codebook + map-side
    // max_by partial agg; the quadratic term is confined to one
    // self-join KEYED on the cluster id (never all-pairs), cost
    // Σ cluster² — K scales with N to bound cluster size, exactly the
    // published SemDeDup recipe.
    Q(
      "q_dedup_semantic",
      s"""WITH av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM av WHERE vec_id < 16),
         |la AS (SELECT a.vec_id, a.v, c.cid, ${cosSql("a.v", "c.cv")} AS csim FROM av a, c0 c),
         |asg AS (SELECT vec_id, v, cid AS list_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crn FROM la)
         |  WHERE crn = 1),
         |mem AS (SELECT list_id, COUNT(*) AS n_members FROM asg GROUP BY list_id),
         |p AS (SELECT a.list_id, a.vec_id AS ia, b.vec_id AS ib, ${cosSql("a.v", "b.v")} AS s
         |      FROM asg a JOIN asg b ON a.list_id = b.list_id AND a.vec_id < b.vec_id),
         |st AS (SELECT list_id, COUNT(*) AS n_pairs,
         |        COUNT(DISTINCT CASE WHEN s >= 0.95 THEN ib END) AS n_dropped,
         |        MAX(s) AS ms FROM p GROUP BY list_id),
         |tp AS (SELECT list_id, ia AS top_a, ib AS top_b FROM (
         |    SELECT *, row_number() OVER (PARTITION BY list_id ORDER BY s DESC, ia, ib) AS rn FROM p)
         |  WHERE rn = 1)
         |SELECT m.list_id, m.n_members,
         |  COALESCE(st.n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
         |  COALESCE(st.n_dropped, CAST(0 AS BIGINT)) AS n_dropped,
         |  tp.top_a, tp.top_b, CAST(ROUND(st.ms * 1e6) AS BIGINT) AS top_score_x1e6
         |FROM mem m LEFT JOIN st ON m.list_id = st.list_id
         |LEFT JOIN tp ON m.list_id = tp.list_id
         |ORDER BY m.list_id""",
    ) { (s, dir) =>
      val all = emb(s, dir).select(col("vec_id"), col("embedding"))
        .withColumn("vn", dot(col("embedding"), col("embedding")))
      val c0 = all.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("vn").as("cn"))
      val assigned = nearestCentroid(all, "vec_id", "embedding", c0, "list_id")
      val mem = assigned.groupBy("list_id").agg(count(lit(1)).as("n_members"))
      val a = assigned.select(col("list_id"), col("vec_id").as("ia"),
        col("embedding").as("va"), col("vn").as("na"))
      val b = assigned.select(col("list_id").as("lb"), col("vec_id").as("ib"),
        col("embedding").as("vb"), col("vn").as("nb"))
      val pairs = a.join(b, col("list_id") === col("lb") && col("ia") < col("ib"))
        .withColumn("s", cosine(dot(col("va"), col("vb")), col("na"), col("nb")))
      val stats = pairs.groupBy("list_id").agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(when(col("s") >= 0.95, col("ib"))).as("n_dropped"),
        max_by(struct(col("ia").as("ta"), col("ib").as("tb")),
          struct(col("s"), (-col("ia")).as("x"), (-col("ib")).as("y"))).as("top"),
        max(col("s")).as("ms"))
      mem.join(stats, Seq("list_id"), "left")
        .select(col("list_id"), col("n_members"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          col("top.ta").as("top_a"), col("top.tb").as("top_b"),
          round(col("ms") * 1e6).cast("long").as("top_score_x1e6"))
        .orderBy("list_id")
    },

    // int8 embedding quantization — the storage-compression pass a 100 TB
    // embedding store runs (4× smaller than float32, 8× than float64):
    // per-vector symmetric scale 127/max|e|, q_i = round(e_i · scale).
    // Entirely row-local (one HOF projection, no shuffle before the
    // output sort); the quantized vector is pinned by min/max/sum and a
    // rolling integer hash, so the oracle verifies every element, not a
    // summary. Cross-engine determinism: floats are promoted via exact
    // CAST to DOUBLE, the scale is one division and one multiply per
    // element (identical IEEE ops in both engines), and ROUND(double)
    // half-up away-from-zero agrees between Spark and DuckDB (validated
    // by the IVF k-means pass, r4).
    Q(
      "q_embed_quantize",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        |           FROM embeddings),
        |m AS (SELECT vec_id, ev, list_max(list_transform(ev, x -> abs(x))) AS ma FROM e),
        |z AS (SELECT vec_id,
        |        CASE WHEN ma = 0 THEN list_transform(ev, x -> CAST(0 AS BIGINT))
        |             ELSE list_transform(ev, x -> CAST(ROUND(x * (CAST(127 AS DOUBLE) / ma)) AS BIGINT)) END AS qv
        |      FROM m)
        |SELECT vec_id,
        |  CAST(list_min(qv) AS BIGINT) AS qmin,
        |  CAST(list_max(qv) AS BIGINT) AS qmax,
        |  CAST(list_sum(qv) AS BIGINT) AS qsum,
        |  list_reduce([CAST(0 AS BIGINT)] || list_transform(qv, v -> v + 128),
        |              (h, c) -> (h * 31 + c) % 1000000007) AS qhash
        |FROM z ORDER BY vec_id""",
    ) { (s, dir) =>
      Tables.spread(Tables.embeddings(s, dir))
        .withColumn("ev", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("ma", expr("array_max(transform(ev, x -> abs(x)))"))
        .withColumn("qv", expr(
          """CASE WHEN ma = 0D THEN transform(ev, x -> 0L)
            |     ELSE transform(ev, x -> CAST(ROUND(x * (CAST(127 AS DOUBLE) / ma)) AS BIGINT)) END""".stripMargin))
        .select(col("vec_id"),
          expr("CAST(array_min(qv) AS BIGINT)").as("qmin"),
          expr("CAST(array_max(qv) AS BIGINT)").as("qmax"),
          expr("aggregate(qv, 0L, (a, b) -> a + b)").as("qsum"),
          expr("aggregate(transform(qv, v -> v + 128L), 0L, (h, c) -> (h * 31 + c) % 1000000007)").as("qhash"))
        .orderBy("vec_id")
    },

    // Product-quantization ANN (IVF-PQ's compression half): dim-64
    // vectors quantized to exact x1e6 integers, split into m=8 subspaces
    // of 8 dims, each encoded as the id of its nearest of 16 sub-centroids
    // (seed codebook = first-16 vectors' sub-slices) under EXACT integer
    // squared-L2 — so codes, the ADC distance table, and every ranking
    // are bit-reproducible in DuckDB, no rounding anywhere. Search is
    // asymmetric distance computation: probes build an 8×16 distance
    // table; a candidate's distance is the sum of 8 table lookups over
    // its codes — the scan touches 8 SMALL code columns per row, never
    // the vectors (the 100 TB story: 256 B of floats → 8 codes per row,
    // 32× less I/O; encode is one broadcast join + map-side min_by
    // partial agg, search is one broadcast of 640 table rows).
    Q(
      "q_sim_ann_pq",
      """WITH q AS (SELECT vec_id,
        |        list_transform(CAST(embedding AS DOUBLE[]),
        |                       x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS q
        |      FROM embeddings),
        |sub AS (SELECT vec_id, j, q[j*8+1 : j*8+8] AS sub
        |        FROM q, (SELECT unnest(range(8)) AS j)),
        |cb AS (SELECT vec_id AS cid, j, sub AS c FROM sub WHERE vec_id < 16),
        |dc AS (SELECT s.vec_id, s.j, c.cid,
        |         CAST(list_sum(list_transform(range(1, 9),
        |           i -> (s.sub[i] - c.c[i]) * (s.sub[i] - c.c[i]))) AS BIGINT) AS d
        |       FROM sub s JOIN cb c USING (j)),
        |codes AS (SELECT vec_id, j, cid AS code FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
        |    FROM dc) WHERE rn = 1),
        |dtab AS (SELECT vec_id AS probe_id, j, cid, d FROM dc WHERE vec_id < 5),
        |adc AS (SELECT t.probe_id, k.vec_id AS neighbor_id,
        |          CAST(SUM(t.d) AS BIGINT) AS adc_dist
        |        FROM codes k JOIN dtab t ON k.j = t.j AND k.code = t.cid
        |          AND k.vec_id <> t.probe_id
        |        GROUP BY t.probe_id, k.vec_id),
        |r AS (SELECT probe_id, neighbor_id, adc_dist,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY adc_dist, neighbor_id) AS rn FROM adc)
        |SELECT probe_id, CAST(rn AS BIGINT) AS rn, neighbor_id, adc_dist
        |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""",
    ) { (s, dir) =>
      // exact integer squared-L2 of two BIGINT sub-vectors (row-local HOF)
      val l2 = "aggregate(zip_with(sub, c, (x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"
      val subs = emb(s, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
            .as("q"))
        .select(col("vec_id"), posexplode(
          expr("transform(sequence(0, 7), j -> slice(q, CAST(j*8+1 AS INT), 8))"))
          .as(Seq("j", "sub")))
      val cb = subs.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("j").as("cj"), col("sub").as("c"))
      // encode: nearest sub-centroid per (vector, subspace) — broadcast
      // the 128-row codebook, min_by partial agg (ties to lowest cid)
      val dAll = subs.join(broadcast(cb), col("j") === col("cj"))
        .withColumn("d", expr(l2))
      val codes = dAll
        .groupBy("vec_id", "j")
        .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("code"))
      // ADC table: probe × (subspace, centroid) distances — 5×8×16 rows
      val dtab = dAll.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("j").as("tj"),
          col("cid").as("tcid"), col("d"))
      val w = Window.partitionBy("probe_id").orderBy(col("adc_dist"), col("neighbor_id"))
      codes.join(broadcast(dtab),
          col("j") === col("tj") && col("code") === col("tcid") &&
            col("vec_id") =!= col("probe_id"))
        .groupBy(col("probe_id"), col("vec_id").as("neighbor_id"))
        .agg(sum(col("d")).cast("long").as("adc_dist"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select("probe_id", "rn", "neighbor_id", "adc_dist")
        .orderBy("probe_id", "rn")
    },

    // Matryoshka (MRL) truncation audit — the dimensionality-reduction
    // pass an embedding store runs before serving: retrieval quality of
    // the first-16-dims prefix is scored against the full-64-dim ranking.
    // Both similarity sets come from ONE broadcast-probes × linear-scan
    // pass (the q_sim_topk shape — never vectors²), with two per-probe
    // rank windows over the scored rows; output is the truncated top-5
    // per probe flagged with whether full-dim ranking agrees
    // (in_full_top5 — the per-item recall@5 audit). At 100 TB the scan
    // cost drops 4× with the prefix length while this audit stays a
    // constant-probe-set sample.
    Q(
      "q_embed_matryoshka",
      s"""WITH av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |tv AS (SELECT vec_id, v, v[1:16] AS t FROM av),
         |pr AS (SELECT vec_id AS probe_id, v AS pv, t AS pt FROM tv WHERE vec_id IN (3, 47)),
         |sc AS (SELECT p.probe_id, a.vec_id,
         |         ${cosSql("p.pv", "a.v")} AS sf,
         |         ${cosSql("p.pt", "a.t")} AS st
         |       FROM pr p JOIN tv a ON a.vec_id <> p.probe_id),
         |rk AS (SELECT probe_id, vec_id, st,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY st DESC, vec_id) AS rank_t,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY sf DESC, vec_id) AS rank_f
         |       FROM sc)
         |SELECT probe_id, rank_t AS rank, vec_id,
         |  CAST(ROUND(st * 1e6) AS BIGINT) AS score_t_x1e6,
         |  (rank_f <= 5) AS in_full_top5
         |FROM rk WHERE rank_t <= 5 ORDER BY probe_id, rank""",
    ) { (s, dir) =>
      val all = emb(s, dir).select(col("vec_id"), col("embedding"))
        .withColumn("t", slice(col("embedding"), 1, 16))
        .withColumn("vn", dot(col("embedding"), col("embedding")))
        .withColumn("tn", dot(col("t"), col("t")))
      val probes = all.filter(col("vec_id").isin(3L, 47L))
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
          col("t").as("pt"), col("vn").as("pn"), col("tn").as("ptn"))
      val scored = all.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("sf", cosine(dot(col("pv"), col("embedding")), col("pn"), col("vn")))
        .withColumn("st", cosine(dot(col("pt"), col("t")), col("ptn"), col("tn")))
      val byProbe = Window.partitionBy("probe_id")
      scored
        .withColumn("rank_t", row_number().over(byProbe.orderBy(col("st").desc, col("vec_id"))))
        .withColumn("rank_f", row_number().over(byProbe.orderBy(col("sf").desc, col("vec_id"))))
        .filter(col("rank_t") <= 5)
        .select(col("probe_id"), col("rank_t").cast("long").as("rank"), col("vec_id"),
          round(col("st") * 1e6).cast("long").as("score_t_x1e6"),
          (col("rank_f") <= 5).as("in_full_top5"))
        .orderBy("probe_id", "rank")
    },

    // Top principal component by ONE distributed power-iteration step —
    // the dimensionality-reduction primitive (PCA whitening, embedding
    // drift monitoring) done in EXACT integer arithmetic so both engines
    // agree bit-for-bit: components quantize to 1e-3 integers, per-pos
    // means are one rounded division of exact sums, and w = Xᶜᵀ(Xᶜ·1)
    // (centered X, all-ones start vector) is integer sums of integer
    // products throughout. Loadings are reported normalized to the
    // largest |w| via truncating integer division (sign split keeps
    // Spark's `div` and DuckDB's `//` identical on the negatives).
    // Scale shape: quantize+center is row-local after a 64-row mean
    // broadcast, the projection Xᶜ·1 is one keyed window (vec_id), and
    // the output agg is a 64-key partial-agg shuffle — two passes over
    // the data, the classic price of exact centering. Overflow headroom:
    // |xc| ≤ 2e3 · |dot| ≤ 1.3e5 → per-row product ≤ 2.6e8, int64 safe
    // to ~3e10 rows; past that the accumulators become DECIMAL(38,0).
    Q(
      "q_embed_pca_power",
      """WITH q AS (SELECT vec_id, CAST(generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS BIGINT) AS pos,
        |        CAST(ROUND(unnest(CAST(embedding AS DOUBLE[])) * 1000) AS BIGINT) AS qc
        |      FROM embeddings),
        |m AS (SELECT pos, CAST(ROUND(CAST(SUM(qc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_q
        |      FROM q GROUP BY pos),
        |x AS (SELECT q.vec_id, q.pos, q.qc - m.mean_q AS xc
        |      FROM q JOIN m ON q.pos = m.pos),
        |d AS (SELECT vec_id, CAST(SUM(xc) AS BIGINT) AS dot FROM x GROUP BY vec_id),
        |w AS (SELECT x.pos, CAST(SUM(d.dot * x.xc) AS BIGINT) AS proj
        |      FROM x JOIN d ON x.vec_id = d.vec_id GROUP BY x.pos),
        |mx AS (SELECT GREATEST(MAX(ABS(proj)), 1) AS mx FROM w)
        |SELECT pos, proj,
        |  CAST(CASE WHEN proj < 0 THEN -((-proj * 1000000) // mx)
        |            ELSE (proj * 1000000) // mx END AS BIGINT) AS loading_x1e6
        |FROM w, mx ORDER BY pos""",
    ) { (s, dir) =>
      val q = emb(s, dir).select(col("vec_id"),
          posexplode(expr(
            "transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000) AS BIGINT))"))
            .as(Seq("p0", "qc")))
        // DuckDB's generate_subscripts is 1-based; align the output key
        .withColumn("pos", (col("p0") + 1).cast("long")).drop("p0")
      val m = q.groupBy("pos")
        .agg(expr("CAST(ROUND(CAST(SUM(qc) AS DOUBLE) / COUNT(*)) AS BIGINT)").as("mean_q"))
      val x = q.join(broadcast(m), "pos").withColumn("xc", col("qc") - col("mean_q"))
      // Xᶜ·1 rides the same vec_id-keyed exchange as the rows it scales —
      // a window, not a join, so the corpus shuffles ONCE for this pass
      val d = x.withColumn("dot", sum(col("xc")).over(Window.partitionBy("vec_id")))
      val w = d.select(col("pos"), (col("dot") * col("xc")).as("pr"))
        .groupBy("pos").agg(sum(col("pr")).as("proj"))
      // 64-row reduction: the normalizer is output-scale metadata
      val mx = w.agg(greatest(max(abs(col("proj"))), lit(1L)).as("mx"))
      w.crossJoin(broadcast(mx))
        .select(col("pos"), col("proj"),
          when(col("proj") < 0, -expr("(-proj * 1000000L) div mx"))
            .otherwise(expr("(proj * 1000000L) div mx")).as("loading_x1e6"))
        .orderBy("pos")
    },

    // Distributed k-means, one full Lloyd refinement made first-class
    // (the IVF/SemDeDup assignment kernel plus the recompute-means step
    // those queries elide): seed = first 16 vectors; assign (broadcast
    // codebook, map-side max_by argmax); recompute each cluster's mean
    // EXACTLY (components quantized to 1e-6 integers, so the sums are
    // associative longs and the mean is one IEEE division of exact
    // values — order-independent in both engines); reassign against the
    // refined centroids. The recompute is the canonical distributed
    // shape: posexplode to (cluster, dim) keys → one partial-agg'd
    // shuffle ∝ N·d → 16·64 sums re-packed into centroid arrays. Output
    // audits the iteration per final cluster: size, how many vectors
    // CHANGED cluster (the convergence signal a k-means driver loops
    // on), and summed member cosine to the refined centroid (cohesion,
    // per-row-rounded so the sum is exact).
    Q(
      "q_cluster_kmeans",
      s"""WITH av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM av WHERE vec_id < 16),
         |la0 AS (SELECT a.vec_id, a.v, c.cid, ${cosSql("a.v", "c.cv")} AS csim FROM av a, c0 c),
         |a0 AS (SELECT vec_id, v, cid AS l0 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crn FROM la0)
         |  WHERE crn = 1),
         |comp AS (SELECT l0, pos, SUM(q) AS sq, COUNT(*) AS n FROM (
         |    SELECT l0, generate_subscripts(v, 1) AS pos,
         |           CAST(ROUND(unnest(v) * 1000000) AS BIGINT) AS q
         |    FROM a0) GROUP BY l0, pos),
         |cents AS (SELECT l0 AS cid1,
         |    list(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY pos) AS cv1
         |  FROM comp GROUP BY l0),
         |la1 AS (SELECT a.vec_id, a.l0, c.cid1, ${cosSql("a.v", "c.cv1")} AS csim
         |        FROM a0 a, cents c),
         |a1 AS (SELECT vec_id, l0, cid1 AS l1, csim FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid1) AS crn FROM la1)
         |  WHERE crn = 1)
         |SELECT l1 AS list_id, COUNT(*) AS n_members,
         |  CAST(SUM(CASE WHEN l0 <> l1 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
         |  CAST(SUM(CAST(ROUND(csim * 1e6) AS BIGINT)) AS BIGINT) AS cohesion_x1e6
         |FROM a1 GROUP BY l1 ORDER BY list_id""",
    ) { (s, dir) =>
      val all = emb(s, dir).select(col("vec_id"), col("embedding"))
        .withColumn("vn", dot(col("embedding"), col("embedding")))
      val c0 = all.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("vn").as("cn"))
      val a0 = nearestCentroid(all, "vec_id", "embedding", c0, "l0")
      val comp = a0
        .select(col("l0"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("q", round(col("x").cast("double") * 1e6).cast("long"))
        .groupBy(col("l0"), col("pos"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      val cents = comp
        .groupBy(col("l0"))
        .agg(sort_array(collect_list(struct(col("pos"),
          (col("sq").cast("double") / (col("n").cast("double") * 1e6)).as("c")))).as("ps"))
        .select(col("l0").as("cid1"), expr("transform(ps, p -> p.c)").as("cv1"))
        .withColumn("cn1", dot(col("cv1"), col("cv1")))
      val a1 = a0.crossJoin(broadcast(cents))
        .withColumn("csim", cosine(dot(col("embedding"), col("cv1")), col("vn"), col("cn1")))
        .groupBy(col("vec_id"))
        .agg(first(col("l0")).as("l0"),
          max_by(col("cid1"), struct(col("csim"), (-col("cid1")).as("nc"))).as("l1"),
          max(col("csim")).as("s1"))
      a1.groupBy(col("l1").as("list_id"))
        .agg(count(lit(1)).as("n_members"),
          sum(when(col("l0") =!= col("l1"), 1L).otherwise(0L)).as("n_moved"),
          sum(round(col("s1") * 1e6).cast("long")).as("cohesion_x1e6"))
        .orderBy("list_id")
    },

    // embedding-space OUTLIER flagging (the data-pruning / mislabel-
    // detection pass): per label, the 3 vectors farthest from their
    // label's mean embedding. DIVISION-FREE exact arithmetic — distance
    // from the mean scaled by n² is ‖n·x − S‖² over the 1e-6-quantized
    // components (S = the label's component-wise sum, n = label count),
    // so no rounded mean ever exists to disagree between engines; the
    // per-vector sum accumulates in DECIMAL(38,0) (int64 would overflow
    // near 2e8 quantized magnitudes — i.e. labels of ~200 vectors are
    // already within 4× of the cliff). Plan: one (label, pos) partial
    // agg for S (dims × labels rows, broadcast back), row-local
    // difference squares, one vec_id-keyed rollup, per-label top-3 rank
    // window over label-sized partitions.
    //
    // Output determinism (§7.5.2, VERDICT r6): the DECIMAL(38,0) distance
    // must NOT ship as a decimal — the driver hashes decimal
    // representations, which differ between engines even at scale 0. It
    // ships as two exact BIGINT halves (dist div 1e9, dist mod 1e9; dist
    // is non-negative so div/mod agree across engines, and max dist
    // ≈ 2.6e20 puts the high half well inside int64). DuckDB gotcha:
    // `//` on DECIMAL operands is FLOAT division (cast-to-BIGINT then
    // rounds, off-by-one vs floor) — the oracle routes through HUGEINT,
    // whose `//` is true integer division.
    Q(
      "q_embed_outliers",
      """WITH q AS (SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
        |      CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qc
        |    FROM embeddings),
        |cn AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY 1),
        |st AS (SELECT label, pos, CAST(SUM(qc) AS BIGINT) AS s FROM q GROUP BY 1, 2),
        |d AS (SELECT q.vec_id, q.label,
        |        CAST(SUM(CAST(cn.n * q.qc - st.s AS DECIMAL(38,0))
        |               * CAST(cn.n * q.qc - st.s AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dist
        |      FROM q JOIN st ON q.label = st.label AND q.pos = st.pos
        |      JOIN cn ON cn.label = q.label
        |      GROUP BY 1, 2)
        |SELECT label, CAST(rk AS BIGINT) AS rk, vec_id,
        |       CAST(CAST(dist AS HUGEINT) // 1000000000 AS BIGINT) AS dist_hi,
        |       CAST(CAST(dist AS HUGEINT) % 1000000000 AS BIGINT) AS dist_lo
        |FROM (SELECT label, vec_id, dist,
        |        row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rk
        |      FROM d)
        |WHERE rk <= 3 ORDER BY label, rk""",
    ) { (s, dir) =>
      val q = emb(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode_outer(expr(
            "transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000000) AS BIGINT))"))
            .as(Seq("pos0", "qc")))
        // DuckDB's generate_subscripts is 1-based; keep positions aligned
        .withColumn("pos", col("pos0") + 1).drop("pos0")
      val cn = emb(s, dir).groupBy("label").agg(count(lit(1)).as("n"))
      val st = q.groupBy("label", "pos").agg(sum(col("qc")).cast("long").as("s"))
      val d = q
        .join(broadcast(st), Seq("label", "pos"))
        .join(broadcast(cn), Seq("label"))
        .withColumn("t", expr("CAST(n * qc - s AS DECIMAL(38,0))"))
        .groupBy("vec_id", "label")
        .agg(expr("CAST(SUM(t * t) AS DECIMAL(38,0))").as("dist"))
      val rk = Window.partitionBy("label").orderBy(col("dist").desc, col("vec_id"))
      d.withColumn("rk", row_number().over(rk).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("label"), col("rk"), col("vec_id"),
          expr("CAST(dist div 1000000000 AS BIGINT)").as("dist_hi"),
          expr("CAST(dist % 1000000000 AS BIGINT)").as("dist_lo"))
        .orderBy("label", "rk")
    },

    // EMBEDDING-DISTRIBUTION DRIFT between corpus halves (r7) — the
    // data-quality monitor a training pipeline runs per ingest epoch:
    // has a label's embedding centroid MOVED between epoch A (even
    // vec_id) and epoch B (odd vec_id)? Division-free exact arithmetic,
    // the q_embed_outliers recipe applied to a two-sample statistic:
    // ‖S_A/n_A − S_B/n_B‖² scaled by (n_A·n_B)² is ‖n_B·S_A − n_A·S_B‖²
    // over 1e-6-quantized components — no rounded mean ever exists to
    // disagree between engines. Per-dimension differences stay int64
    // (|d| ≤ n·S ≈ n²·1e6, safe to n ≈ 2×10⁶ vectors per label); the
    // squared sum accumulates in DECIMAL(38,0) and ships as two exact
    // BIGINT halves (div/mod 1e9 — §7.5.2). Plan: ONE (label, pos)
    // partial agg over the exploded corpus (map-side combined; output
    // labels × dims rows), then label-sized joins/rollups — a single
    // pass over the data regardless of corpus size.
    Q(
      "q_embed_drift",
      """WITH q AS (SELECT vec_id, label, vec_id % 2 AS par,
        |      generate_subscripts(embedding, 1) AS pos,
        |      CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qc
        |    FROM embeddings),
        |cn AS (SELECT label,
        |        CAST(COUNT(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS na,
        |        CAST(COUNT(*) FILTER (WHERE vec_id % 2 = 1) AS BIGINT) AS nb
        |       FROM embeddings GROUP BY 1),
        |st AS (SELECT label, pos,
        |        CAST(COALESCE(SUM(qc) FILTER (WHERE par = 0), 0) AS BIGINT) AS sa,
        |        CAST(COALESCE(SUM(qc) FILTER (WHERE par = 1), 0) AS BIGINT) AS sb
        |       FROM q GROUP BY 1, 2),
        |d AS (SELECT st.label,
        |        CAST(SUM(CAST(cn.nb * st.sa - cn.na * st.sb AS DECIMAL(38,0))
        |               * CAST(cn.nb * st.sa - cn.na * st.sb AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS drift
        |      FROM st JOIN cn ON cn.label = st.label
        |      GROUP BY 1)
        |SELECT d.label, cn.na, cn.nb,
        |       CAST(CAST(drift AS HUGEINT) // 1000000000 AS BIGINT) AS drift_hi,
        |       CAST(CAST(drift AS HUGEINT) % 1000000000 AS BIGINT) AS drift_lo
        |FROM d JOIN cn ON cn.label = d.label
        |ORDER BY d.label""",
    ) { (s, dir) =>
      val q = emb(s, dir)
        .select(col("vec_id"), col("label"), (col("vec_id") % 2).as("par"),
          posexplode_outer(expr(
            "transform(embedding, e -> CAST(ROUND(CAST(e AS DOUBLE) * 1000000) AS BIGINT))"))
            .as(Seq("pos0", "qc")))
        .withColumn("pos", col("pos0") + 1).drop("pos0")
      val cn = emb(s, dir).groupBy("label").agg(
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("vec_id") % 2 === 1, 1L).otherwise(0L)).as("nb"))
      val st = q.groupBy("label", "pos").agg(
        coalesce(sum(when(col("par") === 0, col("qc"))), lit(0L)).cast("long").as("sa"),
        coalesce(sum(when(col("par") === 1, col("qc"))), lit(0L)).cast("long").as("sb"))
      st.join(broadcast(cn), Seq("label"))
        .withColumn("t", expr("CAST(nb * sa - na * sb AS DECIMAL(38,0))"))
        .groupBy("label")
        .agg(expr("CAST(SUM(t * t) AS DECIMAL(38,0))").as("drift"),
          max(col("na")).as("na"), max(col("nb")).as("nb"))
        .select(col("label"), col("na"), col("nb"),
          expr("CAST(drift div 1000000000 AS BIGINT)").as("drift_hi"),
          expr("CAST(drift % 1000000000 AS BIGINT)").as("drift_lo"))
        .orderBy("label")
    },

    // Margin-based bitext mining (r10; Artetxe & Schwenk — the parallel-
    // corpus miner behind CCMatrix/LASER-style training data): candidate
    // translation pairs scored by the MARGIN between their cosine and
    // the average cosine of each side's k-NN neighborhood, which
    // suppresses hubness (a vector cosine-close to EVERYTHING scores
    // high against any probe; dividing by its neighborhood average
    // cancels that). Sides here = even/odd vec_id halves ("languages"
    // this synthetic corpus lacks); per probe (side A, id < 40) the
    // best side-B candidate by margin, accepted at margin > 1.10.
    // Determinism: per-pair cosines quantize to x1e6 BIGINTs FIRST
    // (each a single IEEE-identical expression), so the neighborhood
    // sums are integer sums of identical integers — no float-sum
    // ordering anywhere; margin = cos6·2k·1e6 div (dA6 + dB6), guarded
    // to positive denominators (floor vs truncate never diverges).
    // Scale: forward pass = broadcast probes × ONE side-B scan (k-NN by
    // probe-partitioned window over probes×N rows); reverse pass = the
    // rank-cut candidate set (≤ probes·k rows, broadcast) × ONE side-A
    // scan; the margin join runs on rank-cut-sized relations. Two corpus
    // scans total — the documented two-pass price of the bidirectional
    // neighborhood, never a vectors × vectors blow-up.
    Q(
      "q_bitext_margin",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, vec_id % 2 AS side FROM embeddings),
         |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE side = 0 AND vec_id < 40),
         |b AS (SELECT vec_id AS cand_id, v AS cv FROM e WHERE side = 1),
         |fs AS (SELECT probe_id, cand_id, CAST(ROUND(${cosSql("pv", "cv")} * 1e6) AS BIGINT) AS cos6
         |       FROM b, p),
         |fr AS (SELECT probe_id, cand_id, cos6,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY cos6 DESC, cand_id) AS rn FROM fs),
         |knn AS (SELECT * FROM fr WHERE rn <= 4),
         |da AS (SELECT probe_id, CAST(SUM(cos6) AS BIGINT) AS da6 FROM knn GROUP BY probe_id),
         |ys AS (SELECT DISTINCT cand_id FROM knn),
         |aa AS (SELECT vec_id AS aid, v AS av FROM e WHERE side = 0),
         |rs AS (SELECT y.cand_id, aa.aid, CAST(ROUND(${cosSql("cv", "av")} * 1e6) AS BIGINT) AS cos6
         |       FROM aa, (SELECT b.cand_id, b.cv FROM b JOIN ys ON ys.cand_id = b.cand_id) y),
         |rr AS (SELECT cand_id, cos6,
         |         row_number() OVER (PARTITION BY cand_id ORDER BY cos6 DESC, aid) AS rn FROM rs),
         |db AS (SELECT cand_id, CAST(SUM(cos6) AS BIGINT) AS db6 FROM rr WHERE rn <= 4 GROUP BY cand_id),
         |m AS (SELECT k.probe_id, k.cand_id, k.cos6,
         |        CASE WHEN da.da6 + db.db6 > 0 AND k.cos6 > 0
         |             THEN CAST(k.cos6 * 8 * 1000000 // (da.da6 + db.db6) AS BIGINT)
         |             ELSE 0 END AS margin_x1e6
         |      FROM knn k JOIN da ON da.probe_id = k.probe_id JOIN db ON db.cand_id = k.cand_id)
         |SELECT probe_id, cand_id AS best_id, CAST(cos6 AS BIGINT) AS cos_x1e6,
         |  margin_x1e6, (margin_x1e6 > 1100000) AS accepted
         |FROM (SELECT m.*, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY margin_x1e6 DESC, cand_id) AS rn FROM m)
         |WHERE rn = 1 ORDER BY probe_id""",
    ) { (s, dir) =>
      val e = emb(s, dir)
        .select(col("vec_id"), col("embedding"), (col("vec_id") % 2).as("side"),
          dot(col("embedding"), col("embedding")).as("vn"))
      val probes = e.filter(col("side") === 0 && col("vec_id") < 40)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pv"), col("vn").as("pn"))
      val sideB = e.filter(col("side") === 1)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cv"), col("vn").as("cn"))
      val fw = Window.partitionBy("probe_id").orderBy(col("cos6").desc, col("cand_id"))
      val knn = sideB.crossJoin(broadcast(probes))
        .withColumn("cos6",
          round(cosine(dot(col("pv"), col("cv")), col("pn"), col("cn")) * 1e6).cast("long"))
        .withColumn("rn", row_number().over(fw))
        .filter(col("rn") <= 4)
        .select("probe_id", "cand_id", "cos6")
      val da = knn.groupBy("probe_id").agg(sum(col("cos6")).cast("long").as("da6"))
      // the candidate-id set is rank-cut-sized (≤ probes·k): broadcast it
      // into side B to pull the candidate vectors without shuffling B
      val ys = sideB.join(broadcast(knn.select("cand_id").distinct()), Seq("cand_id"))
      val sideA = e.filter(col("side") === 0)
        .select(col("vec_id").as("aid"), col("embedding").as("av"), col("vn").as("an"))
      val rw = Window.partitionBy("cand_id").orderBy(col("cos6").desc, col("aid"))
      val db = sideA.crossJoin(broadcast(ys))
        .withColumn("cos6",
          round(cosine(dot(col("cv"), col("av")), col("cn"), col("an")) * 1e6).cast("long"))
        .withColumn("rn", row_number().over(rw))
        .filter(col("rn") <= 4)
        .groupBy("cand_id").agg(sum(col("cos6")).cast("long").as("db6"))
      knn.join(broadcast(da), Seq("probe_id")).join(broadcast(db), Seq("cand_id"))
        .withColumn("margin_x1e6",
          when(col("da6") + col("db6") > 0 && col("cos6") > 0,
            expr("CAST(cos6 * 8 * 1000000L div (da6 + db6) AS BIGINT)")).otherwise(0L))
        .groupBy("probe_id")
        .agg(
          max_by(col("cand_id"), struct(col("margin_x1e6"), (-col("cand_id")).as("nc"))).as("best_id"),
          max_by(col("cos6"), struct(col("margin_x1e6"), (-col("cand_id")).as("nc")))
            .cast("long").as("cos_x1e6"),
          max(col("margin_x1e6")).cast("long").as("margin_x1e6"))
        .withColumn("accepted", col("margin_x1e6") > 1100000L)
        .orderBy("probe_id")
    },
  )
}
