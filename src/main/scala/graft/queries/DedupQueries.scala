package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (north star):
  * exact (content hash), n-gram Jaccard, MinHash+LSH, and SimHash — over
  * the `documents` table.
  *
  * Scale doctrine (VERDICT r1): NEVER all-pairs. Every near-dup variant
  * buckets documents by a key (shared shingle / LSH band signature /
  * SimHash chunk) with one keyed shuffle, and generates candidate pairs
  * INSIDE each bucket. An O(n²) cross join would be a 100 TB killer and
  * does not appear.
  *
  * Plan shape: bucket → groupBy(key) collect members → in-row pair
  * expansion — rather than a self-join of two copies of the bucketed
  * relation. The self-join form recomputes the expensive
  * scan→shingle→signature subtree once per branch (measured 2× slower at
  * sf0.1 even with persist, whose cache-population races cost more than
  * they saved); the collect form derives that subtree exactly once.
  * Bucket sizes bound the expansion (max 25 docs/shingle at sf0.1); at
  * larger scale a document-frequency cap on bucket keys (drop
  * stop-shingles) is the standard guard and composes with this plan.
  *
  * Determinism: thresholds use integer math (2*inter >= union ⟺
  * Jaccard ≥ 0.5); scores are floor-divided scaled integers; MinHash/
  * SimHash use xxhash64 (fixed seed inside Spark) so results are stable
  * across runs — but not reproducible in DuckDB, hence no-oracle for
  * those two (their exactness is asserted in LlmOpsSpec instead).
  */
object DedupQueries extends QueryPack {

  /** Deterministic total order for an output-sized result. A plain
    * orderBy range-samples its input — which RE-RUNS the whole upstream
    * plan once for sampling and once for the sort. The near-dup result
    * sets are tiny relative to their inputs, so one shuffle of the final
    * rows to a single partition + in-partition sort gives the same total
    * order in a single pass (measured: halves q_dedup_near at sf0.1).
    * Upstream stages keep full parallelism — only the already-small
    * result crosses the final exchange.
    */
  private def orderedOutput(df: DataFrame, cols: String*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols.head, cols.tail: _*)

  /** doc_id + distinct 3-word shingles, hashed to BIGINT at creation:
    * every downstream group/intersect then operates on longs instead of
    * ~15-char strings. A 64-bit collision among the distinct shingles of
    * a corpus partition has probability ~n²/2⁶⁴ — negligible next to the
    * sampling noise of any dedup pipeline. (Documents have ≥10 words at
    * every sf, so sequence(0, size-3) is always non-descending. The
    * spread() matters: the single-file scan would otherwise run the
    * whole shingling pipeline in one task.)
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir))
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(0, size(w) - 3), i -> xxhash64(concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3)))))")
          .as("shingles"))
      // materialization boundary: without it, downstream projections that
      // explode `shingles` AND reference it again (size, array_min
      // signatures) re-evaluate the whole HOF construction per OUTPUT row
      // — whole-stage codegen does no CSE across a Generate. The shuffle
      // writes concrete arrays once; measured 5 s → sub-second on the
      // explode stage at sf0.1.
      .repartition(col("doc_id"))

  /** Ordered candidate pairs from a bucketed relation: `buckets` carries a
    * `members` array of structs with a `doc_id` field; each bucket row
    * expands to its (a, b) member pairs with a.doc_id < b.doc_id. Shared
    * by the shingle, MinHash-band and SimHash-chunk pipelines.
    */
  private def expandPairs(buckets: DataFrame): DataFrame =
    buckets
      .filter(size(col("members")) > 1)
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))

  /** exact Jaccard ≥ 0.5 pairs in one pass: explode shingles (carrying the
    * set size), bucket by shingle, expand pairs inside each bucket, then
    * count shared shingles per pair — inter is exact because EVERY shared
    * shingle contributes one bucket co-occurrence.
    */
  private def jaccardPairs(sh: DataFrame): DataFrame = {
    // explode_outer, not explode: plain explode makes the optimizer push a
    // `size(arr)>0 AND isnotnull(arr)` guard all the way down to the scan,
    // where it re-evaluates the whole shingle construction per row in the
    // single scan task (seen in the physical plan as a Filter under the
    // spread Exchange). Shingle arrays are never empty (≥10 words/doc), so
    // the outer variant is semantically identical and skips the guard.
    val ex = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("ns"),
      explode_outer(col("shingles")).as("sg"))
    val buckets = ex.groupBy("sg")
      .agg(collect_list(struct(col("doc_id"), col("ns"))).as("members"))
    expandPairs(buckets)
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.ns").as("na"), col("b.ns").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("da"), col("db"),
        expr("CAST((inter * 10000L) div uni AS BIGINT)").as("jacc_x1e4"))
  }

  override def queries: Seq[Q] = Seq(

    // exact dedup: content hash + keeper rank. Emits one row per document
    // (rank 1 = keeper) so the operator is observable even in corpora with
    // no duplicates; at sf0.1 the 8 duplicated texts rank 2+.
    Q(
      "q_dedup_exact",
      """SELECT doc_id, md5(text) AS text_hash,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS BIGINT) AS dup_rank,
        |  (ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1) AS is_keeper
        |FROM documents ORDER BY doc_id""",
    ) { (s, dir) =>
      val w = Window.partitionBy("text_hash").orderBy("doc_id")
      Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("text_hash"))
        .withColumn("dup_rank", row_number().over(w).cast("long"))
        .withColumn("is_keeper", col("dup_rank") === 1)
        .orderBy("doc_id")
    },

    // n-gram (3-shingle) exact Jaccard near-dup pairs at ≥ 0.5 via the
    // shingle-bucket count plan above.
    Q(
      "q_dedup_near",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id,
        |        list_distinct(list_transform(range(0, len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shs
        |      FROM d),
        |ex AS (SELECT doc_id, unnest(shs) AS sg FROM s),
        |n AS (SELECT doc_id, CAST(len(shs) AS BIGINT) AS ns FROM s),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        |      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT da, db, CAST((inter * 10000) // (na.ns + nb.ns - inter) AS BIGINT) AS jacc_x1e4
        |FROM p JOIN n na ON na.doc_id = da JOIN n nb ON nb.doc_id = db
        |WHERE inter * 2 >= na.ns + nb.ns - inter
        |ORDER BY da, db""",
    ) { (s, dir) =>
      orderedOutput(jaccardPairs(shingled(s, dir)), "da", "db")
    },

    // MinHash + LSH: 16 hash functions (xxhash64 salted by index), 8 bands
    // of 2 — the s-curve knee sits near (1/b)^(1/r) ≈ 0.35, right for a
    // 0.5-Jaccard dedup threshold, and pairs at j ≥ 0.9 are missed with
    // probability (1-j²)^8 < 2e-6. Candidates agree on at least one band
    // key and are verified with exact Jaccard ≥ 0.5 (row-local
    // array_intersect on the collected shingle sets): probabilistic
    // recall, exact precision. The whole signature+band computation is a
    // single projection over one scan — bands come from an exploded
    // transform, not 8 unioned subplans.
    Q.noOracle("q_dedup_minhash") { (s, dir) =>
      val sigArr = expr(
        "transform(sequence(0, 15), j -> array_min(transform(shingles, x -> xxhash64(j, x))))")
      val banded = shingled(s, dir)
        .select(col("doc_id"), col("shingles"), sigArr.as("sig"))
        .select(col("doc_id"), col("shingles"),
          explode_outer(expr( // outer: skip the pushed-down non-empty guard
            "transform(sequence(0, 7), b -> named_struct('band', b, 'bkey', xxhash64(element_at(sig, 2*b+1), element_at(sig, 2*b+2))))"))
            .as("bb"))
      val buckets = banded.groupBy(col("bb.band"), col("bb.bkey"))
        .agg(collect_list(struct(col("doc_id"), col("shingles"))).as("members"))
      val pairs = expandPairs(buckets)
        // same pair can collide in several bands — keep one copy
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(first(col("a.shingles")).as("sa"), first(col("b.shingles")).as("sb"))
      orderedOutput(
        pairs
          .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .withColumn("uni", size(array_union(col("sa"), col("sb"))).cast("long"))
          .filter(col("inter") * 2 >= col("uni"))
          .select(col("da"), col("db"),
            expr("CAST((inter * 10000L) div uni AS BIGINT)").as("jacc_x1e4")),
        "da", "db")
    },

    // SimHash: 64-bit signature from per-token xxhash64 votes; candidate
    // pairs share at least one of four 16-bit chunks (guaranteed complete
    // for hamming ≤ 3, best-effort beyond); emitted with exact hamming
    // distance ≤ 8. Chunks explode from one projection of the signature.
    Q.noOracle("q_dedup_simhash") { (s, dir) =>
      // token multiset votes: bit i of simhash = sign of Σ_instances (±1).
      // Voting per token INSTANCE equals voting per distinct token weighted
      // by count, so no (doc, tok) pre-aggregation — one shuffle, not two.
      // The ±1 vote sum is derived, not aggregated: with b_i = Σ bit_i and
      // n = token count, Σ(±1) = 2·b_i − n. The 64 per-bit counters are
      // SIMD-in-a-register packed, 4 16-bit lanes per long (bit g+16·l in
      // lane l of packed counter g): 17 aggregate buffers instead of 65,
      // which keeps the generated HashAggregate small enough to compile
      // fast — the bench runs every query cold, so janino compile time IS
      // query time. Lane 3 (shift 48) bounds tokens/doc at 32767 before
      // signed-long overflow; documents carry ≲2k tokens at every sf.
      val tokens = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), explode_outer(split(col("text"), " ")).as("tok"))
        .withColumn("th", xxhash64(col("tok")))
      val packedSums = (0 until 16).map { g =>
        val lanes = (0 until 4)
          .map(l => s"(((th >> ${g + 16 * l}) & 1) << ${16 * l})")
          .mkString(" | ")
        sum(expr(lanes)).as(s"p$g")
      } :+ count(lit(1)).as("n")
      val voted = tokens.groupBy("doc_id").agg(packedSums.head, packedSums.tail: _*)
      val simhash = (0 until 64).map { i =>
        val (g, l) = (i % 16, i / 16)
        val b = expr(s"(p$g >> ${16 * l}) & 65535")
        when(b * 2 > col("n"), lit(1L << i)).otherwise(0L)
      }.reduce(_ + _) // deterministic: plain long addition of disjoint bits
      val sig = voted.select(col("doc_id"), simhash.as("sh"))
      val chunked = sig.select(col("doc_id"), col("sh"),
        explode_outer(expr( // outer: skip the pushed-down non-empty guard
          "transform(sequence(0, 3), c -> named_struct('chunk', c, 'ckey', (sh >> (c * 16)) & 65535))"))
          .as("cc"))
      val buckets = chunked.groupBy(col("cc.chunk"), col("cc.ckey"))
        .agg(collect_list(struct(col("doc_id"), col("sh"))).as("members"))
      orderedOutput(
        expandPairs(buckets)
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(first(col("a.sh")).as("sha"), first(col("b.sh")).as("shb"))
          .withColumn("hamming", bit_count(expr("sha ^ shb")).cast("long"))
          .filter(col("hamming") <= 8)
          .select(col("da"), col("db"), col("hamming")),
        "da", "db")
    },
  )
}
