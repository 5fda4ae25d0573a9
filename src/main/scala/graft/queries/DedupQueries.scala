package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline (north star):
  * exact (content hash), n-gram Jaccard (bucketed shingle join),
  * MinHash+LSH, and SimHash — over the `documents` table.
  *
  * Scale doctrine (VERDICT r1): NEVER all-pairs. Every near-dup variant
  * here generates candidates through an equi-join on a bucket key
  * (shared shingle / LSH band signature / SimHash chunk), so the shuffle
  * is keyed and bounded, then verifies candidates exactly. An O(n²)
  * cross join would be a 100 TB killer and does not appear.
  *
  * Determinism: thresholds use integer math (2*inter >= union ⟺
  * Jaccard ≥ 0.5); scores are floor-divided scaled integers; MinHash/
  * SimHash use xxhash64 (fixed seed inside Spark) so results are stable
  * across runs — but not reproducible in DuckDB, hence no-oracle for
  * those two (their exactness is asserted in DedupSpec instead).
  */
object DedupQueries extends QueryPack {

  /** doc_id + distinct 3-word shingles (documents have ≥10 words at every
    * sf, so sequence(0, size-3) is always non-descending).
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(0, size(w) - 3), i -> concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))")
          .as("shingles"))

  /** candidate pairs (da < db, inter > 0) from a shared-shingle equi-join. */
  private def shinglePairs(sh: DataFrame): DataFrame = {
    val ex = sh.select(col("doc_id"), explode(col("shingles")).as("sg"))
    val a = ex.select(col("doc_id").as("da"), col("sg"))
    val b = ex.select(col("doc_id").as("db"), col("sg").as("sg_b"))
    a.join(b, col("sg") === col("sg_b") && col("da") < col("db"))
      .groupBy("da", "db")
      .agg(count(lit(1)).as("inter"))
  }

  /** join per-doc shingle counts and keep pairs with Jaccard ≥ 0.5,
    * scoring with exact integer math.
    */
  private def jaccardFilter(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val n = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("ns"))
    pairs
      .join(n.withColumnRenamed("doc_id", "da").withColumnRenamed("ns", "na"), "da")
      .join(n.withColumnRenamed("doc_id", "db").withColumnRenamed("ns", "nb"), "db")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("da"), col("db"),
        expr("CAST((inter * 10000L) div uni AS BIGINT)").as("jacc_x1e4"))
      .orderBy("da", "db")
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

    // n-gram (3-shingle) Jaccard near-dup pairs at ≥ 0.5, candidates via
    // the shared-shingle equi-join (SURVEY §2B plan — bucketed, not
    // all-pairs).
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
      val sh = shingled(s, dir)
      jaccardFilter(shinglePairs(sh), sh)
    },

    // MinHash + LSH: 16 hash functions (xxhash64 salted by index), 8 bands
    // of 2 — the s-curve knee sits near (1/b)^(1/r) ≈ 0.35, right for a
    // 0.5-Jaccard dedup threshold, and pairs at j ≥ 0.9 are missed with
    // probability (1-j²)^8 < 2e-6. Candidates agree on at least one full
    // band and are then verified with exact Jaccard ≥ 0.5: probabilistic
    // recall, exact precision.
    Q.noOracle("q_dedup_minhash") { (s, dir) =>
      val sh = shingled(s, dir)
      // sig_j = min over shingles of xxhash64(j, shingle)
      val sigCols = (0 until 16).map(j =>
        expr(s"array_min(transform(shingles, x -> xxhash64($j, x)))").as(s"sig$j"))
      val signed = sh.select(col("doc_id") +: sigCols: _*)
      // band key = hash of the band's 2 signature slots
      val bands = (0 until 8).map { b =>
        val slots = (0 until 2).map(r => col(s"sig${b * 2 + r}"))
        signed.select(col("doc_id"), lit(b).as("band"),
          xxhash64(slots: _*).as("bkey"))
      }.reduce(_ union _)
      val a = bands.select(col("doc_id").as("da"), col("band"), col("bkey"))
      val b = bands.select(col("doc_id").as("db"), col("band").as("band_b"), col("bkey").as("bkey_b"))
      val candidates = a.join(b,
          col("band") === col("band_b") && col("bkey") === col("bkey_b") && col("da") < col("db"))
        .select("da", "db").distinct()
      // exact verification on candidates only
      val withSets = candidates
        .join(sh.select(col("doc_id").as("da"), col("shingles").as("sa")), "da")
        .join(sh.select(col("doc_id").as("db"), col("shingles").as("sb")), "db")
        .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("uni", size(array_union(col("sa"), col("sb"))).cast("long"))
        .filter(col("inter") * 2 >= col("uni"))
      withSets.select(col("da"), col("db"),
          expr("CAST((inter * 10000L) div uni AS BIGINT)").as("jacc_x1e4"))
        .orderBy("da", "db")
    },

    // SimHash: 64-bit signature from per-token xxhash64 votes; candidate
    // pairs share at least one of four 16-bit chunks (guaranteed complete
    // for hamming ≤ 3, best-effort beyond); emitted with exact hamming
    // distance ≤ 8.
    Q.noOracle("q_dedup_simhash") { (s, dir) =>
      // token multiset votes: bit i of simhash = sign of Σ_tokens cnt * (±1)
      val tokens = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("th", xxhash64(col("tok")))
      val bitSums = (0 until 64).map(i =>
        sum(when(expr(s"(th >> $i) & 1") === 1, col("cnt")).otherwise(-col("cnt"))).as(s"s$i"))
      val voted = tokens.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val simhash = (0 until 64)
        .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
        .reduce(_ + _) // deterministic: plain long addition of disjoint bits
      val sig = voted.select(col("doc_id"), simhash.as("sh"))
      val chunks = (0 until 4).map(cq =>
          sig.select(col("doc_id"), lit(cq).as("chunk"),
            expr(s"(sh >> ${cq * 16}) & 65535").as("ckey"), col("sh")))
        .reduce(_ union _)
      val a = chunks.select(col("doc_id").as("da"), col("chunk"), col("ckey"), col("sh").as("sha"))
      val b = chunks.select(col("doc_id").as("db"), col("chunk").as("chunk_b"), col("ckey").as("ckey_b"), col("sh").as("shb"))
      a.join(b, col("chunk") === col("chunk_b") && col("ckey") === col("ckey_b") && col("da") < col("db"))
        .select("da", "db", "sha", "shb").distinct()
        .withColumn("hamming", bit_count(expr("sha ^ shb")).cast("long"))
        .filter(col("hamming") <= 8)
        .select(col("da"), col("db"), col("hamming"))
        .orderBy("da", "db")
    },
  )
}
