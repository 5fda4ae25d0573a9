package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-ranking operators (north star): BM25 lexical scoring and
  * hybrid lexical+vector fusion — the two halves of the RAG retrieval
  * stack a training/eval pipeline runs over its corpus (documents +
  * embeddings share the same id domain in the testdata, as they would in
  * a real doc store with a vector sidecar).
  *
  * Determinism doctrine (SURVEY.md §7.5): BM25's real-valued formula is
  * re-expressed in EXACT integer arithmetic — the classic (k1=1.2,
  * b=0.75) parameters multiply through to integer coefficients
  * (num/den × 10·avgdl: k1+1=2.2 → 22·tf·avgdl over 10·tf·avgdl +
  * 3·avgdl + 9·dl), and the idf surrogate (N−df+0.5)/(df+0.5) becomes
  * (2(N−df)+1)/(2df+1) — so Spark `div` and DuckDB `//` floor-divide the
  * same integers and the scores hash identically. No ln(): monotone in
  * the true idf at fixed N, which preserves BM25's ranking behavior —
  * the constant-base log rescales scores but this surrogate is what both
  * engines compute bit-for-bit. Reciprocal-rank fusion is integer by
  * construction (1e6 // (60+rank)).
  *
  * Scale notes:
  *  - q_bm25: corpus stats (N, avgdl) are ONE global-agg row broadcast
  *    into the scoring scan; tf is the word-count shape (explode →
  *    partial agg); df attaches via a per-term count window whose
  *    partitions are term-sized (bounded by query length, not corpus).
  *    One keyed shuffle + one broadcast; final top-k is
  *    TakeOrderedAndProject, never a global sort.
  *  - q_hybrid_rrf: both rankers broadcast the 3 probes against one
  *    linear scan each (the exact baseline, like q_sim_topk — the ANN
  *    packs are the scale path for the vector side); the rank join is
  *    keyed on (probe, candidate) over ranker-output-sized relations.
  *    Probe-partitioned windows scale with query load, not data.
  */
object RetrievalQueries extends QueryPack {

  /** BM25 probe terms — fixed "query" the corpus is ranked against. */
  private val Terms = Seq("join", "vector", "window")
  private val TermsSql = Terms.map(t => s"'$t'").mkString("(", ",", ")")

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a,$b) / sqrt(list_dot_product($a,$a) * list_dot_product($b,$b))"

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("graft_vecdot", a, b)

  override def queries: Seq[Q] = Seq(

    // BM25 top-10 documents for a 3-term query, exact integer arithmetic
    // throughout (see object scaladoc for the coefficient derivation).
    Q(
      "q_bm25",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |dd AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, w FROM d),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |              CAST((SUM(dl) * 100) // COUNT(*) AS BIGINT) AS avgdl_x100 FROM dd),
         |tf AS (SELECT doc_id, dl, word, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM (SELECT doc_id, dl, unnest(w) AS word FROM dd)
         |       WHERE word IN $TermsSql GROUP BY doc_id, dl, word),
         |wd AS (SELECT *, CAST(COUNT(*) OVER (PARTITION BY word) AS BIGINT) AS df FROM tf),
         |sc AS (SELECT doc_id, word,
         |         CAST(((2 * (n_docs - df) + 1) * 1000000) // (2 * df + 1) AS BIGINT) AS idf_x1e6,
         |         CAST((tf * 22 * avgdl_x100 * 1000000)
         |              // (10 * tf * avgdl_x100 + 3 * avgdl_x100 + 9 * dl * 100) AS BIGINT) AS tfn_x1e6
         |       FROM wd, st),
         |ds AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |              CAST(SUM((idf_x1e6 * tfn_x1e6) // 1000000) AS BIGINT) AS score_x1e6
         |       FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_terms, score_x1e6 FROM ds
         |ORDER BY score_x1e6 DESC, doc_id LIMIT 10""",
    ) { (s, dir) =>
      val docs = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("dl", size(col("w")).cast("long"))
      // ONE row of corpus statistics; the global agg's exchange carries a
      // partial row per partition (allowed by the plan sweep), and the
      // result broadcasts into the scoring scan.
      val stats = docs.agg(count(lit(1)).cast("long").as("n_docs"),
        expr("CAST((sum(dl) * 100L) div count(1) AS BIGINT)").as("avgdl_x100"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("w")).as("word"))
        .filter(col("word").isin(Terms: _*))
        .groupBy("doc_id", "dl", "word").agg(count(lit(1)).cast("long").as("tf"))
      val byWord = Window.partitionBy("word")
      tf.withColumn("df", count(lit(1)).over(byWord).cast("long"))
        .crossJoin(broadcast(stats))
        .withColumn("idf_x1e6",
          expr("CAST(((2L * (n_docs - df) + 1L) * 1000000L) div (2L * df + 1L) AS BIGINT)"))
        .withColumn("tfn_x1e6",
          expr("CAST((tf * 22L * avgdl_x100 * 1000000L) " +
            "div (10L * tf * avgdl_x100 + 3L * avgdl_x100 + 9L * dl * 100L) AS BIGINT)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_terms"),
          sum(expr("(idf_x1e6 * tfn_x1e6) div 1000000L")).cast("long").as("score_x1e6"))
        .orderBy(col("score_x1e6").desc, col("doc_id"))
        .limit(10)
        .select("doc_id", "n_terms", "score_x1e6")
    },

    // Hybrid retrieval via reciprocal-rank fusion: a lexical ranker
    // (distinct-word-set overlap with the probe document) and a vector
    // ranker (cosine against the probe embedding) each rank ALL
    // candidates for 3 probes; RRF folds the two rank lists with the
    // standard k=60 constant — 1e6 // (60 + rank), summed — and the
    // fused top-5 per probe is returned with both source ranks for
    // diagnosability. Both inputs to the rank join are complete rankings
    // over the same candidate set, so the inner join is lossless.
    Q(
      "q_hybrid_rrf",
      s"""WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |pd AS (SELECT doc_id AS probe_id, ws AS pw FROM d WHERE doc_id < 3),
         |pe AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 3),
         |lx AS (SELECT pd.probe_id, d.doc_id AS cand_id,
         |         CAST(len(list_intersect(d.ws, pd.pw)) AS BIGINT) AS ovl
         |       FROM d, pd WHERE d.doc_id <> pd.probe_id),
         |lr AS (SELECT probe_id, cand_id,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY ovl DESC, cand_id) AS rl FROM lx),
         |vx AS (SELECT pe.probe_id, e.vec_id AS cand_id, ${cosSql("e.v", "pe.pv")} AS score
         |       FROM e, pe WHERE e.vec_id <> pe.probe_id),
         |vr AS (SELECT probe_id, cand_id,
         |         row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, cand_id) AS rv FROM vx),
         |f AS (SELECT lr.probe_id, lr.cand_id, CAST(rl AS BIGINT) AS lex_rank,
         |        CAST(rv AS BIGINT) AS vec_rank,
         |        CAST(1000000 // (60 + rl) + 1000000 // (60 + rv) AS BIGINT) AS rrf_x1e6
         |      FROM lr JOIN vr ON lr.probe_id = vr.probe_id AND lr.cand_id = vr.cand_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY rrf_x1e6 DESC, cand_id) AS rn FROM f)
         |SELECT probe_id, CAST(rn AS BIGINT) AS rn, cand_id, lex_rank, vec_rank, rrf_x1e6
         |FROM r WHERE rn <= 5 ORDER BY probe_id, rn""",
    ) { (s, dir) =>
      val docs = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
      val probesD = docs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("probe_id"), col("ws").as("pw"))
      // lexical: |candidate ∩ probe| over distinct word sets — both
      // engines' intersections are set-valued over distinct inputs, so
      // the cardinalities agree exactly
      val lex = docs.crossJoin(broadcast(probesD))
        .filter(col("doc_id") =!= col("probe_id"))
        .select(col("probe_id"), col("doc_id").as("cand_id"),
          size(array_intersect(col("ws"), col("pw"))).cast("long").as("ovl"))
      val wl = Window.partitionBy("probe_id").orderBy(col("ovl").desc, col("cand_id"))
      val lexRank = lex.withColumn("rl", row_number().over(wl).cast("long"))
        .select("probe_id", "cand_id", "rl")
      // vector: cosine via the native codegen dot (bit-identical to the
      // oracle's list_dot_product — see VectorQueries doctrine), self-dot
      // precomputed per vector before the broadcast pairing
      val emb = Tables.spread(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("embedding").as("v"))
        .withColumn("vn", dot(col("v"), col("v")))
      val probesV = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("vn").as("pn"))
      val vec = emb.crossJoin(broadcast(probesV))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("cand_id"),
          (dot(col("v"), col("pv")) / sqrt(col("vn") * col("pn"))).as("score"))
      val wv = Window.partitionBy("probe_id").orderBy(col("score").desc, col("cand_id"))
      val vecRank = vec.withColumn("rv", row_number().over(wv).cast("long"))
        .select("probe_id", "cand_id", "rv")
      val fused = lexRank.join(vecRank, Seq("probe_id", "cand_id"))
        .select(col("probe_id"), col("cand_id"), col("rl").as("lex_rank"),
          col("rv").as("vec_rank"),
          expr("CAST(1000000L div (60L + rl) + 1000000L div (60L + rv) AS BIGINT)")
            .as("rrf_x1e6"))
      val wf = Window.partitionBy("probe_id").orderBy(col("rrf_x1e6").desc, col("cand_id"))
      fused.withColumn("rn", row_number().over(wf).cast("long"))
        .filter(col("rn") <= 5)
        .select("probe_id", "rn", "cand_id", "lex_rank", "vec_rank", "rrf_x1e6")
        .orderBy("probe_id", "rn")
    },

    // retrieval-quality EVALUATION (the IR-metrics harness every
    // retrieval stack ships next to its rankers): cosine top-10 per
    // probe judged against label relevance (same label = relevant, the
    // embeddings table's ground truth), reported as hits@10, exact
    // integer P@5 (hits·2000 = hits·1e4/5) and MRR×1e6 (floor(1e6/first
    // relevant rank), 0 when none lands in the cut). Scale: the ranking
    // is the broadcast-probes linear scan of q_sim_topk (probe count ×
    // N dot products, no pair blow-up); metrics aggregate the top-10
    // rows only — evaluation cost is rank-cut-sized, not corpus-sized.
    Q(
      "q_retrieval_eval",
      s"""WITH p AS (SELECT vec_id AS probe_id, label AS plabel,
         |             CAST(embedding AS DOUBLE[]) AS pv
         |           FROM embeddings WHERE vec_id < 5),
         |a AS (SELECT vec_id AS nid, label AS nlabel, CAST(embedding AS DOUBLE[]) AS nv
         |      FROM embeddings),
         |s AS (SELECT probe_id, plabel, nid, nlabel, ${cosSql("pv", "nv")} AS score
         |      FROM a, p WHERE nid <> probe_id),
         |r AS (SELECT probe_id, plabel, nlabel,
         |        row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, nid) AS rn
         |      FROM s)
         |SELECT probe_id, plabel AS label,
         |  CAST(COUNT(*) FILTER (WHERE nlabel = plabel) AS BIGINT) AS n_rel_top10,
         |  CAST(COUNT(*) FILTER (WHERE nlabel = plabel AND rn <= 5) * 2000 AS BIGINT) AS p_at5_x1e4,
         |  CAST(COALESCE(1000000 // MIN(CASE WHEN nlabel = plabel THEN rn END), 0) AS BIGINT) AS mrr_x1e6
         |FROM r WHERE rn <= 10
         |GROUP BY probe_id, plabel ORDER BY probe_id""",
    ) { (s, dir) =>
      val base = Tables.spread(Tables.embeddings(s, dir))
      val probes = base.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("label").as("plabel"),
          col("embedding").as("pv"))
        .withColumn("pn", dot(col("pv"), col("pv")))
      val cands = base
        .select(col("vec_id").as("nid"), col("label").as("nlabel"),
          col("embedding").as("nv"))
        .withColumn("nn", dot(col("nv"), col("nv")))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nid"))
      cands.crossJoin(broadcast(probes))
        .filter(col("nid") =!= col("probe_id"))
        .withColumn("score", dot(col("pv"), col("nv")) / sqrt(col("pn") * col("nn")))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .groupBy(col("probe_id"), col("plabel").as("label"))
        .agg(
          sum(when(col("nlabel") === col("plabel"), 1L).otherwise(0L)).as("n_rel_top10"),
          (sum(when(col("nlabel") === col("plabel") && col("rn") <= 5, 1L).otherwise(0L)) * 2000)
            .as("p_at5_x1e4"),
          coalesce(expr("1000000L div MIN(CASE WHEN nlabel = plabel THEN rn END)"), lit(0L))
            .as("mrr_x1e6"))
        .orderBy("probe_id")
    },

    // NDCG@10 (r10) — the position-WEIGHTED retrieval metric
    // q_retrieval_eval's set metrics (hits, P@5, MRR) can't express: a
    // relevant hit at rank 1 is worth more than at rank 10, and the
    // score normalizes against the best achievable ordering so probes
    // with few relevant candidates aren't penalized for corpus makeup.
    // Determinism: the 1/log2(rank+1) discounts are FIXED x1e6 integer
    // literals for ranks 1..10 (the only floats in NDCG are these ten
    // constants — freezing them makes both engines sum identical
    // integers; no ln()/log2() call anywhere). Ideal DCG = the same
    // weights over min(R, 10) top ranks, where R = the label's corpus
    // relevant count (cohort size − 1) from a 1-row-per-label broadcast.
    // Scale: ranking is the broadcast-probes linear scan (q_sim_topk's
    // shape); metrics aggregate rank-cut rows; the label histogram is a
    // |labels|-row broadcast.
    Q(
      "q_retrieval_ndcg",
      s"""WITH wt AS (SELECT [1000000,630930,500000,430677,386853,356207,333333,315465,301030,289065] AS w),
         |p AS (SELECT vec_id AS probe_id, label AS plabel,
         |        CAST(embedding AS DOUBLE[]) AS pv
         |      FROM embeddings WHERE vec_id < 5),
         |lc AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY label),
         |a AS (SELECT vec_id AS nid, label AS nlabel, CAST(embedding AS DOUBLE[]) AS nv
         |      FROM embeddings),
         |s AS (SELECT probe_id, plabel, nid, nlabel, ${cosSql("pv", "nv")} AS score
         |      FROM a, p WHERE nid <> probe_id),
         |r AS (SELECT probe_id, plabel, nlabel,
         |        row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, nid) AS rn
         |      FROM s),
         |d AS (SELECT probe_id, plabel,
         |        CAST(COUNT(*) FILTER (WHERE nlabel = plabel) AS BIGINT) AS n_rel_top10,
         |        CAST(COALESCE(SUM(CASE WHEN nlabel = plabel THEN w[CAST(rn AS INT)] END), 0) AS BIGINT) AS dcg_x1e6
         |      FROM r, wt WHERE rn <= 10 GROUP BY probe_id, plabel),
         |i AS (SELECT d.probe_id, d.plabel, d.n_rel_top10, d.dcg_x1e6,
         |        CAST(list_sum(wt.w[1:CAST(least(lc.n - 1, 10) AS INT)]) AS BIGINT) AS idcg_x1e6
         |      FROM d JOIN lc ON lc.label = d.plabel, wt)
         |SELECT probe_id, plabel AS label, n_rel_top10, dcg_x1e6, idcg_x1e6,
         |  CAST(dcg_x1e6 * 1000000 // idcg_x1e6 AS BIGINT) AS ndcg_x1e6
         |FROM i ORDER BY probe_id""",
    ) { (s, dir) =>
      val wts = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
        356207L, 333333L, 315465L, 301030L, 289065L)
      val wArr = array(wts.map(lit): _*)
      val base = Tables.spread(Tables.embeddings(s, dir))
      val probes = base.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("label").as("plabel"),
          col("embedding").as("pv"))
        .withColumn("pn", dot(col("pv"), col("pv")))
      val labelCounts = base.groupBy(col("label").as("lbl"))
        .agg(count(lit(1)).as("n"))
        // ideal DCG folds on the |labels|-sized relation, before broadcast
        .withColumn("wt", wArr)
        .withColumn("r", least(col("n") - 1, lit(10L)).cast("int"))
        .withColumn("idcg_x1e6",
          expr("aggregate(slice(wt, 1, r), 0L, (a, x) -> a + x)"))
      val cands = base
        .select(col("vec_id").as("nid"), col("label").as("nlabel"), col("embedding").as("nv"))
        .withColumn("nn", dot(col("nv"), col("nv")))
      val w = Window.partitionBy("probe_id").orderBy(col("score").desc, col("nid"))
      cands.crossJoin(broadcast(probes))
        .filter(col("nid") =!= col("probe_id"))
        .withColumn("score", dot(col("pv"), col("nv")) / sqrt(col("pn") * col("nn")))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .withColumn("wt", wArr)
        .groupBy(col("probe_id"), col("plabel").as("label"))
        .agg(
          sum(when(col("nlabel") === col("plabel"), 1L).otherwise(0L)).as("n_rel_top10"),
          coalesce(sum(when(col("nlabel") === col("plabel"),
            element_at(col("wt"), col("rn").cast("int")))), lit(0L)).cast("long")
            .as("dcg_x1e6"))
        .join(broadcast(labelCounts.select(col("lbl"), col("idcg_x1e6"))),
          col("label") === col("lbl"))
        .select(col("probe_id"), col("label"), col("n_rel_top10"), col("dcg_x1e6"),
          col("idcg_x1e6"),
          expr("CAST(dcg_x1e6 * 1000000L div idcg_x1e6 AS BIGINT)").as("ndcg_x1e6"))
        .orderBy("probe_id")
    },
  )
}
