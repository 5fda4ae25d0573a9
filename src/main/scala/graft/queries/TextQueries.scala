package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (north star,
  * BASELINE.json): tokenization + term frequencies, quality scoring,
  * language-ID heuristic, and document fingerprinting — all over the
  * `documents` table (FIXTURES.md §A).
  *
  * Determinism: outputs are strings and BIGINTs; ratios are integer-scaled
  * (x1e4) with floor division, identical in Spark (`div`) and DuckDB (`//`).
  *
  * Scale notes: every query is one scan of documents plus at most one
  * aggregation shuffle. Tokenization/fingerprinting are row-local
  * higher-order-function expressions (no UDF, no collect); term frequency
  * is explode → partial-agg → final-agg, the canonical word-count shape
  * whose shuffle carries pre-combined (word, count) state.
  */
object TextQueries extends QueryPack {

  /** words of a document (single-space separated by construction). */
  private val W = "string_split(text, ' ')" // DuckDB spelling; Spark uses split()

  override def queries: Seq[Q] = Seq(

    // token frequencies over the whole corpus.
    Q(
      "q_text_tokens",
      s"""SELECT word, COUNT(*) AS cnt, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM (SELECT doc_id, unnest($W) AS word FROM documents)
         |GROUP BY word ORDER BY word""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("word")
    },

    // per-document quality signals: token counts, uniqueness and stopword
    // ratios (x1e4, floor div), average token length (x1e4).
    Q(
      "q_text_quality",
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len($W) AS BIGINT) AS n_words,
         |  CAST(len(list_distinct($W)) AS BIGINT) AS n_unique,
         |  CAST((len(list_distinct($W)) * 10000) // len($W) AS BIGINT) AS uniq_ratio_x1e4,
         |  CAST((len(list_filter($W, x -> x IN ('the','a','row','data','value'))) * 10000) // len($W) AS BIGINT) AS stop_ratio_x1e4,
         |  CAST((CAST(list_sum(list_transform($W, x -> length(x))) AS BIGINT) * 10000) // len($W) AS BIGINT) AS avg_wlen_x1e4
         |FROM documents ORDER BY doc_id""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(col("w")).cast("long").as("n_words"),
          size(array_distinct(col("w"))).cast("long").as("n_unique"),
          expr("CAST((size(array_distinct(w)) * 10000L) div size(w) AS BIGINT)").as("uniq_ratio_x1e4"),
          expr("CAST((size(filter(w, x -> x IN ('the','a','row','data','value'))) * 10000L) div size(w) AS BIGINT)").as("stop_ratio_x1e4"),
          expr("CAST((aggregate(transform(w, x -> length(x)), 0L, (a, b) -> a + b) * 10000L) div size(w) AS BIGINT)").as("avg_wlen_x1e4"))
        .orderBy("doc_id")
    },

    // marker-word language-ID heuristic vs the labeled lang: confusion
    // counts per (label, prediction). The synthetic corpus shares one
    // vocabulary, so the interesting part is the deterministic operator
    // shape (n-gram/marker scoring), not model accuracy.
    Q(
      "q_text_langid",
      """SELECT lang,
        |  CASE WHEN (' ' || text || ' ') LIKE '% the %' OR (' ' || text || ' ') LIKE '% a %' THEN 'en'
        |       WHEN (' ' || text || ' ') LIKE '% el %' OR (' ' || text || ' ') LIKE '% la %' THEN 'es'
        |       WHEN (' ' || text || ' ') LIKE '% der %' OR (' ' || text || ' ') LIKE '% die %' THEN 'de'
        |       ELSE 'unknown' END AS pred,
        |  COUNT(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY lang, pred""",
    ) { (s, dir) =>
      val padded = concat(lit(" "), col("text"), lit(" "))
      Tables.documents(s, dir)
        .select(col("lang"),
          when(padded.like("% the %") || padded.like("% a %"), "en")
            .when(padded.like("% el %") || padded.like("% la %"), "es")
            .when(padded.like("% der %") || padded.like("% die %"), "de")
            .otherwise("unknown").as("pred"))
        .groupBy("lang", "pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    },

    // BPE-ish token counting: subword segmentation by a deterministic
    // regex (letter runs / digit runs / single other-chars) — the cheap
    // pre-tokenizer pass every BPE pipeline starts from — compared with
    // whitespace word counts. Integer outputs only.
    Q(
      "q_text_bpe_tokens",
      s"""SELECT doc_id,
         |  CAST(len($W) AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_subtokens,
         |  CAST(len(list_filter(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'), t -> length(t) >= 5)) AS BIGINT) AS n_long_tokens
         |FROM documents ORDER BY doc_id""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).cast("long").as("n_subtokens"),
          size(filter(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"),
            t => length(t) >= 5)).cast("long").as("n_long_tokens"))
        .orderBy("doc_id")
    },

    // polynomial rolling-hash fingerprint of the token stream (mod a
    // 32-bit prime so every intermediate stays exact in 64-bit on both
    // engines), plus a prefix fingerprint of the first 5 tokens — the
    // cheap "same document head" signal.
    Q(
      "q_doc_fingerprint",
      s"""SELECT doc_id,
         |  list_reduce([CAST(0 AS BIGINT)] || list_transform($W, x -> length(x) * 131 + ascii(x[1:1])),
         |              (h, c) -> (h * 31 + c) % 1000000007) AS fp,
         |  list_reduce([CAST(0 AS BIGINT)] || list_transform($W[1:5], x -> length(x) * 131 + ascii(x[1:1])),
         |              (h, c) -> (h * 31 + c) % 1000000007) AS fp_head
         |FROM documents ORDER BY doc_id""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          expr("aggregate(transform(w, x -> CAST(length(x) * 131 + ascii(substring(x, 1, 1)) AS BIGINT)), 0L, (h, c) -> (h * 31 + c) % 1000000007)").as("fp"),
          expr("aggregate(transform(slice(w, 1, 5), x -> CAST(length(x) * 131 + ascii(substring(x, 1, 1)) AS BIGINT)), 0L, (h, c) -> (h * 31 + c) % 1000000007)").as("fp_head"))
        .orderBy("doc_id")
    },

    // deterministic corpus shuffle + shard — the training-data "global
    // shuffle": every epoch reads documents in an order uncorrelated with
    // ingest order, pre-materialized as N shard files. Shard AND
    // within-shard order both derive from one seeded md5 of the stable
    // doc key — reproducible across runs and engines, no rand(), and no
    // global sort: the production write is repartition(shard) +
    // sortWithinPartitions(k) (the exact anti-small-files shape the table
    // layer uses), each shard sorting independently. Scale: one keyed
    // shuffle on shard; shard count scales with corpus size (16 here).
    // Registered observable: per-shard sizes plus the shuffle-order
    // first/last docs (min_by/max_by partial aggs — order is pinned
    // without sorting anything).
    Q(
      "q_shuffle_shard",
      """SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  arg_min(doc_id, k) AS first_doc, arg_max(doc_id, k) AS last_doc
        |FROM (SELECT doc_id, n_chars, md5('shuf1:' || CAST(doc_id AS VARCHAR)) AS k,
        |        CAST('0x' || substring(md5('shuf1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 16 AS shard
        |      FROM documents)
        |GROUP BY shard ORDER BY shard""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          md5(concat(lit("shuf1:"), col("doc_id").cast("string"))).as("k"))
        .withColumn("shard", expr("CAST(CONV(substring(k, 1, 15), 16, 10) AS BIGINT) % 16"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"),
          min_by(col("doc_id"), col("k")).as("first_doc"),
          max_by(col("doc_id"), col("k")).as("last_doc"))
        .orderBy("shard")
    },

    // deterministic stratified train/val split — the canonical sampling
    // pattern for a 100 TB corpus: assignment is a pure hash of the
    // stable key (no orderBy+rand, no global shuffle, reproducible across
    // runs and engines), stratified per language. 60-bit md5 hash mod 100
    // < 90 → train. Output: per-stratum split sizes.
    Q(
      "q_sample_split",
      """SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT lang, n_chars,
        |        CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
        |             THEN 'train' ELSE 'val' END AS split
        |      FROM documents)
        |GROUP BY lang, split ORDER BY lang, split""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), col("n_chars"),
          when(expr("CAST(CONV(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100") < 90,
            "train").otherwise("val").as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("lang", "split")
    },

    // Exact-k uniform sample (r10) — "carve a fixed-size eval set":
    // q_sample_split's hash threshold gives a BERNOULLI sample whose size
    // drifts ±√n; an eval set wants EXACTLY k docs, reproducibly. Rank
    // every doc by a salted md5 of its stable id and keep the k smallest
    // — equivalent to a uniform draw without replacement, identical
    // across runs/engines, and (unlike reservoir algorithms with RNG
    // state) order-independent. Plan shape is the scale story: orderBy +
    // limit compiles to TakeOrderedAndProject — each partition keeps a
    // local k-heap and the driver merges P·k candidates; NO global sort,
    // NO shuffle of the corpus, and driver memory is k rows. (For k
    // beyond driver-merge comfort, the same salted key flips to the
    // hash-threshold split plus an exact trim of the boundary bucket.)
    Q(
      "q_sample_reservoir",
      """SELECT doc_id, lang, source, md5('rsv1:' || CAST(doc_id AS VARCHAR)) AS k
        |FROM documents ORDER BY k LIMIT 100""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          md5(concat(lit("rsv1:"), col("doc_id").cast("string"))).as("k"))
        .orderBy("k")
        .limit(100)
    },

    // Domain-reweighted sampling (the Pile/Dolma-style mixing pass):
    // each source gets a target inclusion rate (tiered 10/35/60/85% here,
    // derived from the source id) and every doc keeps or drops by the
    // SAME md5-hash rule as q_sample_split — deterministic and
    // replayable, so a training mix is reproducible doc-for-doc and a
    // re-run (or a resumed pipeline) makes identical choices. Row-local
    // decision, one partial-agg'd rollup; no rand(), no global sort.
    Q(
      "q_sample_weighted",
      """SELECT source, rate_pct, CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CAST(SUM(keep) AS BIGINT) AS n_kept,
        |  CAST((SUM(keep) * 10000) // COUNT(*) AS BIGINT) AS kept_x1e4
        |FROM (SELECT source,
        |        10 + (CAST(substring(source, 4) AS INT) % 4) * 25 AS rate_pct,
        |        CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
        |             < 10 + (CAST(substring(source, 4) AS INT) % 4) * 25
        |             THEN 1 ELSE 0 END AS keep
        |      FROM documents)
        |GROUP BY source, rate_pct ORDER BY source""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"),
          (lit(10) + (expr("CAST(substring(source, 4, 10) AS INT)") % 4) * 25).as("rate_pct"),
          when(expr("CAST(CONV(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100")
            < lit(10) + (expr("CAST(substring(source, 4, 10) AS INT)") % 4) * 25, 1L)
            .otherwise(0L).as("keep"))
        .groupBy("source", "rate_pct")
        .agg(count(lit(1)).as("n_total"), sum(col("keep")).cast("long").as("n_kept"),
          expr("CAST(sum(keep) * 10000L div count(1) AS BIGINT)").as("kept_x1e4"))
        .orderBy("source")
    },

    // intra-document repetition score (the Gopher/C4 quality-filter
    // family): fraction of the doc's bigrams taken by its single most
    // frequent bigram, x1e4 floor-div. Highly repetitive docs (boilerplate,
    // generation loops) score high and get filtered upstream of training.
    // Shape: explode bigrams → per-(doc, gram) count → per-doc max/sum —
    // two keyed shuffles, both partial-aggregated, ∝ corpus tokens.
    Q(
      "q_text_repetition",
      s"""WITH d AS (SELECT doc_id, $W AS w FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(range(0, len(w) - 1),
         |        i -> w[i+1] || ' ' || w[i+2])) AS gm
         |      FROM d),
         |c AS (SELECT doc_id, gm, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY doc_id, gm)
         |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
         |  CAST(MAX(n) AS BIGINT) AS top_bigram_n,
         |  CAST((MAX(n) * 10000) // SUM(n) AS BIGINT) AS rep_ratio_x1e4
         |FROM c GROUP BY doc_id ORDER BY doc_id""",
    ) { (s, dir) =>
      val bigrams =
        """CASE WHEN size(w) >= 2
          |  THEN transform(sequence(0, size(w) - 2),
          |    i -> concat_ws(' ', element_at(w, i + 1), element_at(w, i + 2)))
          |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin
      Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode_outer(expr(bigrams)).as("gm"))
        .filter(col("gm").isNotNull)
        .groupBy("doc_id", "gm")
        .agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_bigrams"),
          max(col("n")).as("top_bigram_n"),
          expr("CAST((MAX(n) * 10000L) div SUM(n) AS BIGINT)").as("rep_ratio_x1e4"))
        .orderBy("doc_id")
    },

    // benchmark decontamination — the standard pre-training hygiene pass:
    // flag corpus documents sharing any 8-gram with a benchmark set
    // (here: docs 0-4 stand in for the eval suite). The benchmark side is
    // SMALL by nature (eval suites are thousands of docs), so its
    // distinct gram set broadcasts and the corpus is checked in ONE
    // embarrassingly-parallel pass + one per-doc agg — never a shuffle of
    // corpus grams against corpus grams. Emits every corpus doc with its
    // hit count, so clean corpora still produce the full manifest.
    Q(
      "q_decontaminate",
      s"""WITH d AS (SELECT doc_id, $W AS w FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(0, len(w) - 7),
         |        i -> array_to_string(w[i+1:i+8], ' ')))) AS gm
         |      FROM d),
         |bench AS (SELECT DISTINCT gm FROM g WHERE doc_id < 5),
         |hits AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |         FROM g JOIN bench USING (gm) WHERE g.doc_id >= 5 GROUP BY g.doc_id)
         |SELECT d.doc_id, COALESCE(hits.n, 0) AS n_gram_hits, COALESCE(hits.n, 0) > 0 AS contaminated
         |FROM d LEFT JOIN hits ON d.doc_id = hits.doc_id
         |WHERE d.doc_id >= 5 ORDER BY d.doc_id""",
    ) { (s, dir) =>
      val octgrams =
        """CASE WHEN size(w) >= 8
          |  THEN array_distinct(transform(sequence(0, size(w) - 8),
          |    i -> concat_ws(' ', slice(w, i + 1, 8))))
          |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin
      val grams = Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode_outer(expr(octgrams)).as("gm"))
        .filter(col("gm").isNotNull)
      val bench = grams.filter(col("doc_id") < 5).select("gm").distinct()
      val hits = grams.filter(col("doc_id") >= 5)
        .join(broadcast(bench), "gm")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"))
      Tables.documents(s, dir).filter(col("doc_id") >= 5).select("doc_id")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("n_gram_hits"),
          (coalesce(col("n"), lit(0L)) > 0).as("contaminated"))
        .orderBy("doc_id")
    },

    // the operators COMPOSED as a real curation pipeline — what a user of
    // this engine actually runs end-to-end over a raw corpus: quality
    // gate (≥10 words, ≥50% unique tokens) → exact-dedup keeper (first
    // doc_id per content hash) → deterministic hash split → per-stratum
    // corpus manifest. Plan: scan → row-local quality projection/filter →
    // ONE keyed shuffle for the keeper window (partitioned by content
    // hash) → ONE agg shuffle. Nothing global, nothing collected — the
    // whole pipeline holds its shape at 100 TB.
    Q(
      "q_pipeline_curate",
      s"""WITH q AS (
         |  SELECT doc_id, lang, text,
         |         CAST(len($W) AS BIGINT) AS n_tok,
         |         CAST(len(list_distinct($W)) AS BIGINT) AS n_unique
         |  FROM documents),
         |f AS (SELECT * FROM q WHERE n_tok >= 10 AND n_unique * 2 >= n_tok),
         |k AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk FROM f),
         |s AS (SELECT lang, n_tok,
         |        CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
         |             THEN 'train' ELSE 'val' END AS split
         |      FROM k WHERE rk = 1)
         |SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
         |FROM s GROUP BY lang, split ORDER BY lang, split""",
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val quality = Tables.documents(s, dir)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), col("lang"), col("text"),
          size(col("w")).cast("long").as("n_tok"),
          size(array_distinct(col("w"))).cast("long").as("n_unique"))
        .filter(col("n_tok") >= 10 && col("n_unique") * 2 >= col("n_tok"))
      val keeper = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
      quality
        .withColumn("rk", row_number().over(keeper))
        .filter(col("rk") === 1)
        .select(col("lang"), col("n_tok"),
          when(expr("CAST(CONV(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 100") < 90,
            "train").otherwise("val").as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
        .orderBy("lang", "split")
    },

    // fixed-size token chunking with overlap — the stride-window pass that
    // turns documents into training sequences (chunk 32 tokens, stride 24
    // → 8-token overlap between neighbors). Entirely row-local: each doc
    // expands to ceil(n_tok/24) chunk rows via one HOF projection + one
    // Generate, no shuffle until the output sort; chunk content is pinned
    // by the same rolling-hash fingerprint q_doc_fingerprint uses, so the
    // oracle verifies byte-exact chunk boundaries, not just counts.
    Q(
      "q_chunk_docs",
      s"""WITH d AS (SELECT doc_id, $W AS w FROM documents),
         |c AS (SELECT doc_id, w, unnest(range(0, (len(w) - 1) // 24 + 1)) AS ci FROM d)
         |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx, CAST(ci * 24 AS BIGINT) AS start_tok,
         |  CAST(len(w[ci*24+1 : ci*24+32]) AS BIGINT) AS n_tok,
         |  list_reduce([CAST(0 AS BIGINT)] || list_transform(w[ci*24+1 : ci*24+32], x -> length(x) * 131 + ascii(x[1:1])),
         |              (h, t) -> (h * 31 + t) % 1000000007) AS chunk_fp
         |FROM c ORDER BY doc_id, chunk_idx""",
    ) { (s, dir) =>
      // explode_outer for the usual reason (the array is never empty — w
      // has ≥1 element — and plain explode pushes a size-guard below the
      // spread that re-evaluates the chunk construction in the scan task)
      val chunks = expr(
        """transform(sequence(0, CAST((size(w) - 1) div 24 AS INT)),
          |  ci -> named_struct(
          |    'chunk_idx', CAST(ci AS BIGINT),
          |    'start_tok', CAST(ci * 24 AS BIGINT),
          |    'n_tok', CAST(size(slice(w, ci * 24 + 1, 32)) AS BIGINT),
          |    'chunk_fp', aggregate(transform(slice(w, ci * 24 + 1, 32),
          |        x -> CAST(length(x) * 131 + ascii(substring(x, 1, 1)) AS BIGINT)),
          |      0L, (h, t) -> (h * 31 + t) % 1000000007)))""".stripMargin)
      Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode_outer(chunks).as("ck"))
        .select(col("doc_id"), col("ck.chunk_idx").as("chunk_idx"),
          col("ck.start_tok").as("start_tok"), col("ck.n_tok").as("n_tok"),
          col("ck.chunk_fp").as("chunk_fp"))
        .orderBy("doc_id", "chunk_idx")
    },

    // TF-IDF-style term salience: top-3 terms per document by tf/df ratio
    // (integer-scaled floor div — a log-free idf surrogate that ranks
    // identically for fixed tf, and stays bit-exact across engines where
    // ln() would not). Join-free plan: df is a count window over the
    // (doc, word) tf relation partitioned by word — one shuffle for tf,
    // one for df, one for the per-doc top-k window; every shuffle keyed,
    // every aggregation partial. The per-word window carries vocab-sized
    // partitions (bounded by corpus doc count), never the corpus itself.
    Q(
      "q_tfidf",
      s"""WITH tf AS (
         |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest($W) AS word FROM documents)
         |  GROUP BY doc_id, word),
         |d AS (SELECT doc_id, word, tf,
         |        CAST(COUNT(*) OVER (PARTITION BY word) AS BIGINT) AS df
         |      FROM tf),
         |r AS (SELECT doc_id, word, tf, df,
         |        CAST((tf * 1000000) // df AS BIGINT) AS salience_x1e6,
         |        ROW_NUMBER() OVER (PARTITION BY doc_id
         |          ORDER BY (tf * 1000000) // df DESC, word) AS rk
         |      FROM d)
         |SELECT doc_id, word, tf, df, salience_x1e6
         |FROM r WHERE rk <= 3 ORDER BY doc_id, salience_x1e6 DESC, word""",
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val byWord = Window.partitionBy("word")
      val topPerDoc = Window.partitionBy("doc_id")
        .orderBy(col("salience_x1e6").desc, col("word"))
      tf.withColumn("df", count(lit(1)).over(byWord).cast("long"))
        .withColumn("salience_x1e6", expr("CAST((tf * 1000000L) div df AS BIGINT)"))
        .withColumn("rk", row_number().over(topPerDoc))
        .filter(col("rk") <= 3)
        .select("doc_id", "word", "tf", "df", "salience_x1e6")
        .orderBy(col("doc_id"), col("salience_x1e6").desc, col("word"))
    },

    // deny-list scrubbing — the PII-redaction shape (emails/IDs/secrets in
    // production; a token deny-list here, since the synthetic corpus has
    // no PII): every match is replaced and counted, and the scrubbed text
    // is pinned by md5 so the oracle verifies the REPLACEMENT bytes, not
    // just the counts. Row-local regex projection, no shuffle before the
    // output sort. Pattern uses \b word boundaries + alternation — the
    // subset of regex semantics Java and RE2 share exactly.
    Q(
      "q_text_scrub",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(key|hash|user)\b')) AS BIGINT) AS n_redacted,
        |  md5(regexp_replace(text, '\b(key|hash|user)\b', '[REDACTED]', 'g')) AS scrubbed_md5,
        |  CAST(length(regexp_replace(text, '\b(key|hash|user)\b', '[REDACTED]', 'g')) AS BIGINT) AS scrubbed_len
        |FROM documents ORDER BY doc_id""",
    ) { (s, dir) =>
      // patterns passed through the Scala API, NOT an expr() SQL literal:
      // Spark SQL string literals eat backslash escapes ('\b' → backspace)
      // while DuckDB's single quotes keep them raw — the API route keeps
      // one spelling of the pattern valid in both engines.
      val pat = "\\b(key|hash|user)\\b"
      val scrubbed = regexp_replace(col("text"), pat, "[REDACTED]")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_count(col("text"), lit(pat)).cast("long").as("n_redacted"),
          md5(scrubbed).as("scrubbed_md5"),
          length(scrubbed).cast("long").as("scrubbed_len"))
        .orderBy("doc_id")
    },

    // greedy sequence packing into 2048-token context windows: docs are
    // packed in doc_id order WITHIN each language stratum (the window is
    // partitioned — a global unpartitioned cumsum would serialize the
    // whole corpus through one task at scale); a doc joins the bin its
    // cumulative start offset falls in. Output: per-bin occupancy — the
    // batch manifest a training dataloader consumes.
    Q(
      "q_pack_sequences",
      """SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM (
        |  SELECT lang, doc_id, n_tok,
        |    CAST((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) // 2048 AS BIGINT) AS bin
        |  FROM (SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents))
        |GROUP BY lang, bin ORDER BY lang, bin""",
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        // `div`, not `/`: Spark's / on longs is DOUBLE division
        .withColumn("bin", expr("CAST((cum - n_tok) div 2048 AS BIGINT)"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "bin")
    },

    // Corpus collocation mining (the PMI family): adjacent-token bigrams
    // ranked by integer lift = nab·N / (na·nb), where na/nb are the
    // bigram relation's own marginals — the standard PMI estimate over a
    // bigram table. Join-free like q_tfidf: marginals attach via
    // token-partitioned count windows (hot-token partitions are bounded
    // by that token's distinct pairings, not corpus size); the corpus
    // total N attaches via a one-row broadcast, not a global window
    // (which would funnel the bigram relation through one task). Top-20
    // by (lift, a, b) total order → TakeOrderedAndProject.
    Q(
      "q_cooccur",
      s"""WITH d AS (SELECT doc_id, $W AS w FROM documents),
         |i AS (SELECT doc_id, w, unnest(range(0, len(w) - 1)) AS i FROM d),
         |g AS (SELECT w[i+1] AS a, w[i+2] AS b FROM i),
         |c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nab FROM g GROUP BY a, b),
         |m AS (SELECT a, b, nab,
         |        SUM(nab) OVER (PARTITION BY a) AS na,
         |        SUM(nab) OVER (PARTITION BY b) AS nb
         |      FROM c),
         |t AS (SELECT CAST(SUM(nab) AS BIGINT) AS total FROM c)
         |SELECT a, b, nab, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
         |  CAST(nab * total * 10000 // (na * nb) AS BIGINT) AS lift_x1e4
         |FROM m, t WHERE nab >= 5
         |ORDER BY lift_x1e4 DESC, a, b LIMIT 20""",
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val bigrams = Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(posexplode(expr(
          "transform(slice(w, 1, greatest(size(w) - 1, 0)), (x, i) -> struct(x AS a, w[i + 1] AS b))"))
          .as(Seq("_i", "g")))
        .select(col("g.a").as("a"), col("g.b").as("b"))
      val c = bigrams.groupBy("a", "b").agg(count(lit(1)).as("nab"))
      val total = c.agg(sum(col("nab")).cast("long").as("total"))
      c.withColumn("na", sum(col("nab")).over(Window.partitionBy("a")))
        .withColumn("nb", sum(col("nab")).over(Window.partitionBy("b")))
        .filter(col("nab") >= 5)
        .crossJoin(broadcast(total))
        .select(col("a"), col("b"), col("nab"),
          col("na").cast("long").as("na"), col("nb").cast("long").as("nb"),
          expr("CAST(nab * total * 10000L div (na * nb) AS BIGINT)").as("lift_x1e4"))
        .orderBy(col("lift_x1e4").desc, col("a"), col("b"))
        .limit(20)
    },

    // Trigram language-model table (the n-gram LM construction pass):
    // conditional next-token probability p(c|ab) = nabc/nab with the
    // prefix marginal nab taken over the trigram relation itself —
    // completing the n-gram family (unigram tf → bigram collocations →
    // trigram conditionals). Same join-free doctrine as q_cooccur: the
    // marginal attaches via an (a, b)-partitioned window (bounded by
    // that prefix's distinct continuations), counts are two-phase hash
    // aggregates, top-20 by total order → TakeOrderedAndProject.
    Q(
      "q_ngram_lm",
      s"""WITH d AS (SELECT doc_id, $W AS w FROM documents),
         |i AS (SELECT w, unnest(range(0, len(w) - 2)) AS i FROM d),
         |g AS (SELECT w[i+1] AS a, w[i+2] AS b, w[i+3] AS c FROM i),
         |t AS (SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS nabc FROM g GROUP BY a, b, c),
         |m AS (SELECT a, b, c, nabc, SUM(nabc) OVER (PARTITION BY a, b) AS nab FROM t)
         |SELECT a, b, c, nabc, CAST(nab AS BIGINT) AS nab,
         |  CAST(nabc * 10000 // nab AS BIGINT) AS p_x1e4
         |FROM m WHERE nabc >= 5
         |ORDER BY nabc DESC, a, b, c LIMIT 20""",
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(explode(expr(
          "transform(slice(w, 1, greatest(size(w) - 2, 0)), (x, i) -> struct(x AS a, w[i + 1] AS b, w[i + 2] AS c))"))
          .as("g"))
        .select(col("g.a").as("a"), col("g.b").as("b"), col("g.c").as("c"))
        .groupBy("a", "b", "c").agg(count(lit(1)).as("nabc"))
        .withColumn("nab", sum(col("nabc")).over(Window.partitionBy("a", "b")))
        .filter(col("nabc") >= 5)
        .select(col("a"), col("b"), col("c"), col("nabc"),
          col("nab").cast("long").as("nab"),
          expr("CAST(nabc * 10000L div nab AS BIGINT)").as("p_x1e4"))
        .orderBy(col("nabc").desc, col("a"), col("b"), col("c"))
        .limit(20)
    },

    // Corpus-LM plausibility scoring (the KenLM-style quality filter,
    // closing the n-gram family): each doc scored by the occurrence-
    // weighted mean conditional probability of its trigrams under the
    // corpus's own trigram LM — generation loops and boilerplate score
    // high, character noise scores near zero. Join-free like q_tfidf:
    // the LM attaches to the per-(doc, trigram) tf relation via two count
    // windows whose partitions are bounded by a trigram's DISTINCT
    // (doc, continuation) spread, not its raw occurrence count; the
    // per-doc rollup is a two-phase hash agg. All integer: p_x1e6 per
    // trigram, weighted-mean div per doc (nabc·1e6 stays in BIGINT for
    // any corpus under ~9e12 trigram occurrences).
    Q(
      "q_lm_score",
      s"""WITH d AS (SELECT doc_id, $W AS w FROM documents),
         |i AS (SELECT doc_id, w, unnest(range(0, len(w) - 2)) AS i FROM d),
         |g AS (SELECT doc_id, w[i+1] AS a, w[i+2] AS b, w[i+3] AS c FROM i),
         |t AS (SELECT doc_id, a, b, c, CAST(COUNT(*) AS BIGINT) AS nd
         |      FROM g GROUP BY doc_id, a, b, c),
         |m AS (SELECT doc_id, nd,
         |        SUM(nd) OVER (PARTITION BY a, b, c) AS nabc,
         |        SUM(nd) OVER (PARTITION BY a, b) AS nab
         |      FROM t)
         |SELECT doc_id, CAST(SUM(nd) AS BIGINT) AS n_tri,
         |  CAST(SUM(nd * ((nabc * 1000000) // nab)) // SUM(nd) AS BIGINT) AS score_x1e6
         |FROM m GROUP BY doc_id ORDER BY doc_id""",
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          "transform(slice(w, 1, greatest(size(w) - 2, 0)), (x, i) -> struct(x AS a, w[i + 1] AS b, w[i + 2] AS c))"))
          .as("g"))
        .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"), col("g.c").as("c"))
        .groupBy("doc_id", "a", "b", "c").agg(count(lit(1)).as("nd"))
      tf.withColumn("nabc", sum(col("nd")).over(Window.partitionBy("a", "b", "c")))
        .withColumn("nab", sum(col("nd")).over(Window.partitionBy("a", "b")))
        .withColumn("p6", expr("CAST(nabc * 1000000L div nab AS BIGINT)"))
        .groupBy("doc_id")
        .agg(sum(col("nd")).cast("long").as("n_tri"),
          expr("CAST(sum(nd * p6) div sum(nd) AS BIGINT)").as("score_x1e6"))
        .orderBy("doc_id")
    },

    // Inverted-index build (the retrieval/decontamination index shape):
    // per term, document frequency, total occurrences, and a COMMUTATIVE
    // postings fingerprint — sum of per-doc hashes mod p — that pins the
    // exact posting SET without materializing it. Deliberate scale shape:
    // collect_list postings for a stop word is the classic hot-key OOM;
    // a commutative fingerprint keeps both shuffles fully partial-
    // aggregated (map-side combine), so a term seen in every document
    // costs the same as a rare one. All arithmetic stays in BIGINT range:
    // doc_id < 2^40 would still bound hash < p·2^40 < 2^63 after the
    // per-row mod.
    Q(
      "q_inverted_index",
      s"""WITH d AS (SELECT doc_id, unnest($W) AS word FROM documents),
         |t AS (SELECT word, doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |      FROM d GROUP BY word, doc_id)
         |SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
         |  CAST(SUM(n) AS BIGINT) AS n_occ,
         |  CAST(SUM((doc_id * 2654435761) % 1000000007) % 1000000007 AS BIGINT) AS postings_fp,
         |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
         |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
         |FROM t GROUP BY word ORDER BY word""",
    ) { (s, dir) =>
      Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word", "doc_id").agg(count(lit(1)).as("n"))
        .groupBy("word")
        .agg(count(lit(1)).as("df"),
          sum(col("n")).cast("long").as("n_occ"),
          (sum(expr("(doc_id * 2654435761L) % 1000000007L")) % 1000000007L)
            .cast("long").as("postings_fp"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy("word")
    },

    // EPOCH UP-SAMPLING (the data-recipe repetition step: tail domains
    // repeat for multiple epochs toward a uniform token share, capped —
    // the standard remedy when down-weighting the head alone can't
    // balance the mix). repeats = clamp(1..4, round(budget / tokens))
    // with budget = total/nlangs, computed as the (2n+d) div (2d)
    // rounded INTEGER division on exact token sums, so both engines
    // agree bit-for-bit. The expansion itself is materialized per DOC
    // (explode over sequence(1, repeats)) and re-aggregated per (lang,
    // epoch) — validating the row-level manifest a training run would
    // write. Scale: the lang histogram is a tiny two-phase agg + one-row
    // broadcast; repeats broadcast back; the explode is row-local —
    // zero extra shuffles beyond the output agg.
    Q(
      "q_mix_epochs",
      """WITH d AS (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
        |s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs, CAST(SUM(tok) AS BIGINT) AS tokens
        |      FROM d GROUP BY lang),
        |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS nl FROM s),
        |r AS (SELECT lang, LEAST(4, GREATEST(1,
        |        (2 * (tot // nl) + tokens) // (2 * tokens))) AS repeats FROM s, t),
        |e AS (SELECT d.lang, unnest(generate_series(1, CAST(r.repeats AS INT))) AS epoch, d.tok
        |      FROM d JOIN r ON d.lang = r.lang)
        |SELECT lang, CAST(epoch AS BIGINT) AS epoch, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(SUM(tok) AS BIGINT) AS tokens
        |FROM e GROUP BY lang, epoch ORDER BY lang, epoch""",
    ) { (s, dir) =>
      val d = Tables.spread(Tables.documents(s, dir))
        .select(col("lang"), size(split(col("text"), " ")).cast("long").as("tok"))
      val st = d.groupBy("lang").agg(count(lit(1)).as("docs"), sum("tok").as("tokens"))
      val tot = st.agg(sum("tokens").as("tot"), count(lit(1)).as("nl"))
      val r = st.crossJoin(broadcast(tot))
        .withColumn("repeats", least(lit(4L), greatest(lit(1L),
          expr("(2L * (tot div nl) + tokens) div (2L * tokens)"))))
        .select("lang", "repeats")
      d.join(broadcast(r), "lang")
        .select(col("lang"), col("tok"), explode(expr("sequence(1L, repeats)")).as("epoch"))
        .groupBy("lang", "epoch")
        .agg(count(lit(1)).as("docs"), sum("tok").as("tokens"))
        .select(col("lang"), col("epoch").cast("long").as("epoch"), col("docs"), col("tokens"))
        .orderBy("lang", "epoch")
    },

    // multilingual TEMPERATURE RE-BALANCING (the standard pretraining
    // language-mixing step, α = 0.5 a.k.a. T = 2: sample quota ∝ √count,
    // so head languages are down-weighted and tail languages kept whole-
    // ish). Quotas use exact integer math — isqrt is floor(sqrt(double))
    // plus a one-step integer correction, so both engines agree even if
    // their libm rounding differs — and the per-language sample is the
    // quota-many docs with the smallest md5(doc_id) rank: a deterministic
    // pseudo-random draw both engines replay bit-identically. Scale: the
    // language histogram is a tiny two-phase aggregate, quotas broadcast;
    // the rank is a per-language window — at 100 TB a head language is a
    // skewed sort partition, where the production form replaces exact
    // rank with a two-pass hash-threshold refinement (sample the hash
    // quantile, filter, correct the boundary); the registered form keeps
    // exact rank for oracle determinism.
    Q(
      "q_mix_temperature",
      """WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
        |sq AS (SELECT lang, cnt, CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS s0 FROM c),
        |w AS (SELECT lang, cnt,
        |        CASE WHEN (s0 + 1) * (s0 + 1) <= cnt THEN s0 + 1
        |             WHEN s0 * s0 > cnt THEN s0 - 1 ELSE s0 END AS wt FROM sq),
        |t AS (SELECT SUM(wt) AS wsum, SUM(cnt) AS n FROM w),
        |q AS (SELECT lang, ((n // 2) * wt) // wsum AS quota FROM w, t),
        |r AS (SELECT d.lang, d.doc_id, quota,
        |        ROW_NUMBER() OVER (PARTITION BY d.lang
        |          ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
        |      FROM documents d JOIN q ON d.lang = q.lang)
        |SELECT lang, doc_id FROM r WHERE rn <= quota ORDER BY lang, doc_id""",
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val wts = counts
        .withColumn("s0", floor(sqrt(col("cnt").cast("double"))).cast("long"))
        .withColumn("wt",
          when((col("s0") + 1) * (col("s0") + 1) <= col("cnt"), col("s0") + 1)
            .when(col("s0") * col("s0") > col("cnt"), col("s0") - 1)
            .otherwise(col("s0")))
      // one-row global totals: legitimate keyless aggregate, broadcast
      val tot = wts.agg(sum("wt").as("wsum"), sum("cnt").as("n"))
      val quotas = wts.crossJoin(broadcast(tot))
        .select(col("lang"), expr("((n div 2) * wt) div wsum").as("quota"))
      docs.join(broadcast(quotas), Seq("lang"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .filter(col("rn") <= col("quota"))
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")
    },

    // linear QUALITY CLASSIFIER (fasttext-style scoring distilled to
    // fixed integer weights over the q_text_quality features): score =
    // 3·uniq_ratio + 2·stop_ratio − |avg_wlen − 4.5| (all x1e4), keep at
    // score ≥ 1.5 — reported as per-source keep-rate telemetry, the
    // decision record a curation pipeline ships alongside the filtered
    // corpus. All-integer arithmetic (floor div), so the classifier and
    // its oracle agree exactly. Scale: row-local feature extraction in
    // one codegen'd projection, then a two-phase aggregate keyed by
    // source — one shuffle of pre-combined per-source rows.
    Q(
      "q_quality_linear",
      s"""WITH f AS (SELECT doc_id, source,
         |  CAST(3 * ((len(list_distinct($W)) * 10000) // len($W))
         |     + 2 * ((len(list_filter($W, x -> x IN ('the','a','row','data','value'))) * 10000) // len($W))
         |     - abs((CAST(list_sum(list_transform($W, x -> length(x))) AS BIGINT) * 10000) // len($W) - 45000) AS BIGINT) AS score_x1e4
         | FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN score_x1e4 >= 15000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST((SUM(CASE WHEN score_x1e4 >= 15000 THEN 1 ELSE 0 END) * 10000) // COUNT(*) AS BIGINT) AS keep_rate_x1e4,
         |  CAST(SUM(score_x1e4) AS BIGINT) AS sum_score_x1e4
         |FROM f GROUP BY source ORDER BY source""",
    ) { (s, dir) =>
      Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(col("source"),
          expr("""CAST(3 * ((size(array_distinct(w)) * 10000L) div size(w))
                 |   + 2 * ((size(filter(w, x -> x IN ('the','a','row','data','value'))) * 10000L) div size(w))
                 |   - abs((aggregate(transform(w, x -> length(x)), 0L, (a, b) -> a + b) * 10000L) div size(w) - 45000L) AS BIGINT)""".stripMargin)
            .as("score_x1e4"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score_x1e4") >= 15000L, 1L).otherwise(0L)).as("n_kept"),
          sum("score_x1e4").cast("long").as("sum_score_x1e4"))
        .select(col("source"), col("n_docs"), col("n_kept"),
          expr("CAST((n_kept * 10000L) div n_docs AS BIGINT)").as("keep_rate_x1e4"),
          col("sum_score_x1e4"))
        .orderBy("source")
    },

    // Largest-remainder token-budget apportionment (r8) — the exact
    // integer answer to "split a B-token training budget across domains
    // proportional to capped weights" (Hamilton's method: floor shares
    // first, then the K leftover tokens to the K largest remainders).
    // Head domains are capped at the mean (wt = min(tokens, tot div ns))
    // so no single source can swallow the mixture — the budget-planning
    // complement of q_mix_temperature (which SAMPLES per-language docs
    // by √count) and q_mix_epochs (which REPEATS tail languages). By
    // construction Σalloc = B exactly — the invariant float-weighted
    // mixtures never give you. Scale: ONE corpus pass partial-aggs to
    // per-source token counts; everything after is domain-cardinality-
    // sized, and the remainder rank comes from a keys=[] collect +
    // sort_array + posexplode (aggregate-sized, no global window).
    Q(
      "q_mix_domain_balance",
      """WITH d AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
        |s AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS tokens FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS ns FROM s),
        |w AS (SELECT source, tokens, LEAST(tokens, tot // ns) AS wt, tot // 2 AS b FROM s, t),
        |tw AS (SELECT CAST(SUM(wt) AS BIGINT) AS wsum FROM w),
        |base AS (SELECT source, tokens, wt, b, (b * wt) // wsum AS alloc0, (b * wt) % wsum AS rem
        |  FROM w, tw),
        |k AS (SELECT CAST(MAX(b) - SUM(alloc0) AS BIGINT) AS leftover FROM base),
        |r AS (SELECT source, tokens, wt, alloc0,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk FROM base)
        |SELECT source, tokens, CAST(wt AS BIGINT) AS weight,
        |  CAST(alloc0 + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r, k ORDER BY source""",
    ) { (s, dir) =>
      val d = Tables.spread(Tables.documents(s, dir))
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("tok"))
      val perSrc = d.groupBy("source").agg(sum("tok").as("tokens"))
      val tot = perSrc.agg(sum("tokens").as("tot"), count(lit(1)).as("ns"))
      val w = perSrc.crossJoin(broadcast(tot))
        .withColumn("wt", least(col("tokens"), expr("tot div ns")))
        .withColumn("b", expr("tot div 2"))
      val tw = w.agg(sum("wt").as("wsum"))
      val base = w.crossJoin(broadcast(tw))
        .withColumn("alloc0", expr("(b * wt) div wsum"))
        .withColumn("rem", expr("(b * wt) % wsum"))
      val k = base.agg((max("b") - sum("alloc0")).as("leftover"))
      // remainder rank without a global window: keys=[] collect of the
      // domain-sized relation, sort by (−rem, source), posexplode
      base.agg(sort_array(collect_list(struct(
            (-col("rem")).as("nr"), col("source"), col("tokens"),
            col("wt"), col("alloc0")))).as("arr"))
        .select(posexplode(col("arr")).as(Seq("pos", "r")))
        .crossJoin(broadcast(k))
        .select(col("r.source").as("source"),
          col("r.tokens").cast("long").as("tokens"),
          col("r.wt").cast("long").as("weight"),
          (col("r.alloc0") + when(col("pos") + 1 <= col("leftover"), 1L).otherwise(0L))
            .cast("long").as("alloc"))
        .orderBy("source")
    },

    // Exact stratified sampling (r8) — draw a FIXED-size eval/holdout set
    // (K = 100 docs) allocated across language strata by Hamilton
    // apportionment (Σ per-stratum quota = K exactly), with the rows
    // inside each stratum chosen by deterministic md5 rank — the same
    // replayable-hash discipline as q_sample_split, but with EXACT
    // per-stratum counts instead of Bernoulli rates (an eval set sized
    // "about 100" is not an eval set). Scale shape: the per-stratum
    // top-quota never global-sorts and never single-partitions a
    // stratum — phase 1 takes each (stratum, hash-bucket)'s local
    // top-quota (any global top-quota row is within its own bucket's
    // top-quota), phase 2 ranks only the candidate union, bounded by
    // #buckets × quota — aggregate-sized, corpus-independent. Parallelism
    // = #strata × #buckets, so one giant stratum can't serialize.
    Q(
      "q_sample_stratified",
      """WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM n),
        |b AS (SELECT lang, n, (100 * n) // tot AS q0, (100 * n) % tot AS rem FROM n, t),
        |k AS (SELECT 100 - SUM(q0) AS leftover FROM b),
        |r AS (SELECT lang, n, q0, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk FROM b),
        |qt AS (SELECT lang, n, q0 + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS quota FROM r, k),
        |rk2 AS (SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents),
        |sel AS (SELECT rk2.lang, doc_id FROM rk2 JOIN qt USING (lang) WHERE rn <= quota)
        |SELECT qt.lang, CAST(qt.n AS BIGINT) AS n_total, CAST(qt.quota AS BIGINT) AS quota,
        |  CAST(COUNT(sel.doc_id) AS BIGINT) AS n_sampled,
        |  CAST(COALESCE(SUM(sel.doc_id), 0) AS BIGINT) AS sum_ids
        |FROM qt LEFT JOIN sel ON qt.lang = sel.lang
        |GROUP BY 1, 2, 3 ORDER BY 1""",
    ) { (s, dir) =>
      val K = 100
      val B = 8 // hash buckets per stratum; scale with cluster width
      val docs = Tables.spread(Tables.documents(s, dir))
        .select(col("lang"), col("doc_id"),
          md5(col("doc_id").cast("string")).as("h"))
      val n = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val base = n.crossJoin(broadcast(n.agg(sum("n").as("tot"))))
        .withColumn("q0", expr(s"($K * n) div tot"))
        .withColumn("rem", expr(s"($K * n) % tot"))
      val leftover = base.agg((lit(K) - sum("q0")).as("leftover"))
      // Hamilton remainder rank on the strata-sized relation (no global
      // window): keys=[] collect + sort_array + posexplode, as
      // q_mix_domain_balance
      val quotaPlan = base
        .agg(sort_array(collect_list(struct(
          (-col("rem")).as("nr"), col("lang"), col("n"), col("q0")))).as("arr"))
        .select(posexplode(col("arr")).as(Seq("pos", "r")))
        .crossJoin(broadcast(leftover))
        .select(col("r.lang").as("lang"), col("r.n").as("n_total"),
          (col("r.q0") + when(col("pos") < col("leftover"), 1L).otherwise(0L))
            .as("quota"))
      // quota is STRATA-sized (one row per language): materialize it ONCE
      // on the driver and re-broadcast as a literal — referencing the
      // plan twice would re-run its corpus aggregation lineage at each
      // use (the same metadata-scale collect precedent as t_ann_index's
      // probe list ids; never row-scale)
      import s.implicits._
      val quota = quotaPlan.as[(String, Long, Long)].collect().toSeq
        .toDF("lang", "n_total", "quota")
      // phase 1: (stratum, bucket)-local top-quota — superset of the
      // global per-stratum top-quota, |candidates| ≤ B × quota
      val bucketed = docs
        .withColumn("b", pmod(hash(col("doc_id")), lit(B)))
        .join(broadcast(quota.select("lang", "quota")), Seq("lang"))
      val wLoc = Window.partitionBy("lang", "b").orderBy(col("h"), col("doc_id"))
      val cand = bucketed.withColumn("rn", row_number().over(wLoc))
        .filter(col("rn") <= col("quota"))
      // phase 2: exact rank over the aggregate-sized candidate union
      val wG = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      val sel = cand.withColumn("grn", row_number().over(wG))
        .filter(col("grn") <= col("quota"))
      quota.join(
          sel.groupBy("lang")
            .agg(count(lit(1)).as("n_sampled"), sum("doc_id").as("sum_ids")),
          Seq("lang"), "left")
        .select(col("lang"), col("n_total").cast("long").as("n_total"),
          col("quota").cast("long").as("quota"),
          coalesce(col("n_sampled"), lit(0L)).cast("long").as("n_sampled"),
          coalesce(col("sum_ids"), lit(0L)).cast("long").as("sum_ids"))
        .orderBy("lang")
    },

    // Curriculum schedule (r10) — the training-ORDER complement of the
    // mixture family: q_mix_* decide WHAT to train on, this decides WHEN.
    // Easy-to-hard curriculum with per-LANGUAGE difficulty quartiles
    // (difficulty scales differ across languages — zh's chars-per-word
    // dwarfs en's, so a global cut would order by language, not by
    // difficulty): difficulty = chars per word (x1e4), stage = the doc's
    // quartile within its language, reading order inside a stage = a
    // seeded md5 shuffle (deterministic, engine-portable, uncorrelated
    // with ingest order — q_shuffle_shard's rule). Exact quartiles, no
    // ntile: a global/per-lang NTILE window would funnel the corpus
    // through |langs| tasks; instead the corpus collapses to the
    // (lang, difficulty)-distinct COUNT relation and the three cut
    // points fall out of a cumulative window over that AGGREGATE-sized
    // relation (q_anomaly_mad's exact-quantile machinery), broadcast
    // back onto the scan. The schedule materializes as (stage, shard,
    // pos_in_shard) — positions are numbered inside (stage, shard)
    // partitions (shard = md5-derived, q_shuffle_shard's rule), NEVER per
    // stage alone: a per-stage row numbering would funnel a quarter of
    // the corpus through one task, while (stage × shard) windows spread
    // the numbering across stage·16 tasks and the reader consumes shards
    // round-robin within each stage exactly like sharded training data.
    Q(
      "q_curriculum_order",
      s"""WITH d AS (SELECT doc_id, lang,
        |    CAST(length(text) * 10000 // len($W) AS BIGINT) AS diff FROM documents),
        |g AS (SELECT lang, diff, COUNT(*) AS c FROM d GROUP BY 1, 2),
        |w AS (SELECT lang, diff,
        |    SUM(c) OVER (PARTITION BY lang ORDER BY diff) AS cum,
        |    SUM(c) OVER (PARTITION BY lang) AS n FROM g),
        |cuts AS (SELECT lang,
        |    MIN(CASE WHEN cum * 4 >= n THEN diff END) AS c1,
        |    MIN(CASE WHEN cum * 2 >= n THEN diff END) AS c2,
        |    MIN(CASE WHEN cum * 4 >= 3 * n THEN diff END) AS c3
        |  FROM w GROUP BY lang),
        |st AS (SELECT d.doc_id, d.lang, d.diff,
        |    1 + CAST(d.diff > c.c1 AS INT) + CAST(d.diff > c.c2 AS INT)
        |      + CAST(d.diff > c.c3 AS INT) AS stage,
        |    md5('curr42|' || CAST(d.doc_id AS VARCHAR)) AS k,
        |    CAST('0x' || substring(md5('curr42|' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 16 AS shard
        |  FROM d JOIN cuts c ON d.lang = c.lang)
        |SELECT doc_id, lang, diff AS difficulty_x1e4, CAST(stage AS BIGINT) AS stage,
        |  CAST(shard AS BIGINT) AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY stage, shard ORDER BY k, doc_id) AS BIGINT) AS pos_in_shard
        |FROM st ORDER BY stage, shard, pos_in_shard""",
    ) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          expr("CAST(length(text) * 10000 div size(split(text, ' ')) AS BIGINT)").as("diff"))
      val cumW = Window.partitionBy("lang").orderBy("diff")
      val totW = Window.partitionBy("lang")
      val cuts = d.groupBy("lang", "diff").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(cumW))
        .withColumn("n", sum(col("c")).over(totW))
        .groupBy("lang")
        .agg(min(when(col("cum") * 4 >= col("n"), col("diff"))).as("c1"),
          min(when(col("cum") * 2 >= col("n"), col("diff"))).as("c2"),
          min(when(col("cum") * 4 >= col("n") * 3, col("diff"))).as("c3"))
      val posW = Window.partitionBy("stage", "shard").orderBy("k", "doc_id")
      d.join(broadcast(cuts), Seq("lang"))
        .withColumn("stage",
          lit(1) + (col("diff") > col("c1")).cast("int")
            + (col("diff") > col("c2")).cast("int")
            + (col("diff") > col("c3")).cast("int"))
        .withColumn("k", md5(concat(lit("curr42|"), col("doc_id").cast("string"))))
        .withColumn("shard", expr("CAST(CONV(substring(k, 1, 15), 16, 10) AS BIGINT) % 16"))
        .select(col("doc_id"), col("lang"), col("diff").as("difficulty_x1e4"),
          col("stage").cast("long").as("stage"), col("shard").cast("long").as("shard"),
          row_number().over(posW).cast("long").as("pos_in_shard"))
        .orderBy("stage", "shard", "pos_in_shard")
    },

    // LLM-watermark detection (r10; Kirchenbauer et al.'s green-list
    // scheme — the provenance screen a training pipeline runs now that
    // crawls carry machine-generated text): a watermarking sampler
    // boosts tokens from a "green list" seeded by the previous token's
    // hash, so watermarked text shows a green fraction far above the
    // 1/2 a hash assigns by chance. Detection is generation-free: green
    // bit = first md5 nibble of "prev|cur" in 0-7 (exact p = 1/2),
    // per-doc z-test via the cross-multiplied integer inequality
    // (2g − n)² > 9n ⇔ |z| > 3, flagged one-sided (suspect = excess
    // greens; a deficit is hash noise, not a watermark). The corpus is
    // un-watermarked word salad, so every 100th doc gets a synthesized
    // 60-token green-run suffix (" zz" × 60 — 'zz|zz' hashes green) by
    // the IDENTICAL expression in both engines (the q_text_pii suffix
    // precedent): the detector provably FIRES on planted positives while
    // clean docs stay in the expected false-positive band. Scale: green
    // counting is a row-local fold over the split array — ZERO shuffles
    // before the ordered output; docs with no bigram (nothing to test)
    // are absent by construction, like q_dsir_importance's featureless
    // docs.
    Q(
      "q_text_watermark",
      s"""WITH d0 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 100 = 0 THEN text || repeat(' zz', 60) ELSE text END AS text
        |  FROM documents),
        |d AS (SELECT doc_id, $W AS w FROM d0),
        |g AS (SELECT doc_id,
        |    CAST(len(w) - 1 AS BIGINT) AS n,
        |    CAST(len(list_filter(range(0, len(w) - 1),
        |      i -> substring(md5(w[i+1] || '|' || w[i+2]), 1, 1) <= '7')) AS BIGINT) AS ng
        |  FROM d WHERE len(w) >= 2)
        |SELECT doc_id, n AS n_pairs, ng AS n_green,
        |  CAST(ng * 10000 // n AS BIGINT) AS green_x1e4,
        |  CAST((2 * ng - n) * (2 * ng - n) * 10000 // n AS BIGINT) AS z2_x1e4,
        |  (2 * ng > n AND (2 * ng - n) * (2 * ng - n) > 9 * n) AS suspect
        |FROM g ORDER BY doc_id""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("text",
          when(col("doc_id") % 100 === 0, concat(col("text"), expr("repeat(' zz', 60)")))
            .otherwise(col("text")))
        .withColumn("w", split(col("text"), " "))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          (size(col("w")) - 1).cast("long").as("n"),
          expr("""CAST(size(filter(sequence(0, size(w) - 2),
                 |  i -> substring(md5(concat(element_at(w, i + 1), '|', element_at(w, i + 2))), 1, 1) <= '7')) AS BIGINT)""".stripMargin)
            .as("ng"))
        .select(col("doc_id"), col("n").as("n_pairs"), col("ng").as("n_green"),
          expr("CAST(ng * 10000 div n AS BIGINT)").as("green_x1e4"),
          expr("CAST((2 * ng - n) * (2 * ng - n) * 10000 div n AS BIGINT)").as("z2_x1e4"),
          (col("ng") * 2 > col("n") &&
            (col("ng") * 2 - col("n")) * (col("ng") * 2 - col("n")) > col("n") * 9)
            .as("suspect"))
        .orderBy("doc_id")
    },
  )
}
