package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a production training-data pipeline runs
  * between raw crawl and tokenizer: PII redaction, URL-level dedup,
  * composite quality gating (Gopher-style rules), and tokenizer-training
  * statistics (BPE merge-pair counting). North star: BASELINE.json; the
  * reference delegates this layer to its Spark container
  * (docker-compose.yml:58-81) — here it is first-class.
  *
  * Determinism (SURVEY.md §7.5): outputs are strings/BIGINTs only; every
  * regex is in the common Java-regex ∩ RE2 subset (character classes,
  * bounded repetition, anchors — no backreferences, no lookaround) so
  * Spark and DuckDB replace identically; DuckDB's regexp_replace needs
  * the explicit 'g' flag to match Spark's replace-all semantics.
  *
  * Scale notes: PII/quality are row-local single-scan maps; URL dedup is
  * one canonical-key aggregation shuffle; BPE pair counting aggregates to
  * the VOCABULARY first (corpus-sized explode → word-keyed partial agg)
  * so the quadratic-ish pair expansion runs over vocab-sized, not
  * corpus-sized, input.
  */
object CurateQueries extends QueryPack {

  /** deterministic pseudo-PII suffix appended to each document — the
    * corpus itself is PII-free word salad, so the operator's subject
    * matter is synthesized from doc_id by the IDENTICAL expression in
    * both engines (same rendering of BIGINT arithmetic to string).
    */
  private val PiiSuffixSql =
    """' contact u' || doc_id || '@mail' || (doc_id % 7) || '.com ip 10.' ||
      | (doc_id % 256) || '.0.' || (doc_id % 100) || ' tel 555-' ||
      | (1000 + doc_id % 9000)""".stripMargin.replace("\n", "")

  private val EmailRe = "[a-z0-9]+@[a-z0-9.]*[a-z]"
  private val IpRe    = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  private val PhoneRe = "555-[0-9]{4}"

  /** deterministic synthetic URL per document (the corpus has no URL
    * column): mixed case, optional trailing slash, tracking params in
    * two arrangements, optional fragment — every mess the canonicalizer
    * must undo, keyed off doc_id identically in both engines.
    */
  private val UrlSql =
    """'HTTPS://WWW.SRC' || (doc_id % 5) || '.Example.COM/Page/' || (doc_id % 7) ||
      | CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
      | CASE WHEN doc_id % 2 = 0
      |   THEN '?utm_source=feed&utm_campaign=x&ref=' || (doc_id % 3)
      |   ELSE '?b=1&utm_medium=m' END ||
      | CASE WHEN doc_id % 5 = 0 THEN '#frag' || (doc_id % 4) ELSE '' END""".stripMargin.replace("\n", "")

  override def queries: Seq[Q] = Seq(

    // PII detection + redaction (the pass every released corpus runs —
    // emails/IPs/phones → typed placeholders). Counts are detected on
    // the RAW text; the scrub applies the three patterns sequentially
    // (email → ip → phone), so a span consumed by an earlier rule is
    // invisible to later ones in BOTH engines. Row-local: one scan, no
    // shuffle before the ordered output.
    Q(
      "q_text_pii",
      s"""WITH aug AS (SELECT doc_id, text || $PiiSuffixSql AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(t, '$IpRe')) AS BIGINT) AS n_ip,
         |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phone,
         |  regexp_replace(regexp_replace(regexp_replace(t,
         |      '$EmailRe', '<EMAIL>', 'g'),
         |      '$IpRe', '<IP>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g') AS scrubbed
         |FROM aug ORDER BY doc_id""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("t", expr(s"text || $PiiSuffixSql"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(col("t"), lit(IpRe), lit(0))).cast("long").as("n_ip"),
          size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).cast("long").as("n_phone"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            EmailRe, "<EMAIL>"),
            IpRe, "<IP>"),
            PhoneRe, "<PHONE>").as("scrubbed"))
        .orderBy("doc_id")
    },

    // URL canonicalization + dedup (CCNet/RefinedWeb keep one document
    // per canonical URL before any content dedup): lowercase, https→http,
    // strip www./fragment/tracking params/trailing slash — then ONE
    // canonical-key aggregation picks the keeper (min doc_id). The
    // regex chain is row-local; the only shuffle is the groupBy, keyed
    // on the canonical URL (near-uniform — no skew at corpus scale).
    Q(
      "q_dedup_url",
      s"""WITH u AS (SELECT doc_id, $UrlSql AS url FROM documents),
         |c AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    lower(url),
         |    '#.*', '', 'g'),
         |    '^https://', 'http://', 'g'),
         |    '^http://www\\.', 'http://', 'g'),
         |    'utm_[a-z]+=[^&#]*&?', '', 'g'),
         |    '\\?&', '?', 'g'),
         |    '[?&]$$', '', 'g'),
         |    '/$$', '', 'g') AS canon_url
         | FROM u)
         |SELECT canon_url, MIN(doc_id) AS keeper, COUNT(*) AS n_urls
         |FROM c GROUP BY canon_url ORDER BY canon_url""",
    ) { (s, dir) =>
      val canon = Seq[(String, String)](
        "#.*" -> "",                       // fragment
        "^https://" -> "http://",          // scheme normalization
        "^http://www\\." -> "http://",     // www strip
        "utm_[a-z]+=[^&#]*&?" -> "",       // tracking params
        "\\?&" -> "?",                     // ?& left when utm was first
        "[?&]$" -> "",                     // dangling separator
        "/$" -> "")                        // trailing slash
        .foldLeft(lower(expr(UrlSql))) { case (c, (re, repl)) =>
          regexp_replace(c, re, repl)
        }
      Tables.documents(s, dir)
        .select(col("doc_id"), canon.as("canon_url"))
        .groupBy("canon_url")
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_urls"))
        .orderBy("canon_url")
    },

    // composite quality gate (Gopher-style rule set, Rae et al. 2021):
    // five integer-exact rules — word count bounds, mean word length
    // bounds (cross-multiplied, no division), stopword floor, duplicate
    // -word ceiling, max token length — emitted as per-rule flags + a
    // bitmask + the final keep decision. This is the operator shape of
    // every rule-based corpus filter: one scan, all rules row-local over
    // one tokenization, no shuffle before the ordered output.
    Q(
      "q_quality_gopher",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(w) AS BIGINT) AS n,
        |  CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS sum_len,
        |  CAST(list_max(list_transform(w, x -> length(x))) AS BIGINT) AS max_len,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
        |  CAST(len(list_filter(w, x -> x IN ('the','a','row','data','value'))) AS BIGINT) AS n_stop
        | FROM t)
        |SELECT doc_id, n,
        |  CAST(n >= 50 AND n <= 100000 AS BIGINT) AS r_wordcount,
        |  CAST(sum_len >= 3 * n AND sum_len <= 10 * n AS BIGINT) AS r_meanlen,
        |  CAST(n_stop >= 2 AS BIGINT) AS r_stopwords,
        |  CAST(n_uniq * 2 >= n AS BIGINT) AS r_dupwords,
        |  CAST(max_len <= 15 AS BIGINT) AS r_maxlen,
        |  CAST(CAST(n >= 50 AND n <= 100000 AS BIGINT)
        |     + 2 * CAST(sum_len >= 3 * n AND sum_len <= 10 * n AS BIGINT)
        |     + 4 * CAST(n_stop >= 2 AS BIGINT)
        |     + 8 * CAST(n_uniq * 2 >= n AS BIGINT)
        |     + 16 * CAST(max_len <= 15 AS BIGINT) AS BIGINT) AS rule_mask,
        |  CAST(n >= 50 AND n <= 100000 AND sum_len >= 3 * n AND sum_len <= 10 * n
        |    AND n_stop >= 2 AND n_uniq * 2 >= n AND max_len <= 15 AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""",
    ) { (s, dir) =>
      val m = Tables.documents(s, dir)
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n"),
          expr("aggregate(transform(w, x -> length(x)), 0L, (a, b) -> a + b)").as("sum_len"),
          expr("CAST(array_max(transform(w, x -> length(x))) AS BIGINT)").as("max_len"),
          size(array_distinct(col("w"))).cast("long").as("n_uniq"),
          expr("CAST(size(filter(w, x -> x IN ('the','a','row','data','value'))) AS BIGINT)").as("n_stop"))
      val r1 = (col("n") >= 50 && col("n") <= 100000).cast("long")
      val r2 = (col("sum_len") >= col("n") * 3 && col("sum_len") <= col("n") * 10).cast("long")
      val r3 = (col("n_stop") >= 2).cast("long")
      val r4 = (col("n_uniq") * 2 >= col("n")).cast("long")
      val r5 = (col("max_len") <= 15).cast("long")
      m.select(col("doc_id"), col("n"),
        r1.as("r_wordcount"), r2.as("r_meanlen"), r3.as("r_stopwords"),
        r4.as("r_dupwords"), r5.as("r_maxlen"),
        (r1 + r2 * 2 + r3 * 4 + r4 * 8 + r5 * 16).as("rule_mask"),
        (r1 * r2 * r3 * r4 * r5).as("keep"))
        .orderBy("doc_id")
    },

    // tokenizer training statistics: the first BPE iteration's merge
    // ranking (Sennrich et al. 2016) — count adjacent character pairs
    // weighted by corpus word frequency, rank the top 20 merges with a
    // total-order tie-break. The pair expansion runs over the WORD
    // FREQUENCY table (vocab-sized), not the corpus: explode → word
    // partial-agg (shuffle 1, pre-combined), pair expansion + sum
    // (shuffle 2, vocab-sized), TakeOrdered top-20 (no global sort
    // exchange). At 100 TB the vocab table is the classic small
    // intermediate — this is exactly how BPE trainers batch it.
    Q(
      "q_tokenizer_bpe",
      """WITH wf AS (SELECT word, COUNT(*) AS cnt
        |            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |            GROUP BY word),
        |p AS (SELECT unnest(list_transform(range(1, length(word)),
        |               i -> substring(word, CAST(i AS INT), 2))) AS pair, cnt
        |      FROM wf WHERE length(word) >= 2)
        |SELECT pair, CAST(SUM(cnt) AS BIGINT) AS weight
        |FROM p GROUP BY pair
        |ORDER BY weight DESC, pair LIMIT 20""",
    ) { (s, dir) =>
      val wf = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      wf.filter(length(col("word")) >= 2)
        // Spark's sequence(1, n) counts DOWN when n < 1 — the length
        // guard above keeps single-char words out of the generator
        .select(explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"), col("cnt"))
        .groupBy("pair").agg(sum(col("cnt")).as("weight"))
        .orderBy(col("weight").desc, col("pair"))
        .limit(20)
    },

    // tokenizer VOCABULARY COVERAGE (the fertility/OOV report a
    // tokenizer release ships): learn the top-100 corpus words as the
    // vocab (count DESC, word ASC total-order tie-break — the cut is
    // deterministic), then report each document's out-of-vocabulary
    // rate. Scale shape: the vocab is learned with one word-keyed
    // partial agg and is SMALL BY CONSTRUCTION (top-K), so membership
    // attaches to the corpus scan as a broadcast join — per-doc OOV
    // counting never shuffles the corpus again.
    Q(
      "q_tokenizer_vocab",
      """WITH wf AS (SELECT word, COUNT(*) AS c
        |            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |            GROUP BY word),
        |v AS (SELECT word FROM wf ORDER BY c DESC, word LIMIT 100),
        |d AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_words,
        |  CAST(COUNT(*) FILTER (WHERE w NOT IN (SELECT word FROM v)) AS BIGINT) AS n_oov,
        |  CAST((COUNT(*) FILTER (WHERE w NOT IN (SELECT word FROM v)) * 10000) // COUNT(*) AS BIGINT) AS oov_x1e4
        |FROM d GROUP BY doc_id ORDER BY doc_id""",
    ) { (s, dir) =>
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val vocab = words.groupBy(col("w").as("vw"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("vw"))
        .limit(100)
        .select("vw")
      words
        .join(broadcast(vocab), col("w") === col("vw"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("vw").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_words"), col("n_oov"),
          expr("CAST((n_oov * 10000L) div n_words AS BIGINT)").as("oov_x1e4"))
        .orderBy("doc_id")
    },

    // character-n-gram language ID (the fastText-style successor to
    // q_text_langid's marker words): per-language profiles = the top-20
    // char trigrams by occurrence (count DESC, gram ASC — deterministic
    // cut) learned from the labeled corpus itself, a document's
    // prediction = the language whose profile its distinct-trigram set
    // overlaps most (ties: language ASC), docs with no overlap predict
    // 'unknown'; reported as label × prediction confusion counts. Scale:
    // profile learning is one (lang, gram) partial-agg'd shuffle; the
    // profile is 20×|langs| and BROADCASTS into the doc-gram scan; the
    // per-doc argmax windows ≤|langs| rows per doc — the only corpus-
    // sized shuffle is the doc-gram distinct, the standard tokenization
    // cost.
    Q(
      "q_text_langid_ngram",
      """WITH g AS (SELECT doc_id, lang,
        |    unnest(list_transform(range(1, length(text) - 1),
        |      i -> substring(text, CAST(i AS INT), 3))) AS gm
        |  FROM documents),
        |pc AS (SELECT lang AS plang, gm, COUNT(*) AS c FROM g GROUP BY 1, 2),
        |prof AS (SELECT plang, gm FROM (
        |    SELECT plang, gm, row_number() OVER (PARTITION BY plang ORDER BY c DESC, gm) AS rn
        |    FROM pc) WHERE rn <= 20),
        |dg AS (SELECT DISTINCT doc_id, gm FROM g),
        |ov AS (SELECT doc_id, plang, COUNT(*) AS ov
        |       FROM dg JOIN prof USING (gm) GROUP BY 1, 2),
        |pred AS (SELECT doc_id, plang AS pred FROM (
        |    SELECT doc_id, plang, row_number() OVER (PARTITION BY doc_id ORDER BY ov DESC, plang) AS rn
        |    FROM ov) WHERE rn = 1)
        |SELECT d.lang, COALESCE(p.pred, 'unknown') AS pred, COUNT(*) AS n
        |FROM documents d LEFT JOIN pred p ON d.doc_id = p.doc_id
        |GROUP BY 1, 2 ORDER BY lang, pred""",
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val grams = Tables.spread(docs)
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"),
          // graft_char_ngrams = the one-pass native twin of
          // transform(sequence(1, length(text)-2), i -> substring(text, i, 3))
          // — the HOF's substring re-seeks from the string start per gram
          // (O(chars²)/doc) through interpreted lambdas (NativeFnSpec pins
          // parity). This relation is derived twice (profile + prediction
          // branches), so the kernel pays off double.
          explode(expr("graft_char_ngrams(text, 3)")).as("gm"))
      // NOTE (r13, measured and rejected): collapsing the two gram
      // consumers onto one shared (doc, lang, gm) rollup shuffled MORE
      // (9.8 → 20.2 MB, task time flat) — the profile branch's (lang, gm)
      // partial aggregation collapses map-side onto a tiny key domain,
      // which the per-doc-keyed rollup forfeits. The two-branch shape
      // stays; the native gram kernel is where the win was.
      val profRank = Window.partitionBy("plang").orderBy(col("c").desc, col("gm"))
      val prof = grams.groupBy(col("lang").as("plang"), col("gm"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(profRank))
        .filter(col("rn") <= 20)
        .select("plang", "gm")
      val predRank = Window.partitionBy("doc_id").orderBy(col("ov").desc, col("plang"))
      val pred = grams.select("doc_id", "gm").distinct()
        .join(broadcast(prof), "gm")
        .groupBy("doc_id", "plang")
        .agg(count(lit(1)).as("ov"))
        .withColumn("rn", row_number().over(predRank))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("plang").as("pred"))
      docs.select("doc_id", "lang")
        .join(pred, Seq("doc_id"), "left")
        .groupBy(col("lang"), coalesce(col("pred"), lit("unknown")).as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred")
    },

    // DATASET CARD rollup (the per-slice report a corpus release ships):
    // per (source, language) — document and token counts, exact-dup rate
    // (docs minus distinct texts, the md5 keeper view), rule-gate keep
    // rate (the word-count/stopword core of the Gopher gate), mean doc
    // length — all integer-exact ratios. One scan computes every signal
    // row-locally, ONE (source, lang) aggregation shuffle rolls them up:
    // the report costs the same as any single corpus statistic at 100 TB.
    Q(
      "q_dataset_card",
      """WITH d AS (SELECT source, lang,
        |    string_split(text, ' ') AS w, md5(text) AS th
        |  FROM documents),
        |m AS (SELECT source, lang, th,
        |    CAST(len(w) AS BIGINT) AS n,
        |    CAST(len(w) >= 50 AND
        |      len(list_filter(w, x -> x IN ('the','a','row','data','value'))) >= 2
        |      AS BIGINT) AS keep
        |  FROM d)
        |SELECT source, lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) - COUNT(DISTINCT th) AS BIGINT) AS n_exact_dups,
        |  CAST((SUM(keep) * 10000) // COUNT(*) AS BIGINT) AS keep_x1e4,
        |  CAST((SUM(n) * 10000) // COUNT(*) AS BIGINT) AS mean_len_x1e4
        |FROM m GROUP BY source, lang ORDER BY source, lang""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("w", split(col("text"), " "))
        .select(col("source"), col("lang"), md5(col("text")).as("th"),
          size(col("w")).cast("long").as("n"),
          (size(col("w")) >= 50 &&
            expr("size(filter(w, x -> x IN ('the','a','row','data','value')))") >= 2)
            .cast("long").as("keep"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("n_tokens"),
          (count(lit(1)) - countDistinct(col("th"))).as("n_exact_dups"),
          expr("CAST((SUM(keep) * 10000L) div COUNT(*) AS BIGINT)").as("keep_x1e4"),
          expr("CAST((SUM(n) * 10000L) div COUNT(*) AS BIGINT)").as("mean_len_x1e4"))
        .orderBy("source", "lang")
    },

    // Cross-source PRIORITY dedup (r8) — the mixture-construction rule
    // every multi-source corpus needs: when the same content arrives
    // from several sources (Common Crawl AND a curated dump AND a
    // partner feed), keep exactly one copy, chosen by source PRIORITY
    // (curated beats crawl), tying on doc_id for determinism. Not the
    // same op as exact dedup: the survivor is policy-chosen, not
    // hash-arbitrary. Shape at 100 TB: ONE content-keyed aggregation
    // carrying the winner via min_by over a composite (priority, id)
    // order key — no window, no self-join, no second shuffle; the
    // content key is the same md5 bucketing every dedup op shares.
    // Content key = 20-char prefix hash (the corpus has no byte-exact
    // dups by construction — §7.5 synthetic-key rule); priority = the
    // source's numeric suffix (src0 outranks src19).
    Q(
      "q_mix_dedup_priority",
      """WITH d AS (SELECT doc_id, source,
        |    CAST(substring(source, 4) AS BIGINT) * 1000000000 + doc_id AS ord,
        |    md5(substring(text, 1, 20)) AS k
        |  FROM documents)
        |SELECT arg_min(doc_id, ord) AS doc_id, arg_min(source, ord) AS source,
        |  CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM d GROUP BY k ORDER BY doc_id""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          (expr("CAST(substring(source, 4, 8) AS BIGINT)") * lit(1000000000L)
            + col("doc_id")).as("ord"),
          md5(substring(col("text"), 1, 20)).as("k"))
        .groupBy("k")
        .agg(min_by(col("doc_id"), col("ord")).as("doc_id"),
          min_by(col("source"), col("ord")).as("source"),
          count(lit(1)).as("n_copies"))
        .select("doc_id", "source", "n_copies")
        .orderBy("doc_id")
    },

    // Tokenizer fertility report (r10) — the per-LANGUAGE efficiency eval
    // a tokenizer release ships next to q_tokenizer_vocab's per-doc OOV:
    // fertility (subword pieces per whitespace word) and bytes per piece,
    // the two numbers that decide whether a language is over-segmented.
    // The segmenter is a deterministic stand-in for a learned BPE merge
    // table: fixed-width pieces of ≤4 chars per word (⌈len/4⌉ pieces —
    // a max-piece-length vocabulary's worst case), so fertility varies
    // with each language's word-length profile instead of needing merge
    // state both engines would have to share. Byte counts are
    // octet_length/strlen (UTF-8 bytes in both engines). Exactness:
    // per-doc counts are row-local integers, ratios floor-div x1e4.
    // Scale: ONE corpus scan, all counting row-local (a fold over the
    // split array — no exploded token relation), one partial-agg'd
    // shuffle to |langs| rows.
    Q(
      "q_tokenizer_fertility",
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        |  CAST(SUM(list_sum(list_transform(string_split(text, ' '), x -> (length(x) + 3) // 4))) AS BIGINT) AS n_pieces,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
        |  CAST(SUM(list_sum(list_transform(string_split(text, ' '), x -> (length(x) + 3) // 4))) * 10000
        |    // SUM(len(string_split(text, ' '))) AS BIGINT) AS fertility_x1e4,
        |  CAST(SUM(strlen(text)) * 10000
        |    // SUM(list_sum(list_transform(string_split(text, ' '), x -> (length(x) + 3) // 4))) AS BIGINT) AS bytes_per_piece_x1e4
        |FROM documents GROUP BY lang ORDER BY lang""",
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("nw"),
          expr("aggregate(transform(split(text, ' '), x -> CAST((length(x) + 3) div 4 AS BIGINT)), 0L, (a, x) -> a + x)")
            .as("nt"),
          expr("octet_length(text)").cast("long").as("nb"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).as("n_words"),
          sum(col("nt")).as("n_pieces"),
          sum(col("nb")).as("n_bytes"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_pieces"), col("n_bytes"),
          expr("CAST(n_pieces * 10000 div n_words AS BIGINT)").as("fertility_x1e4"),
          expr("CAST(n_bytes * 10000 div n_pieces AS BIGINT)").as("bytes_per_piece_x1e4"))
        .orderBy("lang")
    },

    // DSIR-style importance resampling (r10; Xie et al., "Data Selection
    // for Language Models via Importance Resampling", public preprint) —
    // the data-selection pass that reweights a raw crawl toward a target
    // domain using n-gram frequency ratios. Target distribution = the
    // corpus's own English slice (lang = 'en'); features = word bigrams;
    // a feature's importance ratio is its target relative frequency over
    // its raw relative frequency, fixed-point:
    //   w_x1e6(f) = cnt_t(f)·total_raw·1e6 div (cnt_raw(f)·total_t)
    // (the paper's log-likelihood-ratio sum is a float; the occurrence-
    // weighted MEAN ratio ranks the same direction and stays integral —
    // floor div agrees across engines, intermediates in DECIMAL(38,0)/
    // HUGEINT so corpus-scale totals cannot overflow). Each doc scores
    // the nd-weighted mean ratio of its bigrams; the resample keeps the
    // top-100 scores (ties at the threshold all kept — the cut is on the
    // VALUE, so it needs no global row numbering). Docs with no bigram
    // (single-word texts) have no feature mass and are absent by
    // construction in both engines. Scale: one corpus scan collapses to
    // the (doc, bigram) tf relation (partial-agg'd); the per-feature
    // marginals attach as (a, b)-partitioned WINDOWS over it (bounded by
    // a bigram's distinct docs — join-free, q_lm_score's doctrine); the
    // corpus totals and the top-k threshold are 1-row broadcasts
    // (TakeOrderedAndProject + global agg, never a global sort/window).
    Q(
      "q_dsir_importance",
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |i AS (SELECT doc_id, lang, w, unnest(range(0, len(w) - 1)) AS i FROM d),
        |g AS (SELECT doc_id, lang, w[i+1] AS a, w[i+2] AS b FROM i),
        |t AS (SELECT doc_id, lang, a, b, CAST(COUNT(*) AS BIGINT) AS nd
        |      FROM g GROUP BY 1, 2, 3, 4),
        |tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS total_r,
        |               CAST(SUM(nd) FILTER (WHERE lang = 'en') AS BIGINT) AS total_t FROM t),
        |m AS (SELECT doc_id, lang, nd,
        |        SUM(nd) OVER (PARTITION BY a, b) AS cnt_r,
        |        SUM(CASE WHEN lang = 'en' THEN nd ELSE 0 END) OVER (PARTITION BY a, b) AS cnt_t
        |      FROM t),
        |sc AS (SELECT doc_id, MIN(lang) AS lang,
        |         CAST(SUM(nd) AS BIGINT) AS n_bigrams,
        |         CAST(SUM(nd * (CAST(cnt_t AS HUGEINT) * total_r * 1000000
        |                        // (CAST(cnt_r AS HUGEINT) * total_t)))
        |              // SUM(nd) AS BIGINT) AS score_x1e6
        |       FROM m, tot GROUP BY doc_id),
        |th AS (SELECT MIN(score_x1e6) AS cut FROM
        |        (SELECT score_x1e6 FROM sc ORDER BY score_x1e6 DESC, doc_id LIMIT 100))
        |SELECT doc_id, lang, n_bigrams, score_x1e6, (score_x1e6 >= cut) AS is_selected
        |FROM sc, th ORDER BY doc_id""",
    ) { (s, dir) =>
      val isEn = col("lang") === "en"
      // bigram features as ONE space-joined string (r13): tokens come from
      // split(text, ' ') so they cannot contain the delimiter — grouping/
      // windowing by "a b" partitions identically to the (a, b) struct,
      // and graft_word_grams is the one-pass native twin of the
      // interpreted slice+struct transform (which copied the token array
      // and allocated a struct per bigram). Narrower window key through
      // the feature-marginal shuffle too.
      val fw = Window.partitionBy("g")
      val tf = Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), col("lang"),
          explode(expr("graft_word_grams(w, 2)")).as("g"))
        .groupBy("doc_id", "lang", "g").agg(count(lit(1)).as("nd"))
      val tot = tf.agg(
        sum(col("nd")).cast("long").as("total_r"),
        sum(when(isEn, col("nd")).otherwise(0L)).cast("long").as("total_t"))
      val scores = tf
        .withColumn("cnt_r", sum(col("nd")).over(fw))
        .withColumn("cnt_t", sum(when(isEn, col("nd")).otherwise(0L)).over(fw))
        .crossJoin(broadcast(tot))
        .withColumn("w6", expr(
          """CAST(cnt_t AS DECIMAL(38,0)) * total_r * 1000000
             div (CAST(cnt_r AS DECIMAL(38,0)) * total_t)"""))
        .groupBy("doc_id")
        .agg(min(col("lang")).as("lang"),
          sum(col("nd")).cast("long").as("n_bigrams"),
          expr("CAST(sum(nd * w6) div sum(nd) AS BIGINT)").as("score_x1e6"))
      val cut = scores.orderBy(col("score_x1e6").desc, col("doc_id")).limit(100)
        .agg(min(col("score_x1e6")).as("cut"))
      scores.crossJoin(broadcast(cut))
        .select(col("doc_id"), col("lang"), col("n_bigrams"), col("score_x1e6"),
          (col("score_x1e6") >= col("cut")).as("is_selected"))
        .orderBy("doc_id")
    },

    // Quality-classifier evaluation (r10) — the calibration number a
    // scorer release ships: does q_quality_linear's score RANK the docs
    // the gopher gate keeps above the ones it rejects? AUC is the exact
    // Mann-Whitney rank statistic — for the heavily imbalanced labels a
    // strict rule conjunction produces (~2% positives here), THE metric
    // (accuracy at any threshold reads 98% by voting reject). Exact, no
    // floats, no ties lost: the corpus collapses to the per-SCORE
    // (n_pos, n_neg) histogram; 2·U = Σ_s np(s)·(2·cumneg(<s) + nn(s))
    // counts wins twice and ties once; AUC_x1e6 = 2U·1e6 div (2·P·N).
    // Also reports precision/recall at the scorer's deployed 15000
    // threshold — the operating point next to the ranking quality.
    // Scale: ONE corpus scan (score and label are row-local over one
    // tokenization), one partial-agg'd shuffle to the score histogram;
    // the cumulative fold runs inside a keys=[] GLOBAL AGG on the
    // sorted histogram array (q_mix_domain_balance's construction — a
    // global WINDOW over the histogram would serialize it through one
    // task for no reason; the array is bounded by the score's value
    // range, corpus-independent).
    Q(
      "q_quality_auc",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |f AS (SELECT doc_id,
        |  CAST(3 * ((len(list_distinct(w)) * 10000) // len(w))
        |     + 2 * ((len(list_filter(w, x -> x IN ('the','a','row','data','value'))) * 10000) // len(w))
        |     - abs((CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) * 10000) // len(w) - 45000) AS BIGINT) AS s,
        |  CAST(len(w) >= 50 AND len(w) <= 100000
        |    AND list_sum(list_transform(w, x -> length(x))) >= 3 * len(w)
        |    AND list_sum(list_transform(w, x -> length(x))) <= 10 * len(w)
        |    AND len(list_filter(w, x -> x IN ('the','a','row','data','value'))) >= 2
        |    AND len(list_distinct(w)) * 2 >= len(w)
        |    AND list_max(list_transform(w, x -> length(x))) <= 15 AS BIGINT) AS keep
        | FROM t),
        |h AS (SELECT s, CAST(SUM(keep) AS BIGINT) AS np,
        |        CAST(SUM(1 - keep) AS BIGINT) AS nn FROM f GROUP BY s),
        |w2 AS (SELECT np, nn,
        |        COALESCE(SUM(nn) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cn
        |       FROM h),
        |u AS (SELECT CAST(SUM(np * (2 * cn + nn)) AS BIGINT) AS u2,
        |        CAST(SUM(np) AS BIGINT) AS p, CAST(SUM(nn) AS BIGINT) AS n FROM w2),
        |op AS (SELECT CAST(SUM(CASE WHEN s >= 15000 AND keep = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |         CAST(SUM(CASE WHEN s >= 15000 AND keep = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp
        |       FROM f)
        |SELECT p + n AS n_docs, p AS n_pos, n AS n_neg,
        |  CAST(u2 * 1000000 // (2 * p * n) AS BIGINT) AS auc_x1e6,
        |  tp, fp,
        |  CAST(CASE WHEN tp + fp > 0 THEN tp * 10000 // (tp + fp) ELSE 0 END AS BIGINT) AS precision_x1e4,
        |  CAST(tp * 10000 // p AS BIGINT) AS recall_x1e4
        |FROM u, op""",
    ) { (s, dir) =>
      val f = Tables.spread(Tables.documents(s, dir))
        .withColumn("w", split(col("text"), " "))
        .select(
          expr("""CAST(3 * ((size(array_distinct(w)) * 10000L) div size(w))
                 |   + 2 * ((size(filter(w, x -> x IN ('the','a','row','data','value'))) * 10000L) div size(w))
                 |   - abs((aggregate(transform(w, x -> length(x)), 0L, (a, b) -> a + b) * 10000L) div size(w) - 45000L) AS BIGINT)""".stripMargin)
            .as("s"),
          expr("""CAST(size(w) >= 50 AND size(w) <= 100000
                 |  AND aggregate(transform(w, x -> length(x)), 0L, (a, b) -> a + b) >= 3 * size(w)
                 |  AND aggregate(transform(w, x -> length(x)), 0L, (a, b) -> a + b) <= 10 * size(w)
                 |  AND size(filter(w, x -> x IN ('the','a','row','data','value'))) >= 2
                 |  AND size(array_distinct(w)) * 2 >= size(w)
                 |  AND array_max(transform(w, x -> length(x))) <= 15 AS BIGINT)""".stripMargin)
            .as("keep"))
      f.groupBy("s")
        .agg(sum(col("keep")).cast("long").as("np"),
          sum(lit(1L) - col("keep")).cast("long").as("nn"),
          sum(when(col("s") >= 15000 && col("keep") === 1, 1L).otherwise(0L)).as("tps"),
          sum(when(col("s") >= 15000 && col("keep") === 0, 1L).otherwise(0L)).as("fps"))
        // keys=[] global agg: the histogram (bounded by the score's value
        // range) folds to ONE row — sort_array + a struct-accumulator
        // fold computes the rank statistic without a global window
        .agg(
          expr("""aggregate(
                 |  sort_array(collect_list(named_struct('s', s, 'np', np, 'nn', nn))),
                 |  named_struct('cn', 0L, 'u2', 0L),
                 |  (a, x) -> named_struct('cn', a.cn + x.nn, 'u2', a.u2 + x.np * (2 * a.cn + x.nn)),
                 |  a -> a.u2)""".stripMargin).as("u2"),
          sum(col("np")).cast("long").as("p"),
          sum(col("nn")).cast("long").as("n"),
          sum(col("tps")).cast("long").as("tp"),
          sum(col("fps")).cast("long").as("fp"))
        .select((col("p") + col("n")).as("n_docs"), col("p").as("n_pos"), col("n").as("n_neg"),
          expr("CAST(u2 * 1000000L div (2 * p * n) AS BIGINT)").as("auc_x1e6"),
          col("tp"), col("fp"),
          expr("CAST(CASE WHEN tp + fp > 0 THEN tp * 10000L div (tp + fp) ELSE 0L END AS BIGINT)")
            .as("precision_x1e4"),
          expr("CAST(tp * 10000L div p AS BIGINT)").as("recall_x1e4"))
    },
  )
}
