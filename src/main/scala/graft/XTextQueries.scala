package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.functions.L2Normalize
import graft.ops.{Classifier, Clustering, Dedup, Graph, Multimodal, Pca, Search, Similarity, TextAnalysis, Texts}
import graft.ExtensionQueries._

/** Text-analysis and quality catalog entries (X3: stats, language ID, LMs, tokenizers, quality scoring), split from ExtensionQueries (r8 task #8). */
object XTextQueries {

  val all: Seq[Q] = Seq(

    Q("x4_token_stats",
      (s, dir) => TextAnalysis.tokenStats(col("doc_id"), col("text"))(docs(s, dir)),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tokens,
             |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
             |  list_max(list_transform(string_split(text, ' '), t -> length(t))) AS max_token_len,
             |  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_token_len
             |FROM documents""".stripMargin),
      "X3 per-document token statistics (all-integer, map-only)"),

    Q("x4b_lang_id",
      (s, dir) => TextAnalysis.langIdEn(col("doc_id"), col("text"))(docs(s, dir)),
      Some(s"""SELECT doc_id,
              |  len(list_filter(string_split(text, ' '), t -> t IN ${Texts.enStopwordsSql})) AS en_hits,
              |  len(string_split(text, ' ')) AS n_tokens,
              |  CASE WHEN CAST(len(list_filter(string_split(text, ' '), t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE)
              |            / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.05
              |       THEN 'en' ELSE 'other' END AS lang_guess
              |FROM documents""".stripMargin),
      "X3 language-ID heuristic via stopword-profile hit ratio"),

    Q("x4c_quality_score",
      (s, dir) => TextAnalysis.qualityScore(col("doc_id"), col("text"))(docs(s, dir)),
      Some(s"""SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS diversity,
              |  CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
              |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_token_len,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |    + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |    + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)""".stripMargin),
      "X3 quality scoring: diversity + stopword ratio + mean token length"),

    Q("x4e_bpeish_count",
      (s, dir) => docs(s, dir).select(
        col("doc_id"),
        size(Texts.bpeishTokens(col("text"))).cast("long").as("n_bpeish"),
        size(Texts.tokens(col("text"))).cast("long").as("n_ws")),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS n_bpeish,
             |  len(string_split(text, ' ')) AS n_ws
             |FROM documents""".stripMargin),
      "X3 BPE-ish token counting (pretokenizer split) vs whitespace count, same regex both engines"),

    Q("x4f_normalize",
      (s, dir) => docs(s, dir)
        .select(col("doc_id"), TextAnalysis.normalize(col("text")).as("norm"))
        .withColumn("n_tokens", size(split(col("norm"), " ")).cast("long")),
      Some("""SELECT doc_id, norm, len(string_split(norm, ' ')) AS n_tokens
             |FROM (SELECT doc_id,
             |        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
             |      FROM documents)""".stripMargin),
      "X3 text normalization: lowercase, strip punctuation, squeeze spaces — same regexes both engines"),

    Q("x4h_repetition",
      (s, dir) => TextAnalysis.repetitionRatio(col("doc_id"), col("text"), 2)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
             |           WHERE len(string_split(text, ' ')) >= 2),
             |g AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS gs
             |      FROM t)
             |SELECT doc_id, len(gs) AS n_ngrams, len(list_distinct(gs)) AS n_distinct,
             |       1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / CAST(len(gs) AS DOUBLE) AS rep_ratio
             |FROM g""".stripMargin),
      "X3 repeated-bigram fraction (boilerplate / keyword-stuffing / loop filter), one keyed aggregate"),

    Q("x4i_redact_pii",
      (s, dir) => {
        val red = TextAnalysis.redactPii(col("text"))
        docs(s, dir).select(col("doc_id"), red.as("red"),
          regexp_count(red, lit("<EMAIL>|<URL>|<PHONE>")).as("n_tags"))
      },
      Some {
        // build the oracle replace chain from the SAME pattern literals
        val chain = TextAnalysis.piiPatterns.foldLeft("text") {
          case (e, (p, t)) => s"regexp_replace($e, '$p', '$t', 'g')"
        }
        s"""SELECT doc_id, $chain AS red,
           |  len(regexp_extract_all($chain, '<EMAIL>|<URL>|<PHONE>')) AS n_tags
           |FROM documents""".stripMargin
      },
      "X3 PII-shaped span redaction (emails, URLs, phone runs) — same regex literals both engines"),

    Q("x12_unigram_lm",
      (s, dir) => TextAnalysis.unigramLogProb(col("doc_id"), col("text"))(docs(s, dir)),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |c AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
             |t AS (SELECT CAST(sum(c) AS DOUBLE) AS t_tokens,
             |             CAST(count(*) AS DOUBLE) AS vocab FROM c)
             |SELECT doc_id, count(*) AS n_tokens,
             |       round(avg(ln((CAST(c AS DOUBLE) + 1.0) / (t_tokens + vocab))), 4) AS avg_logp
             |FROM tok JOIN c USING (term) CROSS JOIN t
             |GROUP BY doc_id""".stripMargin),
      "X3 corpus-trained unigram-LM score (CCNet-style perplexity filter " +
        "stand-in): add-1-smoothed mean token log-prob, count-side pre-aggregated"),

    Q("x59_ccnet_buckets",
      // CCNet's published head/middle/tail split by corpus-trained LM
      // score (the downstream contract is "train on head+middle"):
      // x12's scoring pass + one tertile-threshold row broadcast back —
      // the x18 tiers play on the LM axis.
      (s, dir) => TextAnalysis.lmBuckets(col("doc_id"), col("text"))(docs(s, dir)),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |c AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
             |t AS (SELECT CAST(sum(c) AS DOUBLE) AS t_tokens,
             |             CAST(count(*) AS DOUBLE) AS vocab FROM c),
             |sc AS (SELECT doc_id,
             |         round(avg(ln((CAST(c AS DOUBLE) + 1.0) / (t_tokens + vocab))), 4) AS avg_logp
             |       FROM tok JOIN c USING (term) CROSS JOIN t
             |       GROUP BY doc_id),
             |q AS (SELECT quantile_cont(avg_logp, 1.0/3) AS t1,
             |             quantile_cont(avg_logp, 2.0/3) AS t2 FROM sc)
             |SELECT doc_id, avg_logp,
             |       CASE WHEN avg_logp >= t2 THEN 'head'
             |            WHEN avg_logp >= t1 THEN 'middle'
             |            ELSE 'tail' END AS bucket
             |FROM sc CROSS JOIN q""".stripMargin),
      "X3 CCNet head/middle/tail buckets by the corpus-trained unigram " +
        "LM score: x12's scoring pass + an in-plan tertile broadcast " +
        "(two passes, zero driver round-trips) — the published CCNet " +
        "shard split downstream mixtures consume"),

    Q("x14_bpe_merges",
      (s, dir) => TextAnalysis.mergeCandidates(col("doc_id"), col("text"), 20)(docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |sh AS (SELECT unnest([toks[i] || ' ' || toks[i+1]
             |                      for i in range(1, len(toks))]) AS pair
             |       FROM toks WHERE len(toks) >= 2)
             |SELECT pair, count(*) AS cnt FROM sh
             |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin),
      "X3 BPE merge-candidate mining: top-20 adjacent-token pairs (the " +
        "counting pass of a tokenizer-training round; hash-agg + TakeOrdered)"),

    Q("x14b_bpe_apply",
      (s, dir) => {
        // the other half of the x14 story: merges trained in-engine
        // (driver loop over the ONE distributed word-count pass), applied
        // corpus-wide by the native BpeEncode expression — map-only, the
        // literal-model play. No SQL engine can express the greedy merge
        // loop → no_oracle; x14b_bpe_check pins reconstruction + bounds.
        val enc = graft.functions.BpeEncode(trainedBpe(s, dir))(col("text"))
        docs(s, dir).select(
          col("doc_id"),
          size(enc).cast("long").as("n_bpe"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          (length(col("text")) - (size(split(col("text"), " ")) - lit(1)))
            .cast("long").as("n_chars"))
      },
      None,
      "X3 BPE tokenizer application: 200 in-engine-trained merges applied " +
        "per word via the native codegen expression (subword token counts)"),

    Q("x18_quality_tiers",
      (s, dir) => TextAnalysis.qualityTiers(col("doc_id"), col("text"))(docs(s, dir)),
      // quality arithmetic mirrored from the (green) x4c oracle; quartile
      // thresholds via quantile_cont = Spark's exact `percentile` (the
      // interpolation conventions agree — proven by o11)
      Some(s"""WITH sc AS (SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |    + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |    + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
              |q AS (SELECT quantile_cont(quality, 0.25) AS q1,
              |             quantile_cont(quality, 0.5) AS q2,
              |             quantile_cont(quality, 0.75) AS q3 FROM sc)
              |SELECT doc_id, quality,
              |       CAST(CASE WHEN quality < q1 THEN 0
              |                 WHEN quality < q2 THEN 1
              |                 WHEN quality < q3 THEN 2
              |                 ELSE 3 END AS INT) AS tier
              |FROM sc CROSS JOIN q""".stripMargin),
      "X3 quality-tier assignment: in-plan quartile thresholds broadcast " +
        "into the scoring pass (approx-sketch variant for the 100 TB path)"),

    Q("x23_quality_lr",
      (s, dir) => {
        // model-based quality scoring with FIXED literal weights — the
        // oracle-checkable half of the classifier story (training is
        // pinned by x23_lr_check): z accumulates bias-first left-to-right
        // in both engines, so the raw doubles hash-compare bit-exactly.
        // pred avoids exp() entirely (z > 0 ⇔ sigmoid > 0.5).
        val q = TextAnalysis.qualityScore(col("doc_id"), col("text"))(docs(s, dir))
        val feats = Seq(col("diversity"), col("stop_ratio"), col("mean_token_len"))
        val w = Seq(-6.0, 6.0, 3.0, 0.6)
        q.select(col("doc_id"),
          Classifier.linearScore(feats, w).as("z"),
          (Classifier.linearScore(feats, w) > 0).as("pred"))
      },
      Some(s"""WITH f AS (SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS diversity,
              |  CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
              |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS mean_token_len
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
              |SELECT doc_id,
              |  CAST(-6.0 AS DOUBLE) + diversity * CAST(6.0 AS DOUBLE)
              |    + stop_ratio * CAST(3.0 AS DOUBLE)
              |    + mean_token_len * CAST(0.6 AS DOUBLE) AS z,
              |  CAST(-6.0 AS DOUBLE) + diversity * CAST(6.0 AS DOUBLE)
              |    + stop_ratio * CAST(3.0 AS DOUBLE)
              |    + mean_token_len * CAST(0.6 AS DOUBLE) > 0 AS pred
              |FROM f""".stripMargin),
      "X3 model-based quality scoring: logistic-regression linear score " +
        "with literal weights — map-only, codegen'd, bit-exact vs the oracle"),

    Q("x26_heavy_hitters",
      (s, dir) => {
        val (cms, thr) = tokenCms(s, dir)
        TextAnalysis.heavyHitters(col("text"), thr, cms)(docs(s, dir))
      },
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
             |            FROM documents),
             |thr AS (SELECT CAST(ceil(count(*) * 0.02) AS BIGINT) AS t FROM toks)
             |SELECT token, count(*) AS cnt FROM toks
             |GROUP BY token HAVING count(*) >= (SELECT t FROM thr)""".stripMargin),
      "exact corpus heavy hitters (tokens at >= 2% of the stream) behind a " +
        "count-min prefilter: CMS never underestimates, so the map-side cut " +
        "keeps every true heavy hitter and the exact groupBy confirm shuffles " +
        "only candidates — the vocabulary long tail dies before the exchange"),

    Q("x27_boilerplate",
      (s, dir) => TextAnalysis.removeBoilerplate(
        col("doc_id"), col("text"), blockTokens = 8, minDocs = 3)(docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |e AS (SELECT doc_id, t,
             |        unnest(range(0, CAST(ceil(len(t)/8.0) AS BIGINT))) AS i
             |      FROM toks),
             |blk AS (SELECT doc_id, CAST(i AS INT) AS idx,
             |          array_to_string(t[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ') AS b
             |        FROM e),
             |hot AS (SELECT b FROM blk GROUP BY b HAVING count(DISTINCT doc_id) >= 3),
             |kept AS (SELECT * FROM blk WHERE b NOT IN (SELECT b FROM hot))
             |SELECT d.doc_id,
             |       coalesce(string_agg(k.b, ' ' ORDER BY k.idx), '') AS clean_text
             |FROM documents d LEFT JOIN kept k ON k.doc_id = d.doc_id
             |GROUP BY d.doc_id""".stripMargin),
      "C4-style boilerplate cut at 8-token-block granularity: blocks recurring " +
        "in >= 3 distinct docs are dropped corpus-wide and survivors reassemble " +
        "in order — one block-keyed aggregate, one anti-join against the " +
        "(small by construction) hot set, one doc-keyed reassembly aggregate"),

    Q("x29_bigram_lm",
      (s, dir) => TextAnalysis.bigramLogProb(col("doc_id"), col("text"),
        col("doc_id") % 2 === 0)(docs(s, dir)),
      // mirror of bigramLogProb: train slice doc_id % 2 = 0, stupid backoff
      // cb/c_prev for seen bigrams, 0.4 * add-1 unigram for unseen; docs
      // shorter than 2 tokens produce no bigrams and no row
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |pe AS (SELECT doc_id, pc.prev AS prev, pc.cur AS cur
             |       FROM (SELECT doc_id,
             |               unnest([struct_pack(prev := t[i], cur := t[i+1])
             |                       for i in range(1, len(t))]) AS pc
             |             FROM toks WHERE len(t) >= 2)),
             |c AS (SELECT term, count(*) AS c
             |      FROM (SELECT unnest(t) AS term FROM toks WHERE doc_id % 2 = 0)
             |      GROUP BY term),
             |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t_tokens,
             |               CAST(count(*) AS DOUBLE) AS vocab FROM c),
             |tb AS (SELECT prev, cur, count(*) AS cb FROM pe
             |       WHERE doc_id % 2 = 0 GROUP BY prev, cur),
             |cells AS (SELECT doc_id, prev, cur, count(*) AS tf FROM pe
             |          GROUP BY doc_id, prev, cur)
             |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             |       round(sum(tf * ln(CASE WHEN tb.cb IS NOT NULL
             |                   THEN CAST(tb.cb AS DOUBLE) / CAST(cp.c AS DOUBLE)
             |                   ELSE 0.4 * (coalesce(cc.c, 0) + 1.0) / (t_tokens + vocab) END))
             |             / sum(tf), 4) AS avg_logp
             |FROM cells
             |LEFT JOIN tb USING (prev, cur)
             |LEFT JOIN c cp ON cp.term = cells.prev
             |LEFT JOIN c cc ON cc.term = cells.cur
             |CROSS JOIN tot
             |GROUP BY doc_id""".stripMargin),
      "X3 bigram LM with stupid backoff (KenLM-shaped perplexity filter): " +
        "counts trained on the even-doc_id half, scored corpus-wide — seen " +
        "bigrams score cb/c_prev, unseen back off to the add-1 unigram; the " +
        "bigram stream collapses to (doc,prev,cur,tf) cells before the " +
        "count-keyed scoring joins"),

    Q("x37b_vocab_stats",
      // x37's data card extended with corpus-linguistics stats: per-source
      // vocabulary size and type-token ratio (Heaps-law style vocabulary
      // growth diagnostic — a source whose TTR collapses as it grows is
      // template/boilerplate-heavy). Two-phase distinct aggregate: the
      // token stream collapses to (source, term) cells map-side first
      (s, dir) => docs(s, dir)
        .select(col("source"), explode(Texts.tokens(col("text"))).as("term"))
        .groupBy(col("source"))
        .agg(countDistinct(col("term")).as("vocab"),
          count(lit(1)).as("total_tokens"))
        .select(col("source"), col("vocab"), col("total_tokens"),
          round(col("vocab").cast("double") / col("total_tokens"), 6).as("ttr")),
      Some("""SELECT source, count(DISTINCT term) AS vocab,
             |       count(*) AS total_tokens,
             |       round(CAST(count(DISTINCT term) AS DOUBLE) / count(*), 6) AS ttr
             |FROM (SELECT source, unnest(string_split(text, ' ')) AS term
             |      FROM documents)
             |GROUP BY source""".stripMargin),
      "X3 per-source vocabulary stats (vocab size, type-token ratio): the " +
        "Heaps-law vocabulary-growth diagnostic for the data card"),

    Q("x44_dsir_score",
      // src0 plays the in-domain seed set; every doc (target rows
      // included) gets the log-ratio score. Rounded to 4 decimals like
      // x12; rounding stability is MEASURED, not assumed: min distance of
      // any unrounded score to a round-4 boundary is 7.9e-8 at sf0.01,
      // ≥1e4× the ~1e-12 reassociation noise (RoundingMarginSpec gates it).
      // n_tokens must be CAST to BIGINT: DuckDB sum(BIGINT) is HUGEINT
      // (int128) and the driver hash-compares typed values (r7 verdict).
      (s, dir) => TextAnalysis.dsirScore(
        col("doc_id"), col("text"), col("source") === lit("src0"))(docs(s, dir)),
      Some("""WITH tok AS (SELECT doc_id, source = 'src0' AS tgt,
             |               unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, tgt, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
             |c AS (SELECT term, sum(tf) AS c,
             |        sum(CASE WHEN tgt THEN tf ELSE 0 END) AS ct
             |      FROM tf GROUP BY term),
             |t AS (SELECT CAST(sum(c) AS DOUBLE) AS t_all,
             |             CAST(sum(ct) AS DOUBLE) AS t_tgt,
             |             CAST(count(*) AS DOUBLE) AS vocab FROM c)
             |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             |       round(sum(CAST(tf AS DOUBLE)
             |               * (ln((CAST(ct AS DOUBLE) + 1.0) / (t_tgt + vocab))
             |                  - ln((CAST(c AS DOUBLE) + 1.0) / (t_all + vocab))))
             |             / CAST(sum(tf) AS DOUBLE), 4) AS dsir
             |FROM tf JOIN c USING (term) CROSS JOIN t
             |GROUP BY doc_id""".stripMargin),
      "X3 DSIR importance score: tf-weighted mean log-ratio of target-domain " +
        "vs corpus add-1 unigram LMs from one tokenize pass — the " +
        "importance-resampling ranking key for tilting a crawl toward a " +
        "domain given a small seed set"),

    Q("x45_token_entropy",
      // rounded to 4 decimals like x12/x44: Σ c·ln c accumulates in
      // engine-dependent order (row-local HashMap here, group aggregate
      // there) and ln differs by ulps across libm/JVM. Measured round-4
      // boundary margin: 3.4e-9 (sf0.001) / 8.4e-9 (sf0.01) — ≥1e3× the
      // ~1e-12 noise (RoundingMarginSpec gates it)
      (s, dir) => docs(s, dir).select(col("doc_id"),
        size(Texts.tokens(col("text"))).cast("long").as("n_tokens"),
        round(graft.functions.TokenEntropy(col("text")), 4).as("entropy")),
      // the LEFT JOIN back to documents keeps NULL-text rows (the engine
      // is row-preserving: one output row per doc, NULL metrics for NULL
      // text) — the bare explode form silently dropped them
      Some("""WITH tf AS (
             |  SELECT doc_id, term, count(*) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             |        FROM documents)
             |  GROUP BY 1, 2),
             |ag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |         round(ln(CAST(sum(c) AS DOUBLE))
             |               - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
             |                 / CAST(sum(c) AS DOUBLE), 4) AS entropy
             |       FROM tf GROUP BY doc_id)
             |SELECT d.doc_id, ag.n_tokens, ag.entropy
             |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin),
      "X3 token-distribution Shannon entropy per doc (information-density " +
        "quality signal) as a native codegen expression: one map-only pass " +
        "over the documents scan, zero shuffle — where the SQL form must " +
        "explode the corpus into tokens and aggregate it twice"),

    Q("x49_compression_ratio",
      // no SQL oracle can deflate — paired with the oracle-checked
      // x49_compression_check invariant twin (CheckQueries)
      (s, dir) => docs(s, dir).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        graft.functions.DeflateRatio(col("text")).as("ratio")),
      None,
      "X3 DEFLATE compression-ratio quality signal (Gopher-style " +
        "repetitiveness filter: LZ77 catches phrase/block repeats that " +
        "token entropy misses) — native codegen scalar over the scan, " +
        "zero shuffle, thread-local zlib state"),

    Q("x53_freq_spectrum",
      // frequency-of-frequencies: how many distinct terms occur exactly f
      // times in the corpus — the Good-Turing smoothing input and the
      // vocabulary-curve diagnostic (a fat f=1 head = long OOV tail; a
      // missing low-f band = template/boilerplate corpus). Two chained
      // hash aggregates, both map-side combined; the second runs over
      // |vocab| rows, not the corpus. All-integer (hash-safe).
      (s, dir) => docs(s, dir)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("f"))
        .groupBy("f").agg(count(lit(1)).as("n_terms"))
        .select(col("f"), col("n_terms")),
      Some("""SELECT f, count(*) AS n_terms
             |FROM (SELECT term, count(*) AS f
             |      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
             |      GROUP BY term)
             |GROUP BY f""".stripMargin),
      "X3 token frequency-of-frequencies spectrum (Good-Turing input, " +
        "vocabulary-curve diagnostic): two chained map-side-combined " +
        "aggregates, second pass over vocab grain only"),

    Q("x55_gopher_rules",
      // the published Gopher hard-gate rule set (word-count bounds, mean
      // word length band, symbol + alpha-word ratios, required-stopword
      // minimum) as 0/1 flags + conjunction; the stopword list is the
      // corpus's own (Texts.enStopwords) per the rule's "common words"
      // definition. Every rule a codegen'd expression over one scan.
      (s, dir) => TextAnalysis.gopherRules(
        col("doc_id"), col("text"), Texts.enStopwords)(docs(s, dir)),
      Some {
        s"""WITH t AS ($gopherStatsSql),
           |f AS (
           |  SELECT *,
           |    CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r_word_count,
           |    CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS r_mean_len,
           |    CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END AS r_alpha,
           |    CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS r_symbol,
           |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stop
           |  FROM t)
           |SELECT doc_id, n_words, mean_word_len, alpha_ratio, symbol_ratio,
           |       stop_hits, r_word_count, r_mean_len, r_alpha, r_symbol, r_stop,
           |       r_word_count * r_mean_len * r_alpha * r_symbol * r_stop AS pass
           |FROM f""".stripMargin
      },
      "X3 Gopher-style hard rule gate (Rae et al. 2021 A1.1): per-rule " +
        "0/1 flags + conjunction, every rule a plain codegen'd expression " +
        "over the single scan — the boolean pre-filter complement of " +
        "x4c's soft quality score; map-only, zero shuffle"),

    Q("x56_fertility",
      // tokenizer-fertility stats per source — the data-card measure of
      // tokenizer fit: BPE-ish subword tokens per whitespace word
      // (fertility ~1 = vocabulary matches the register; >>1 = the
      // tokenizer shreds this source) and chars per subword token
      // (compression). Integer sums per source (map-side combine over
      // |sources| keys), two IEEE divisions at the end — scan-bound at
      // any scale, same regex both engines.
      (s, dir) => docs(s, dir)
        .select(col("source"),
          size(Texts.bpeishTokens(col("text"))).cast("long").as("nb"),
          size(Texts.tokens(col("text"))).cast("long").as("nw"),
          length(col("text")).cast("long").as("nc"))
        .groupBy(col("source"))
        .agg(sum(col("nb")).as("n_bpeish"), sum(col("nw")).as("n_words"),
          sum(col("nc")).as("n_chars"))
        .select(col("source"), col("n_bpeish"), col("n_words"), col("n_chars"),
          round(col("n_bpeish").cast("double") / col("n_words"), 6).as("fertility"),
          round(col("n_chars").cast("double") / col("n_bpeish"), 6).as("chars_per_token")),
      Some("""SELECT source,
             |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))) AS BIGINT) AS n_bpeish,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
             |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |  round(CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))) AS DOUBLE)
             |    / sum(len(string_split(text, ' '))), 6) AS fertility,
             |  round(CAST(sum(length(text)) AS DOUBLE)
             |    / sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9 ]'))), 6) AS chars_per_token
             |FROM documents
             |GROUP BY source""".stripMargin),
      "X3 per-source tokenizer fertility (subword tokens per word, chars " +
        "per token) for the data card: x4e's pretokenizer counts rolled " +
        "up per source — integer sums, one tiny keyed aggregate")
  )
}
