package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.functions.L2Normalize
import graft.ops.{Classifier, Clustering, Dedup, Graph, Multimodal, Pca, Search, Similarity, TextAnalysis, Texts}
import graft.ExtensionQueries._

/** Mixture, sampling, ordering and packing catalog entries (the training-data composition surface), split from ExtensionQueries (r8 task #8). */
object XMixtureQueries {

  val all: Seq[Q] = Seq(

    Q("x6e_pack_sequences",
      (s, dir) => TextAnalysis.packSequences(col("doc_id"), col("text"),
        col("source"), 2048)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, source,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             |         md5(CAST(doc_id AS VARCHAR)) AS ord
             |       FROM documents),
             |o AS (SELECT doc_id, source, n_tokens,
             |        CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
             |      FROM t)
             |SELECT doc_id, source AS part, n_tokens, start_offset,
             |       CAST(floor(start_offset / 2048) AS BIGINT) AS bin
             |FROM o""".stripMargin),
      "X3 sequence packing: concat-and-chunk manifest (md5-deterministic " +
        "order, per-part running offsets, context-window bin)"),

    Q("x6f_repeat_mixture",
      (s, dir) => TextAnalysis.repeatByWeight(col("doc_id"), col("source"),
        Map("src0" -> 2.3, "src1" -> 1.0, "src2" -> 0.5, "src3" -> 3.0))(docs(s, dir)),
      Some {
        val t = TextAnalysis.rateThresholdHex _
        s"""WITH c AS (SELECT doc_id, source,
           |  CASE source
           |    WHEN 'src0' THEN CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':epoch') < '${t(0.3)}' THEN 3 ELSE 2 END
           |    WHEN 'src1' THEN 1
           |    WHEN 'src2' THEN CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':epoch') < '${t(0.5)}' THEN 1 ELSE 0 END
           |    WHEN 'src3' THEN 3
           |    ELSE 0 END AS n_copies
           |  FROM documents)
           |SELECT doc_id, source AS part, CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy
           |FROM c WHERE n_copies >= 1""".stripMargin
      },
      "X3 fractional epoch weighting: mixture spec -> physical training list " +
        "(floor(w) copies + md5-salted extra epoch), map-only"),

    Q("x19_token_mixture",
      (s, dir) => TextAnalysis.mixToTokenBudget(
          col("doc_id"), col("source"), size(Texts.tokens(col("text"))),
          Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2), 2000L)(docs(s, dir))
        .select(col("doc_id"), col("source")),
      Some("""WITH toks AS (
             |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
             |  FROM documents),
             |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total
             |        FROM toks GROUP BY 1),
             |tgt AS (SELECT * FROM (VALUES
             |          ('src1', CAST(0.5 AS DOUBLE)),
             |          ('src2', CAST(0.3 AS DOUBLE)),
             |          ('src3', CAST(0.2 AS DOUBLE))) t(source, w)),
             |rates AS (
             |  SELECT tot.source,
             |         CAST(2000 AS DOUBLE) * w / CAST(total AS DOUBLE) AS raw,
             |         CAST(floor(CAST(2000 AS DOUBLE) * w / CAST(total AS DOUBLE)
             |                    * 16777216) AS BIGINT) AS bucket
             |  FROM tot JOIN tgt ON tot.source = tgt.source)
             |SELECT d.doc_id, d.source
             |FROM toks d JOIN rates r ON d.source = r.source
             |WHERE r.raw >= 1.0
             |   OR (r.bucket > 0 AND
             |       md5(CAST(d.doc_id AS VARCHAR)) < lower(lpad(to_hex(r.bucket), 6, '0')))""".stripMargin),
      "X3 token-budget data mixture: per-source keep-rates from one stats pass " +
        "(budget*weight/total, floor-quantized to the md5 sampling grid), then a " +
        "deterministic map-only stratified sample — the corpus is never shuffled"),

    Q("x43_temperature_mix",
      // x19 with the weights DERIVED from the data: w_s = sqrt(tokens_s) /
      // sum sqrt(tokens) (temperature sampling at alpha = 0.5 — flattens
      // the skew so small sources are up-weighted relative to their
      // natural share). alpha = 0.5 on purpose: IEEE requires sqrt to be
      // correctly rounded, so Spark and DuckDB derive bit-identical
      // weights (pow(x, 0.7) carries no such guarantee, and a last-ulp
      // difference can flip the floor-quantized keep bucket); the z sum
      // is ORDER BY source on both sides for the same reason. Same plan
      // shape as x19: one K-row stats aggregate, then a map-only
      // deterministic keep filter; the corpus is never shuffled.
      (s, dir) => TextAnalysis.mixByTemperature(
          col("doc_id"), col("source"), size(Texts.tokens(col("text"))),
          0.5, 2000L)(docs(s, dir))
        .select(col("doc_id"), col("source")),
      Some("""WITH toks AS (
             |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
             |  FROM documents),
             |tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total
             |        FROM toks WHERE source IS NOT NULL
             |        GROUP BY 1 HAVING sum(n_tokens) > 0),
             |z AS (SELECT sum(sqrt(CAST(total AS DOUBLE)) ORDER BY source) AS z
             |      FROM tot),
             |rates AS (
             |  SELECT tot.source,
             |         CAST(2000 AS DOUBLE) * (sqrt(CAST(total AS DOUBLE)) / z.z)
             |           / CAST(total AS DOUBLE) AS raw,
             |         CAST(floor(CAST(2000 AS DOUBLE)
             |                    * (sqrt(CAST(total AS DOUBLE)) / z.z)
             |                    / CAST(total AS DOUBLE) * 16777216) AS BIGINT) AS bucket
             |  FROM tot, z)
             |SELECT d.doc_id, d.source
             |FROM toks d JOIN rates r ON d.source = r.source
             |WHERE r.raw >= 1.0
             |   OR (r.bucket > 0 AND
             |       md5(CAST(d.doc_id AS VARCHAR)) < lower(lpad(to_hex(r.bucket), 6, '0')))""".stripMargin),
      "X3 temperature-sampled data mixture: per-source weights tokens^alpha / " +
        "sum(tokens^alpha) from one stats pass, then the same deterministic " +
        "map-only stratified sample as x19 — zero corpus shuffle"),

    Q("x54_unimax_mixture",
      // UniMax (epoch-capped water-filling) over the LANG axis — the
      // skewed stratum in this corpus: budget = 1.5× total tokens at cap
      // 2 epochs takes every small language whole (2 copies each) and
      // water-fills the big one (en) with the remainder. The capped set
      // is decided in all-long arithmetic and the uncapped weight is two
      // IEEE divisions of exact longs, so both engines derive the same
      // md5-grid copy thresholds; the corpus pass is the same map-only
      // copy expansion as x6f.
      (s, dir) => TextAnalysis.mixByUnimax(
        col("doc_id"), col("lang"), size(Texts.tokens(col("text"))),
        maxEpochs = 2, budgetFraction = 1.5)(docs(s, dir)),
      Some(s"""WITH toks AS (SELECT doc_id, lang,
              |               len(string_split(text, ' ')) AS n_tokens FROM documents),
              |$unimaxChainCte
              |$unimaxSelect""".stripMargin),
      "X3 UniMax mixture: epoch-capped water-filling allocation — small " +
        "sources taken whole up to the epoch cap, the rest share the " +
        "remaining budget equally; all-long cap decision + fixed-order " +
        "IEEE divisions so both engines derive identical copy thresholds"),

    Q("x32_cluster_mixture",
      (s, dir) => {
        val m = trainedModel(s, dir)
        // one embedding-keyed join attaches each doc's semantic cluster
        // (codegen literal-argmax over the driver-held trained centers —
        // zero shuffle to assign), then the token-budget mixture routes on
        // cluster exactly as x19 routes on source
        // ingestion contract: a doc participates in the mixture only with
        // a well-formed embedding (assignable cluster) and non-NULL text
        // (countable token budget) — malformed rows cannot be routed
        val assigned = docs(s, dir).filter(col("text").isNotNull).join(
          Tables.embeddings(s, dir)
            .filter(graft.ops.Similarity.wellFormedVec(col("embedding")))
            .select(col("vec_id"),
              Clustering.assignTo(L2Normalize(col("embedding")), m)
                .cast("string").as("cluster")),
          col("doc_id") === col("vec_id"))
        val targets = m.centers.indices
          .map(i => i.toString -> 1.0 / m.centers.length).toMap
        TextAnalysis.mixToTokenBudget(col("doc_id"), col("cluster"),
          size(Texts.tokens(col("text"))), targets, 2000L)(assigned)
          .select(col("doc_id"), col("cluster").cast("int").as("cluster"))
      },
      None, // cluster assignments come from the driver-trained model;
            // invariants in x32_mixture_check
      "cluster-balanced token mixture (semantic diversity balancing): " +
        "uniform per-cluster token budgets over trained k-means assignments " +
        "— over-represented semantic clusters are down-sampled by the same " +
        "deterministic md5 routing as x19, so the training mix is balanced " +
        "by MEANING, not just by source label"),

    Q("x46_curriculum_order",
      // x18's tier oracle verbatim, plus the rank: best tier first,
      // seeded-hash shuffle inside each tier, dense 0-based position
      (s, dir) => TextAnalysis.curriculumOrder(
        col("doc_id"), col("text"), "cur")(docs(s, dir)),
      Some(s"""WITH sc AS (SELECT doc_id,
              |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.5
              |    + CAST(len(list_filter(toks, t -> t IN ${Texts.enStopwordsSql})) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.25
              |    + CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 0.05 AS quality
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
              |q AS (SELECT quantile_cont(quality, 0.25) AS q1,
              |             quantile_cont(quality, 0.5) AS q2,
              |             quantile_cont(quality, 0.75) AS q3 FROM sc),
              |t AS (SELECT doc_id,
              |        CAST(CASE WHEN quality < q1 THEN 0
              |                  WHEN quality < q2 THEN 1
              |                  WHEN quality < q3 THEN 2
              |                  ELSE 3 END AS INT) AS tier
              |      FROM sc CROSS JOIN q)
              |SELECT doc_id, tier,
              |       row_number() OVER (
              |         ORDER BY 3 - tier,
              |                  md5('cur:' || CAST(doc_id AS VARCHAR)),
              |                  doc_id) - 1 AS position
              |FROM t""".stripMargin),
      "X3 curriculum ordering: quality-tier-descending training order with " +
        "a deterministic seeded shuffle inside each tier, dense global " +
        "position via the range-partition rank play — no single-reducer " +
        "sort, reproducible across engines/runs/retries"),

    Q("x48_interleave_sources",
      (s, dir) => TextAnalysis.interleaveSources(
        col("doc_id"), col("source"), "il")(docs(s, dir)),
      // source IS NOT NULL mirrors the engine's null-stratum drop (a doc
      // with no source label has no round-robin lane)
      Some("""WITH t AS (SELECT doc_id, source,
             |            md5('il:' || CAST(doc_id AS VARCHAR)) AS h
             |          FROM documents WHERE source IS NOT NULL),
             |r AS (SELECT doc_id, source,
             |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1
             |          AS source_pos
             |      FROM t)
             |SELECT doc_id, source, source_pos,
             |       row_number() OVER (ORDER BY source_pos, source, doc_id) - 1
             |         AS position
             |FROM r""".stripMargin),
      "X3 source-interleaved training order: strict round-robin across " +
        "sources via two range-partition ranks and a |sources|-row offset " +
        "broadcast — no per-source window sort, no single-reducer stage"),

    Q("x47_fixed_sample",
      // exact-size uniform sample: the k lowest seeded doc hashes — the
      // deterministic way to carve a fixed-size eval/holdout set (x6c's
      // rate sampling gives binomial sizes; this gives EXACTLY k). Plans
      // as TakeOrderedAndProject: per-partition top-k then one k-row
      // merge, never a global sort
      (s, dir) => docs(s, dir)
        .select(col("doc_id"),
          md5(concat(lit("fs:"), col("doc_id").cast("string"))).as("h"))
        .orderBy(col("h"), col("doc_id")).limit(200),
      Some("""SELECT doc_id, md5('fs:' || CAST(doc_id AS VARCHAR)) AS h
             |FROM documents ORDER BY h, doc_id LIMIT 200""".stripMargin),
      "X3 deterministic exact-k uniform sample (k lowest seeded hashes): " +
        "fixed-size eval-set carving as a TakeOrdered top-k, no global sort"),

    Q("x58_source_sample",
      // fixed-size per-stratum carving: exactly k docs per source by the
      // seeded md5 order — the eval-set shape x6c (rate, binomial sizes)
      // and x47 (global k) don't give. Range-rank play, no per-source
      // window funnel.
      (s, dir) => TextAnalysis.samplePerSource(
        col("doc_id"), col("source"), "sE", 5)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, source,
             |            md5('sE:' || CAST(doc_id AS VARCHAR)) AS h
             |          FROM documents WHERE source IS NOT NULL),
             |r AS (SELECT doc_id, source,
             |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1
             |          AS source_pos
             |      FROM t)
             |SELECT doc_id, source, source_pos FROM r WHERE source_pos < 5""".stripMargin),
      "X3 per-source exact-k sample (fixed-size per-stratum eval carving, " +
        "seeded md5 order): per-source rank via the global range-rank + " +
        "|sources|-row offset broadcast — no row_number() OVER (PARTITION " +
        "BY source) hot-source funnel; exact window-form oracle"),

    Q("x6c_stratified_sample",
      (s, dir) => docs(s, dir)
        .filter(TextAnalysis.stratifiedSample(col("doc_id"), col("lang"),
          Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.25, "zh" -> 0.1)))
        .select(col("doc_id"), col("lang"), col("source")),
      Some {
        val t = TextAnalysis.rateThresholdHex _
        s"""SELECT doc_id, lang, source FROM documents
           |WHERE CASE lang
           |  WHEN 'en' THEN TRUE
           |  WHEN 'de' THEN md5(CAST(doc_id AS VARCHAR)) < '${t(0.5)}'
           |  WHEN 'fr' THEN md5(CAST(doc_id AS VARCHAR)) < '${t(0.5)}'
           |  WHEN 'es' THEN md5(CAST(doc_id AS VARCHAR)) < '${t(0.25)}'
           |  WHEN 'zh' THEN md5(CAST(doc_id AS VARCHAR)) < '${t(0.1)}'
           |  ELSE FALSE END""".stripMargin
      },
      "deterministic stratified sampling by language — the training-mixture reweighting primitive, identical routing both engines"),

    Q("x6d_cap_per_source",
      (s, dir) => graft.ops.Relational.capPerKey(col("source"), col("doc_id"), 10)(
          docs(s, dir))
        .select(col("key").as("source"), col("id").as("doc_id")),
      // the oracle's QUALIFY-rank spelling is the semantics; the Spark plan
      // is the bounded-aggregate form of the same selection
      Some("""SELECT source, doc_id FROM documents
             |QUALIFY row_number() OVER (PARTITION BY source
             |  ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) DESC, doc_id) <= 10""".stripMargin),
      "cap per-source cardinality at 10: deterministic survivors via the bounded top-k aggregate, no per-key window sort"),

    Q("x22_chunk_sliding",
      (s, dir) => TextAnalysis.chunkSliding(col("doc_id"), col("text"), 32, 24)(
        docs(s, dir)),
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
             |nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 1),
             |e AS (SELECT doc_id, t, n,
             |        unnest(range(0, CASE WHEN n <= 32 THEN 1
             |                             ELSE 1 + (n - 32 + 24 - 1) // 24 END)) AS k
             |      FROM nn)
             |SELECT doc_id, CAST(k AS INT) AS chunk_idx,
             |       array_to_string(t[CAST(k*24+1 AS INT):CAST(k*24+32 AS INT)], ' ')
             |         AS chunk_text,
             |       CAST(least(32, n - k*24) AS BIGINT) AS n_tokens
             |FROM e""".stripMargin),
      "X3 sliding-window chunking (RAG ingestion): overlapping 32-token " +
        "windows at stride 24, map-only explode sized by arithmetic, " +
        "slice/concat_ws reassembly — no shuffle"),

    Q("x39_length_batches",
      (s, dir) => TextAnalysis.lengthBatches(col("doc_id"), col("text"), 8)(
        docs(s, dir)),
      // NULLS FIRST pins DuckDB's rank order to Spark's ASC default for
      // the NULL-length (NULL-text) rows, which stay in the batch stream
      Some("""WITH t AS (SELECT doc_id,
             |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |          FROM documents)
             |SELECT doc_id, n_tokens,
             |       (row_number() OVER (ORDER BY n_tokens NULLS FIRST, doc_id) - 1) // 8 AS batch_id
             |FROM t""".stripMargin),
      "X3 length-bucketed inference batching (minimal padding waste): " +
        "batch_id = global (n_tokens, doc_id) rank div 8, computed WITHOUT " +
        "a single-reducer sort — range repartition + per-range local rank " +
        "+ driver prefix-summed |partitions|-sized offsets"),

    Q("x41_seeded_shuffle",
      (s, dir) => TextAnalysis.seededShuffle(col("doc_id"), "s42", 8)(
        docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id,
             |            md5('s42:' || CAST(doc_id AS VARCHAR)) AS h
             |          FROM documents),
             |r AS (SELECT doc_id,
             |        row_number() OVER (ORDER BY h, doc_id) - 1 AS p FROM t)
             |SELECT doc_id, p AS shuffle_pos, p % 8 AS shard,
             |       p // 8 AS shard_pos FROM r""".stripMargin),
      "deterministic seeded global shuffle for training-data ordering: " +
        "total order by md5(seed||id) with round-robin shard + " +
        "within-shard position — reproducible across engines/runs/" +
        "retries, ranked by the range-partition play (no single-reducer " +
        "sort, no RNG state)"),

    Q("x62_concat_chunks",
      // GPT-style concat-and-chunk: global token offsets via the
      // distributed prefix-sum (scan twin of the range-rank play), one
      // row per (doc, training sequence) span — long docs split across
      // sequence boundaries, every token lands exactly once. The oracle
      // states the single-reducer window form; the engine never plans it.
      (s, dir) => TextAnalysis.concatChunks(
        col("doc_id"), col("text"), seqLen = 512)(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n
             |          FROM documents
             |          WHERE len(string_split(text, ' ')) > 0),
             |sp AS (SELECT doc_id, n,
             |         CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS o
             |       FROM t),
             |e AS (SELECT doc_id, n, o,
             |        unnest(range(o // 512, (o + n - 1) // 512 + 1)) AS seq_id
             |      FROM sp)
             |SELECT doc_id, seq_id,
             |       CAST(greatest(0, seq_id * 512 - o) AS BIGINT) AS doc_tok_start,
             |       CAST(least((seq_id + 1) * 512, o + n)
             |            - greatest(seq_id * 512, o) AS BIGINT) AS n_toks
             |FROM e""".stripMargin),
      "X3 GPT-style concat-and-chunk packing (fixed 512-token training " +
        "sequences, docs split at boundaries): distributed prefix-sum " +
        "for the global token offset — no sum() OVER global window, no " +
        "single-reducer stage; map-only span emission after the scan"),

    Q("x62b_shuffled_chunks",
      // x62 in the epoch's actual training order: seeded-md5 document
      // permutation, then cut every 512 tokens — the layout a training
      // run streams; same prefix-sum plan, different total order
      (s, dir) => TextAnalysis.concatChunksShuffled(
        col("doc_id"), col("text"), seqLen = 512, seed = "e0")(docs(s, dir)),
      Some("""WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n,
             |            md5('e0:' || CAST(doc_id AS VARCHAR)) AS h
             |          FROM documents
             |          WHERE len(string_split(text, ' ')) > 0),
             |sp AS (SELECT doc_id, n,
             |         CAST(sum(n) OVER (ORDER BY h, doc_id) - n AS BIGINT) AS o
             |       FROM t),
             |e AS (SELECT doc_id, n, o,
             |        unnest(range(o // 512, (o + n - 1) // 512 + 1)) AS seq_id
             |      FROM sp)
             |SELECT doc_id, seq_id,
             |       CAST(greatest(0, seq_id * 512 - o) AS BIGINT) AS doc_tok_start,
             |       CAST(least((seq_id + 1) * 512, o + n)
             |            - greatest(seq_id * 512, o) AS BIGINT) AS n_toks
             |FROM e""".stripMargin),
      "X3 concat-and-chunk in the seeded epoch order (md5 permutation " +
        "before the cut): the layout a training run actually streams — " +
        "reproducible, new seed = new epoch; same distributed prefix-sum " +
        "plan as x62")
  )
}
