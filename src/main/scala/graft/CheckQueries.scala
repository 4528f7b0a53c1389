package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.functions.L2Normalize
import graft.ops.{Clustering, Dedup, Similarity, Texts}

/** Driver-visible invariants for the catalog's no-oracle queries (round-2
  * verdict "what's missing #3"): the hash/sketch-based operators (xxhash64
  * signatures, HLL/KLL sketches, hash-derived hyperplanes) cannot be
  * reproduced in DuckDB SQL, so their catalog entries are rows-only at the
  * driver. Each check query here closes that loop with an ORACLE-CHECKABLE
  * statement about the no-oracle result:
  *
  *  - completeness against an exact twin where the method guarantees it
  *    (MinHash-LSH recall at high Jaccard is ~certain: a pair at j >= 0.8
  *    shares a 4-row band with p = 1-(1-j^4)^16 > 0.9997);
  *  - precision re-verified through an INDEPENDENT implementation (the
  *    interpreted lambda-HOF twins of the native codegen'd expressions);
  *  - sketch error against the exact aggregate, within the tolerance the
  *    sketch's parameters promise.
  *
  * Every check emits deterministic columns only (exact-side values and
  * booleans that must be TRUE), so the driver's hash-compare turns a
  * broken invariant into a red row in CORRECTNESS_r{N}.json.
  */
object CheckQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.documents(s, dir)
  private def emb(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.embeddings(s, dir)

  val all: Seq[Q] = Seq(

    Q("o6_hll_check",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nparts"),
          approx_count_distinct(col("l_partkey")).as("approx"))
        .select(col("l_returnflag"), col("nparts"),
          (abs(col("approx") - col("nparts")).cast("double")
            / col("nparts").cast("double") <= 0.15).as("within_tol")),
      // HLL++ default rsd is 0.05; 0.15 = 3 sigma, so a green row means the
      // sketch behaves as parameterized, not that it got lucky
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nparts, TRUE AS within_tol
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "invariant for o6: HLL++ estimate within 3-sigma of the exact distinct count"),

    Q("o11b_sketch_check",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("est"))
        .select(col("l_returnflag"), col("median_qty"),
          (abs(col("est") - col("median_qty")) / col("median_qty") <= 0.05).as("within_tol")),
      Some("""SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty, TRUE AS within_tol
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "invariant for o11b: approx-percentile sketch within 5% of the exact median"),

    Q("x2b_lsh_recall_check",
      (s, dir) => {
        val d = docs(s, dir)
        // exact side rides the shared pair artifact (ExtensionQueries
        // .nearDupPairs memo) — same generator, same parameters
        val exact = ExtensionQueries.nearDupPairs(s, dir)
          .filter(col("jaccard") >= 0.8)
        val lsh = Dedup.minhashLshPairs(col("doc_id"), col("text"), 3, 16, 4, 0.3)(d)
        // every high-similarity exact pair must have been FOUND by LSH: a
        // missed pair is a missing output row → driver hash mismatch
        exact.join(lsh.select(col("a"), col("b")), Seq("a", "b"), "left_semi")
      },
      // oracle = the exact high-similarity pairs; completeness at j >= 0.8
      // is a method guarantee (16 bands x 4 rows: miss prob < 3e-4 per pair)
      Some(s"WITH ${ExtensionQueries.ngramPairsCte}\n" +
        "SELECT a, b, jaccard FROM jp WHERE jaccard >= 0.8"),
      "invariant for x2b: MinHash-LSH finds every exact near-dup pair with jaccard >= 0.8"),

    Q("x14b_bpe_check",
      (s, dir) => {
        // invariants for x14b's no-oracle tokenizer output, each per-doc
        // and folded to one row of must-be-TRUE booleans:
        //  (a) reconstruction — BPE merges never cross word boundaries, so
        //      concatenating the subword tokens is the text minus spaces;
        //  (b) bounds — one token per word at the merged end, one per
        //      character at the unmerged end: n_words <= n_bpe <= n_chars.
        val enc = graft.functions.BpeEncode(
          ExtensionQueries.trainedBpe(s, dir))(col("text"))
        docs(s, dir)
          .select(
            (concat_ws("", enc) === regexp_replace(col("text"), " ", ""))
              .as("recon"),
            // lower bound counts NON-EMPTY words: consecutive/leading/
            // trailing spaces split into empty words that (correctly)
            // produce no tokens, so the raw split length over-counts
            (size(filter(split(col("text"), " "), w => length(w) > 0)) <= size(enc) &&
              size(enc) <= length(col("text")) - (size(split(col("text"), " ")) - lit(1)))
              .as("bounded"))
          .agg(count(lit(1)).as("n_docs"),
            // violation COUNTS, not bool_and: the oracle pins them to
            // zero over the FULL corpus, and a red row says how many
            // documents broke, not just that one did
            sum(when(!col("recon"), 1L).otherwise(0L)).as("n_recon_viol"),
            sum(when(!col("bounded"), 1L).otherwise(0L)).as("n_bounds_viol"))
      },
      Some("SELECT count(*) AS n_docs, CAST(0 AS BIGINT) AS n_recon_viol, " +
        "CAST(0 AS BIGINT) AS n_bounds_viol FROM documents"),
      "invariant for x14b: corpus-wide round-trip — BPE tokens concatenate " +
        "back to the space-stripped text on EVERY document (violation count " +
        "pinned to 0), token counts between word and character counts"),

    Q("x23_lr_check",
      (s, dir) => {
        // invariants for the trained (no-oracle) classifier: gradient
        // descent actually descended (final mean log-loss below the
        // all-zero model's ln 2 start), and the learned scores separate
        // the teacher classes (mean z of positives above negatives; NULL
        // if a class is empty → red row, catching degenerate labels too).
        val m = ExtensionQueries.trainedLr(s, dir)
        val q = graft.ops.TextAnalysis.qualityScore(col("doc_id"), col("text"))(docs(s, dir))
        val z = graft.ops.Classifier.linearScore(
          Seq(col("diversity"), col("stop_ratio"), col("mean_token_len")),
          m.weights.toSeq)
        q.select(z.as("z"), (col("quality") >= 0.47).as("y"))
          .agg(count(lit(1)).as("n_docs"),
            lit(m.lossTrace.last < m.lossTrace.head - 1e-3).as("loss_decreased"),
            (avg(when(col("y"), col("z"))) > avg(when(!col("y"), col("z"))))
              .as("separated"))
      },
      Some("SELECT count(*) AS n_docs, TRUE AS loss_decreased, TRUE AS separated FROM documents"),
      "invariant for x23: trained log-loss beats the zero model and the " +
        "learned scores separate the teacher classes"),

    Q("x24_pagerank_check",
      (s, dir) => {
        // invariants for the no-oracle rank vector: (a) the node set is
        // exactly the SQL-countable co-purchase participants; (b) the
        // sum-preserving formulation holds (ranks sum to |V| within float
        // accumulation noise); (c) every rank carries at least the
        // teleport floor (1-d).
        val ranks = ExtensionQueries.pagerankRanks(s, dir)
        ranks.agg(count(lit(1)).as("n_nodes"),
          (abs(sum(col("rank")) - count(lit(1)).cast("double"))
            / count(lit(1)).cast("double") < 1e-9).as("sum_preserved"),
          (min(col("rank")) >= lit(0.15) - lit(1e-9)).as("floor_ok"))
      },
      Some("""SELECT count(DISTINCT l_partkey) AS n_nodes, TRUE AS sum_preserved, TRUE AS floor_ok
             |FROM lineitem WHERE l_orderkey IN (
             |  SELECT l_orderkey FROM lineitem
             |  GROUP BY l_orderkey HAVING count(DISTINCT l_partkey) >= 2)""".stripMargin),
      "invariant for x24: rank mass conserved at |V|, teleport floor held, " +
        "node set equals the SQL-derived co-purchase participants"),

    Q("x21b_lsh_incr_check",
      (s, dir) => {
        // signatures are a pure function of the shingle set, so the
        // incremental path must equal the FULL-corpus LSH restricted to
        // pairs touching the ingest batch — set equality asserted both
        // ways with exceptAll (jaccard compares bit-exactly: both
        // pipelines compute the same integer division). A dual-pipeline
        // check by construction, like x2b.
        val d = docs(s, dir)
        val corpus = d.filter(col("doc_id") < 400)
        // BOTH pair sets are materialized (localCheckpoint) before the
        // set-equality algebra below: exceptAll evaluates each input per
        // occurrence, and `incr`/`full` each appear twice — without the
        // checkpoint the two full LSH pipelines (64-minhash signatures,
        // bucket self-joins, exact-verify joins) re-run FOUR times inside
        // one mega-plan (measured 144 s at sf0.001). The pair sets
        // themselves are tiny (dozens of rows), so the checkpoint is the
        // honest cost: one evaluation of each pipeline.
        // one materialized corpus shingle table feeds both derivatives —
        // same construction as the x21b entry (optimization r12)
        val corpusSh = Dedup.shingleTable(col("doc_id"), col("text"), 3)(corpus)
          .localCheckpoint()
        val incr = Dedup.minhashLshIncremental(col("doc_id"), col("text"), 3, 16, 4, 0.3,
            Dedup.lshIndexFromShingles(corpusSh, 16, 4), corpusSh)(
            d.filter(col("doc_id") >= 400))
          .select(least(col("a"), col("b")).as("a"),
            greatest(col("a"), col("b")).as("b"), col("jaccard"))
          .localCheckpoint()
        // full pairs are (a < b), and batch ids are the id-range top, so
        // "touches the batch" is exactly b >= 400
        val full = Dedup.minhashLshPairs(col("doc_id"), col("text"), 3, 16, 4, 0.3)(d)
          .filter(col("b") >= 400)
          .localCheckpoint()
        val onlyIncr = incr.exceptAll(full).agg(count(lit(1)).as("c1"))
        val onlyFull = full.exceptAll(incr).agg(count(lit(1)).as("c2"))
        d.filter(col("doc_id") >= 400).agg(count(lit(1)).as("n_new"))
          .crossJoin(onlyIncr).crossJoin(onlyFull)
          .select(col("n_new"),
            (col("c1") === 0 && col("c2") === 0).as("incr_eq_full"))
      },
      Some("SELECT count(*) AS n_new, TRUE AS incr_eq_full FROM documents WHERE doc_id >= 400"),
      "invariant for x21b: the incremental LSH result equals the " +
        "full-corpus LSH restricted to pairs touching the ingest batch"),

    Q("x2c_simhash_check",
      (s, dir) => {
        // differential: the corpus-scale codegen'd aggregate path must equal
        // the interpreted scalar twin, on a FIXED-SIZE id slice — the twin
        // is 64 interpreted passes per row, so the check's cost must be
        // constant in corpus size (a fractional slice would scale with it).
        // Within the slice, a deterministic md5 thinning (~1/5, ≤ ~1k docs)
        // bounds the twin's cost: a differential pins a kernel bug with a
        // sample; it does not need the full corpus (the oracle pins the
        // sampled count, so the check cannot silently go empty)
        val sub = docs(s, dir).filter(col("doc_id") < 5000 &&
          substring(md5(col("doc_id").cast("string")), 1, 2) < "34")
        val fast = Dedup.simhashByDoc(col("doc_id"), col("text"))(sub)
        val slow = sub.select(col("doc_id").as("id2"),
            split(col("text"), " ").as("toks"))
          .select(col("id2"), Dedup.simhash("toks").as("fp2"))
        fast.join(slow, col("id") === col("id2"))
          .agg(
            count(lit(1)).as("n_checked"),
            sum(when(col("simhash") =!= col("fp2"), 1L).otherwise(0L))
              .as("n_mismatch"))
      },
      // text IS NOT NULL: a NULL-text doc has no token stream to hash —
      // the explode path drops it, so the pinned count must too
      Some("SELECT count(*) AS n_checked, CAST(0 AS BIGINT) AS n_mismatch " +
        "FROM documents WHERE doc_id < 5000 AND text IS NOT NULL " +
        "AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '34'"),
      "invariant for x2c: codegen'd simhash aggregate equals the interpreted " +
        "scalar twin on every slice doc (mismatch count pinned to 0, and the " +
        "oracle pins the slice size so an empty check cannot pass silently)"),

    Q("x2d_simhash_check",
      (s, dir) => {
        val d = docs(s, dir)
        val pairs = Dedup.simhashPairs(col("doc_id"), col("text"), 3)(d)
        val toks = d.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("toks"))
        val inter = size(array_intersect(col("ta"), col("tb")))
        // simhash is token-frequency LSH: pairs at Hamming <= 3 are
        // near-dups of the WEIGHTED token profile, which only
        // probabilistically implies token-SET Jaccard — the sf1 DevSynth
        // rehearsal produced 12/2272 legitimate Hamming<=3 pairs at
        // uni_j < 0.5 (near-twins with every 2nd token re-tagged share
        // half their token set but almost all of their frequency shape),
        // so the invariant is the RATE bound that still catches an
        // implementation bug: random-doc bucketing drives the rate to
        // ~1, real simhash precision keeps it within a few percent
        // (driver fixtures 0/17, sf1 rehearsal 0.53%)
        pairs
          .join(toks.select(col("doc_id").as("a"), col("toks").as("ta")), "a")
          .join(toks.select(col("doc_id").as("b"), col("toks").as("tb")), "b")
          .select((inter.cast("double")
            / (size(col("ta")) + size(col("tb")) - inter).cast("double")).as("uni_j"))
          .agg(
            (count(lit(1)) > 0).as("found_pairs"),
            coalesce(
              sum(when(col("uni_j") < 0.5, 1.0).otherwise(0.0)) / count(lit(1))
                <= 0.02,
              lit(true)).as("false_rate_bounded"))
      },
      Some("SELECT TRUE AS found_pairs, TRUE AS false_rate_bounded"),
      "invariant for x2d: simhash Hamming<=3 pairs are unigram-Jaccard " +
        "near-dups up to the method's probabilistic precision — false-pair " +
        "rate bounded at 2% (a bucketing bug pairs random docs and drives " +
        "the rate to ~1; found at the sf1 rehearsal, where the old " +
        "zero-count form overfit the driver corpus)"),

    Q("x3c_ann_check",
      (s, dir) => {
        val e = emb(s, dir)
        val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        // hit set is k·|queries| rows BY CONSTRUCTION (bounded TopK) — a
        // bound the planner cannot estimate through the aggregate, so the
        // corpus join-back is hinted: corpus STREAMS map-only against the
        // broadcast hits instead of being shuffled by id (optimization
        // r12; checkpointed so verify + both mono sides evaluate the ANN
        // pipeline once)
        val ann = Similarity.hyperplaneTopK(corpus, queries, 4, 64, 3)
          .localCheckpoint()
        // (a) every emitted sim re-verified through the interpreted HOF twin
        val verified = corpus.select(col("id"), col("vec").as("cvec"))
          .join(broadcast(ann), "id")
          .join(broadcast(queries.select(col("qid"), col("qvec").as("qv"))), "qid")
          .agg(
            coalesce(bool_and(
              abs(col("sim") - Similarity.cosineHof(col("qv"), col("cvec"))) < 1e-9),
              lit(true)).as("sims_exact"),
            (count(lit(1)) > 0).as("found_hits"))
        // (b) ranks are consecutive and ordered by (sim DESC, id ASC)
        val l = ann.select(col("qid"), col("rank"), col("sim"), col("id"))
        val mono = l.as("x")
          .join(l.as("y"),
            col("x.qid") === col("y.qid") && col("x.rank") + 1 === col("y.rank"))
          .agg(coalesce(bool_and(col("x.sim") > col("y.sim") ||
            (col("x.sim") === col("y.sim") && col("x.id") < col("y.id"))),
            lit(true)).as("ranks_monotone"))
        verified.crossJoin(mono)
      },
      Some("SELECT TRUE AS sims_exact, TRUE AS found_hits, TRUE AS ranks_monotone"),
      "invariant for x3c: ANN sims re-verified via the interpreted twin; ranking well-formed"),

    Q("x3e_pq_check",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val cbs = ExtensionQueries.pqCodebooks(s, dir)
        // hit set is k·|queries| rows by construction; localCheckpoint
        // gives the planner its EXACT size so the corpus join-back builds
        // the tiny hit side from real statistics at every SF (see
        // x3c_ann_check)
        val ann = Similarity.pqTopK(corpus, queries, cbs, 3).localCheckpoint()
        // every emitted sim re-verified: the interpreted HOF cosine of the
        // query against the independently re-encoded + reconstructed
        // corpus vector must equal the native-pipeline score
        corpus.select(col("id"), col("vec").as("cvec"))
          .join(ann, "id")
          .join(broadcast(queries.select(col("qid"), col("qvec").as("qv"))), "qid")
          .agg(
            coalesce(bool_and(abs(col("sim") -
              Similarity.cosineHof(col("qv"),
                Similarity.pqReconstruct(
                  Similarity.pqEncode(col("cvec"), cbs), cbs))) < 1e-6),
              lit(true)).as("sims_exact"),
            (count(lit(1)) > 0).as("found_hits"))
      },
      Some("SELECT TRUE AS sims_exact, TRUE AS found_hits"),
      "invariant for x3e: PQ scores re-verified via interpreted re-encode + reconstruct"),

    Q("x3d_embdup_check",
      (s, dir) => {
        val corpus = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
        val pairs = Similarity.embeddingDupPairs(corpus, 0, 64, 0.35, bands = 2)
        pairs
          .join(corpus.select(col("id").as("a"), col("vec").as("va")), "a")
          .join(corpus.select(col("id").as("b"), col("vec").as("vb")), "b")
          .agg(
            coalesce(bool_and(col("cos") >= 0.35 &&
              abs(col("cos") - Similarity.cosineHof(col("va"), col("vb"))) < 1e-9),
              lit(true)).as("pairs_verified"),
            (count(lit(1)) > 0).as("found_pairs"))
      },
      Some("SELECT TRUE AS pairs_verified, TRUE AS found_pairs"),
      "invariant for x3d: every emitted near-dup pair's cosine re-verified via the interpreted twin"),

    Q("x7_kmeans_check",
      (s, dir) => {
        val m = ExtensionQueries.trainedModel(s, dir)
        // (a) in-plan differential: the codegen'd DotProduct sims the
        // trainer assigns by must match the interpreted HOF cosine twin,
        // and the chosen center must be an argmax under the TWIN's scores
        val interp = array(m.centers.map(c =>
          Similarity.cosineHof(col("unit"), typedlit(c))): _*)
        val inPlan = emb(s, dir)
          // the trainer's ingestion contract: malformed vectors are not
          // part of the trained population and carry no angle to check
          .filter(Similarity.wellFormedVec(col("embedding")))
          .select(col("vec_id"), L2Normalize(col("embedding")).as("unit"))
          .withColumn("sims", Clustering.simsToCenters(col("unit"), m.centers))
          .withColumn("isims", interp)
          .withColumn("cid",
            (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"))
          .agg(
            coalesce(bool_and(
              abs(array_max(col("isims")) - array_max(col("sims"))) < 1e-9),
              lit(true)).as("sims_exact"),
            coalesce(bool_and(
              element_at(col("isims"), col("cid") + 1)
                >= array_max(col("isims")) - lit(1e-9)),
              lit(true)).as("assigned_argmax"),
            (count(lit(1)) > 0).as("checked_some"))
        // (b) Lloyd's invariants measured during training: the spherical
        // k-means objective (mean cosine to assigned center) must be
        // non-decreasing across rounds, and every center unit-norm
        val objMono = m.objective.sliding(2).forall {
          case Seq(a, b) => b >= a - 1e-9
          case _         => true
        }
        val unitNorm = m.centers.forall(c =>
          math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
        inPlan
          .withColumn("obj_nondecreasing", lit(objMono))
          .withColumn("centers_unit", lit(unitNorm))
      },
      Some("SELECT TRUE AS sims_exact, TRUE AS assigned_argmax, TRUE AS checked_some, " +
        "TRUE AS obj_nondecreasing, TRUE AS centers_unit"),
      "invariant for x7: assignment is argmax under the interpreted twin; " +
        "objective non-decreasing across Lloyd's rounds; centers unit-norm"),

    Q("x3f_ann_check",
      (s, dir) => {
        val e = emb(s, dir)
        val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val centroids = Clustering.centroidsDf(s,
          ExtensionQueries.trainedModel(s, dir))
        // k·|queries|-bounded hits: checkpoint once (verify + both mono
        // sides), broadcast into the corpus join-back (see x3c_ann_check)
        val ann = Similarity.ivfTopK(corpus, queries, centroids, 3)
          .localCheckpoint()
        val verified = corpus.select(col("id"), col("vec").as("cvec"))
          .join(broadcast(ann), "id")
          .join(broadcast(queries.select(col("qid"), col("qvec").as("qv"))), "qid")
          .agg(
            coalesce(bool_and(
              abs(col("sim") - Similarity.cosineHof(col("qv"), col("cvec"))) < 1e-9),
              lit(true)).as("sims_exact"),
            (count(lit(1)) > 0).as("found_hits"))
        val l = ann.select(col("qid"), col("rank"), col("sim"), col("id"))
        val mono = l.as("x")
          .join(l.as("y"),
            col("x.qid") === col("y.qid") && col("x.rank") + 1 === col("y.rank"))
          .agg(coalesce(bool_and(col("x.sim") > col("y.sim") ||
            (col("x.sim") === col("y.sim") && col("x.id") < col("y.id"))),
            lit(true)).as("ranks_monotone"))
        verified.crossJoin(mono)
      },
      Some("SELECT TRUE AS sims_exact, TRUE AS found_hits, TRUE AS ranks_monotone"),
      "invariant for x3f: trained-IVF sims re-verified via the interpreted twin; ranking well-formed"),

    Q("x3g_pq_check",
      (s, dir) => {
        val e = emb(s, dir)
        val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val cbs = ExtensionQueries.trainedPqCodebooks(s, dir)
        // trained codebooks are well-formed: every entry unit-norm (the
        // spherical trainer's contract), correct shape
        val shapeOk = cbs.length == 4 && cbs.forall(cb =>
          cb.nonEmpty && cb.forall(en => en.length == 16 &&
            math.abs(math.sqrt(en.map(x => x.toDouble * x).sum) - 1.0) < 1e-6))
        // checkpointed k·|queries|-bounded hits (see x3e_pq_check)
        val ann = Similarity.pqTopK(corpus, queries, cbs, 3).localCheckpoint()
        // every emitted sim re-verified through interpreted re-encode +
        // reconstruct, as in x3e_pq_check but against the TRAINED books
        corpus.select(col("id"), col("vec").as("cvec"))
          .join(ann, "id")
          .join(broadcast(queries.select(col("qid"), col("qvec").as("qv"))), "qid")
          .agg(
            coalesce(bool_and(abs(col("sim") -
              Similarity.cosineHof(col("qv"),
                Similarity.pqReconstruct(
                  Similarity.pqEncode(col("cvec"), cbs), cbs))) < 1e-6),
              lit(true)).as("sims_exact"),
            (count(lit(1)) > 0).as("found_hits"))
          .withColumn("codebooks_wellformed", lit(shapeOk))
      },
      Some("SELECT TRUE AS sims_exact, TRUE AS found_hits, TRUE AS codebooks_wellformed"),
      "invariant for x3g: trained-PQ scores re-verified via interpreted " +
        "re-encode + reconstruct; codebook entries unit-norm"),

    Q("x11_semdedup_check",
      (s, dir) => {
        val corpus = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
        val res = Similarity.semDedup(corpus,
          ExtensionQueries.semdedupModel(s, dir).centers, 0.35)
        // all within-cluster (a < b) pairs, cosine recomputed through a
        // DIFFERENT implementation than the op's L2Normalize∘DotProduct:
        // the fused native CosineSimilarity (single-pass dot/(|a||b|),
        // different arithmetic order). Its own equivalence to the
        // interpreted HOF twin is pinned bit-exactly in SimilaritySpec —
        // an interpreted twin here would evaluate ~|cluster|² pairs
        // row-by-row (7+ s at sf0.1, 15× the codegen cost). The two
        // rounding paths straddling the 0.35 threshold is excluded
        // empirically: the nearest ALL-pairs cosine sits 1.2e-6 from
        // 0.35 at sf0.1 (2.9e-5 at sf0.01) — nine orders above
        // cross-implementation double noise (same argument as x16).
        val v = res.join(emb(s, dir), "vec_id")
          .select(col("vec_id"), col("cid"), col("dropped"), col("embedding"))
        val pairs = v.as("l")
          .join(v.as("r"), col("l.cid") === col("r.cid")
            && col("l.vec_id") < col("r.vec_id"))
          .select(col("r.vec_id").as("b"), col("r.dropped").as("b_drop"),
            Similarity.cosine(col("l.embedding"), col("r.embedding")).as("cos"))
        // (a) completeness: every vector with a lower-id cluster-mate above
        // the radius IS dropped (this also implies survivors are pairwise
        // far apart); (b) soundness: every dropped vector HAS one
        val complete = pairs.agg(
          coalesce(bool_and(!(col("cos") > 0.35) || col("b_drop")), lit(true))
            .as("drops_complete"))
        val justified = res.filter(col("dropped")).select(col("vec_id"))
          .join(pairs.filter(col("cos") > 0.35)
            .select(col("b").as("vec_id")).distinct(), Seq("vec_id"), "left_anti")
          .agg((count(lit(1)) === 0).as("drops_justified"))
        val total = res.agg(count(lit(1)).as("n_total"))
        total.crossJoin(complete).crossJoin(justified)
      },
      Some("SELECT count(*) AS n_total, TRUE AS drops_complete, TRUE AS drops_justified " +
        "FROM embeddings WHERE len(embedding) > 0 AND list_sum(list_transform(embedding, x -> x*x)) > 0"),
      "invariant for x11: the SemDeDup keep/drop rule re-verified pairwise " +
        "via the interpreted cosine twin — drops complete and justified"),

    Q("x28_pca_check",
      (s, dir) => {
        // the spectral contract of the x28 model, checked on the REAL
        // projected corpus: variance along axis i equals eigenvalue i
        // (population variance — the fit divides by n), projections are
        // centered, and the driver-held model is orthonormal with
        // descending spectrum (planner-side data, like k-means centers,
        // so those two are checked on the driver and emitted as the
        // plan's literals — a broken model flips them to FALSE)
        val m = ExtensionQueries.pcaModel(s, dir)
        val orthonormal = m.components.indices.forall { i =>
          m.components.indices.forall { j =>
            val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
            math.abs(dot - (if (i == j) 1.0 else 0.0)) <= 1e-9
          }
        }
        val descending = m.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12)
        val proj = emb(s, dir)
          // match the fit population: Pca.fit's posexplode drops NULL and
          // empty vectors, so the spectrum covers exactly these rows
          .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
          .select(graft.ops.Pca.project(col("embedding"), m, 4).as("p"))
        proj.agg(
          (0 until 4).map(i =>
            (abs(var_pop(element_at(col("p"), i + 1)) - lit(m.eigenvalues(i)))
              <= lit(1e-6) * lit(m.eigenvalues(i))).as(s"v$i")).reduce(_ && _)
            .as("variance_matches_spectrum"),
          (0 until 4).map(i =>
            (abs(avg(element_at(col("p"), i + 1))) <= lit(1e-6)).as(s"m$i"))
            .reduce(_ && _).as("projections_centered"))
          .select(col("variance_matches_spectrum"), col("projections_centered"),
            lit(orthonormal).as("components_orthonormal"),
            lit(descending).as("spectrum_descending"))
      },
      Some("SELECT TRUE AS variance_matches_spectrum, TRUE AS projections_centered, " +
        "TRUE AS components_orthonormal, TRUE AS spectrum_descending"),
      "invariant for x28: projected per-axis population variance equals the " +
        "model's eigenvalues, projections centered, components orthonormal, " +
        "spectrum descending"),

    Q("x32_mixture_check",
      (s, dir) => {
        // dual-derivation of x32's keep set through an INDEPENDENT
        // formulation of the md5 routing rule: the operator compares the
        // full 32-hex md5 STRING against a 6-hex threshold (lexicographic;
        // a 32-char string whose prefix equals the threshold sorts above
        // it, so prefix == threshold is excluded), the twin PARSES the
        // 6-hex prefix to a number and compares against floor(rate * 2^24)
        // (prefix == bucket excluded by <) — equal rules iff both
        // implementations are right. Assignments and rates are shared
        // deterministic inputs; the RULE is what is derived twice.
        val m = ExtensionQueries.trainedModel(s, dir)
        // same ingestion contract as the operator under test: only docs
        // with a well-formed embedding and non-NULL text are routable
        val assigned = docs(s, dir).filter(col("text").isNotNull).join(
          emb(s, dir)
            .filter(graft.ops.Similarity.wellFormedVec(col("embedding")))
            .select(col("vec_id"),
              Clustering.assignTo(L2Normalize(col("embedding")), m)
                .cast("string").as("cluster")),
          col("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("cluster"),
            size(graft.ops.Texts.tokens(col("text"))).as("n_tok"))
          .localCheckpoint() // one evaluation feeds totals + twin filter
        val totals = assigned.groupBy(col("cluster"))
          .agg(sum(col("n_tok").cast("long")).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val targets = m.centers.indices
          .map(i => i.toString -> 1.0 / m.centers.length).toMap
        val rates = graft.ops.TextAnalysis.mixtureRates(totals, targets, 2000L)
        val prefixVal =
          conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
            .cast("long")
        val twinKeep = rates.toSeq.sortBy(_._1).foldLeft(lit(false)) {
          case (acc, (st, r)) =>
            val keep =
              if (r >= 1.0) lit(true)
              else if (r <= 0.0) lit(false)
              else prefixVal < lit(math.floor(r * 0x1000000).toLong)
            when(col("cluster") === st, keep).otherwise(acc)
        }
        val twin = assigned.filter(twinKeep)
          .select(col("doc_id"), col("cluster").cast("int").as("cluster"))
        val main = Queries.queries("x32_cluster_mixture")(s, dir)
          .localCheckpoint()
        val onlyMain = main.exceptAll(twin).agg(count(lit(1)).as("c1"))
        val onlyTwin = twin.exceptAll(main).agg(count(lit(1)).as("c2"))
        main.agg(count(lit(1)).as("n_kept")).crossJoin(onlyMain)
          .crossJoin(onlyTwin)
          .select((col("c1") === 0 && col("c2") === 0).as("rule_twin_agrees"),
            (col("n_kept") > 0).as("kept_nonempty"))
      },
      Some("SELECT TRUE AS rule_twin_agrees, TRUE AS kept_nonempty"),
      "invariant for x32: the md5 keep rule re-derived numerically " +
        "(parsed 6-hex prefix vs floor(rate*2^24)) selects exactly the " +
        "operator's string-compared keep set, and the mixture is non-empty"),

    Q("x33_ivfpq_check",
      (s, dir) => {
        val e = emb(s, dir)
        val corpus = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
        val queries = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val m = ExtensionQueries.trainedModel(s, dir)
        val cbs = ExtensionQueries.trainedPqCodebooks(s, dir)
        val nprobe = 2
        // checkpointed k·|queries|-bounded hits (see x3e_pq_check)
        val ann = Similarity.ivfPqTopK(corpus, queries,
          Clustering.centroidsDf(s, m), cbs, 3, nprobe).localCheckpoint()
        // interpreted per-center sims of a vector (cosineHof twin of the
        // native expression the operator routes with — bit-identical fold)
        def centerSims(vec: org.apache.spark.sql.Column) =
          array(m.centers.map(c => Similarity.cosineHof(vec, typedlit(c))): _*)
        corpus.select(col("id"), col("vec").as("cvec"))
          .join(ann, "id")
          .join(broadcast(queries.select(col("qid"), col("qvec").as("qv"))), "qid")
          // hit's bucket re-derived: argmax (first index on ties) of the
          // interpreted centroid sims of the CANDIDATE vector
          .withColumn("csims", centerSims(col("cvec")))
          .withColumn("qsims", centerSims(col("qv")))
          .agg(
            // every emitted sim is the interpreted re-encode + reconstruct
            // score — PQ arithmetic independently re-derived
            coalesce(bool_and(abs(col("sim") -
              Similarity.cosineHof(col("qv"),
                Similarity.pqReconstruct(
                  Similarity.pqEncode(col("cvec"), cbs), cbs))) < 1e-6),
              lit(true)).as("sims_exact"),
            // routing: the candidate's bucket centroid scores at least the
            // query's nprobe-th best centroid sim — i.e. the hit came from
            // a probed bucket (ties at the boundary accepted, matching the
            // operator's deterministic cid tiebreak)
            coalesce(bool_and(
              element_at(col("qsims"),
                array_position(col("csims"), array_max(col("csims"))).cast("int"))
                >= element_at(sort_array(col("qsims"), asc = false), nprobe)),
              lit(true)).as("routing_probed"),
            (count(lit(1)) > 0).as("found_hits"))
      },
      Some("SELECT TRUE AS sims_exact, TRUE AS routing_probed, TRUE AS found_hits"),
      "invariant for x33: IVF-PQ scores re-verified via interpreted " +
        "re-encode + reconstruct, and every hit's bucket is within the " +
        "query's nprobe best centroids (routing honored)"),

    Q("x36_knn_check",
      (s, dir) => {
        val corpus = emb(s, dir)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val g = Similarity.knnGraph(corpus, nBits = 0, dim = 64, k = 3, bands = 2)
          .localCheckpoint() // one evaluation feeds all three invariants
        // every edge's sim re-verified against the interpreted cosine of
        // the ACTUAL endpoint vectors (the exact-precision twin)
        val simsOk = g
          .join(corpus.select(col("id").as("src"), col("vec").as("sv")), Seq("src"))
          .join(corpus.select(col("id").as("dst"), col("vec").as("dv")), Seq("dst"))
          .agg(
            coalesce(bool_and(abs(col("sim") -
              Similarity.cosineHof(col("sv"), col("dv"))) < 1e-9), lit(true))
              .as("sims_exact"),
            coalesce(bool_and(col("src") =!= col("dst")), lit(true)).as("no_self_edges"),
            (count(lit(1)) > 0).as("found_edges"))
        val degOk = g.groupBy(col("src"))
          .agg(count(lit(1)).as("deg"), max(col("rank")).as("maxr"))
          .agg(coalesce(bool_and(col("deg") <= 3 && col("maxr") === col("deg")),
            lit(true)).as("degree_bounded"))
        val mono = g.as("x")
          .join(g.as("y"),
            col("x.src") === col("y.src") && col("x.rank") + 1 === col("y.rank"))
          .agg(coalesce(bool_and(col("x.sim") > col("y.sim") ||
            (col("x.sim") === col("y.sim") && col("x.dst") < col("y.dst"))),
            lit(true)).as("ranks_monotone"))
        simsOk.crossJoin(degOk).crossJoin(mono)
      },
      Some("SELECT TRUE AS sims_exact, TRUE AS no_self_edges, " +
        "TRUE AS found_edges, TRUE AS degree_bounded, TRUE AS ranks_monotone"),
      "invariant for x36: every graph edge's sim equals the interpreted " +
        "cosine of its endpoints, no self loops, out-degree <= k with " +
        "dense ranks, ranking monotone"),

    Q("x49_compression_check",
      (s, dir) => {
        // the ratio is a pure function of the text bytes: (1) defined and
        // in (0, 1.2] for every non-trivial doc (raw-deflate overhead is
        // <= ~11 bytes, so >= 64-byte docs cannot exceed 1.2; fixture docs
        // are far longer); (2) deterministic — re-evaluating through a
        // value-identical but tree-distinct input (reverse∘reverse blocks
        // subexpression merging) must give bit-equal ratios
        val r = docs(s, dir).select(col("doc_id"), length(col("text")).as("len"),
          graft.functions.DeflateRatio(col("text")).as("ratio"),
          graft.functions.DeflateRatio(reverse(reverse(col("text")))).as("ratio2"))
        r.agg(
          count(lit(1)).as("n_checked"),
          sum(when(col("len") >= 64 &&
              (col("ratio") <= 0.0 || col("ratio") > 1.2), 1L)
            .otherwise(0L)).as("n_out_of_range"),
          sum(when(col("ratio") =!= col("ratio2"), 1L).otherwise(0L))
            .as("n_nondeterministic"))
      },
      Some("SELECT count(*) AS n_checked, CAST(0 AS BIGINT) AS n_out_of_range, " +
        "CAST(0 AS BIGINT) AS n_nondeterministic FROM documents"),
      "invariant for x49: every doc's DEFLATE ratio is in-range (overhead " +
        "bound for >= 64-byte docs) and bit-deterministic across " +
        "re-evaluation; the oracle pins the corpus size so an empty check " +
        "cannot pass silently"),

    Q("x57_outlier_check",
      (s, dir) => {
        val m = ExtensionQueries.trainedModel(s, dir)
        val out = Clustering.embeddingOutliers(
          emb(s, dir), col("vec_id"), col("embedding"), m)
        // (a) flag arithmetic re-derived from the OUTPUT itself: per-cid
        // (cnt, s1, s2) over the emitted integer sims, the identical
        // threshold expression, exact-equality compare (pure function of
        // exact integers — no tolerance needed)
        val restats = out.groupBy(col("cid"))
          .agg(count(lit(1)).as("cnt"), sum(col("sim_u")).as("s1"),
            sum(col("sim_u") * col("sim_u")).as("s2"))
          .select(col("cid"),
            ((col("s1").cast("double") / col("cnt"))
              - lit(2.0) * sqrt(greatest(
                  col("s2").cast("double") / col("cnt")
                    - pow(col("s1").cast("double") / col("cnt"), 2),
                  lit(0.0)))).as("rthr_u"))
        val flags = out.join(restats, "cid")
          .agg(
            coalesce(bool_and(col("outlier") ===
              when(col("sim_u").cast("double") < col("rthr_u"), 1).otherwise(0)),
              lit(true)).as("flags_consistent"),
            (count(lit(1)) > 0).as("checked_some"))
        // (b) Chebyshev: for EXACT population stats, the mass below
        // mean - 2sigma is <= 1/4 in every cluster — a theorem, so a
        // violation can only be an arithmetic bug
        val cheb = out.groupBy(col("cid"))
          .agg((sum(col("outlier")).cast("double") / count(lit(1))).as("frac"))
          .agg(coalesce(bool_and(col("frac") <= 0.25), lit(true))
            .as("chebyshev_ok"))
        // (c) the assignment behind the flags is argmax under the
        // INTERPRETED cosine twin (tolerance play, as x7_kmeans_check)
        val interp = array(m.centers.map(c =>
          Similarity.cosineHof(col("unit"), typedlit(c))): _*)
        val assign = emb(s, dir)
          // filter BEFORE the interpreted cosine: the op under test drops
          // malformed vectors, and cosineHof's ANSI division must never
          // see a zero norm (the join would drop the rows too late)
          .filter(Similarity.wellFormedVec(col("embedding")))
          .select(col("vec_id"), L2Normalize(col("embedding")).as("unit"))
          .withColumn("isims", interp)
          .join(out.select(col("vec_id"), col("cid"), col("sim_u")), "vec_id")
          .agg(
            coalesce(bool_and(
              element_at(col("isims"), col("cid") + 1)
                >= array_max(col("isims")) - lit(1e-9)),
              lit(true)).as("assigned_argmax"),
            coalesce(bool_and(
              abs(floor(array_max(col("isims")) * 1e6) - col("sim_u")) <= 1),
              lit(true)).as("sims_quantized_close"))
        flags.crossJoin(broadcast(cheb)).crossJoin(broadcast(assign))
      },
      Some("SELECT TRUE AS flags_consistent, TRUE AS checked_some, " +
        "TRUE AS chebyshev_ok, TRUE AS assigned_argmax, " +
        "TRUE AS sims_quantized_close"),
      "invariant for x57: outlier flags re-derive exactly from the " +
        "emitted integer sims; per-cluster outlier mass respects the " +
        "Chebyshev 1/4 bound (a theorem for exact population stats); " +
        "assignment is argmax under the interpreted cosine twin"),

    Q("x61_card_check",
      (s, dir) => {
        val d = docs(s, dir)
        val merged = ExtensionQueries.all.find(_.name == "x61_mergeable_card")
          .get.run(s, dir)
        // exact twin: one direct pass, no shards
        val exact = d.select(col("source"), explode(Texts.tokens(col("text"))).as("term"))
          .groupBy(col("source"))
          .agg(countDistinct(col("term")).as("vocab_exact"),
            count(lit(1)).as("n_tokens_exact"))
        val docsExact = d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs_exact"))
        // single-pass sketch (no shard split): HLL registers are per-slot
        // maxima, so shard-merge must equal this BIT-EXACTLY
        val single = d.select(col("source"), explode(Texts.tokens(col("text"))).as("term"))
          .groupBy(col("source"))
          .agg(hll_sketch_estimate(hll_sketch_agg(col("term"))).as("est_single"))
        merged.join(exact, "source").join(docsExact, "source").join(single, "source")
          .agg(
            coalesce(bool_and(col("n_docs") === col("n_docs_exact") &&
              col("n_tokens") === col("n_tokens_exact")), lit(true)).as("sums_exact"),
            coalesce(bool_and(col("vocab_est") === col("est_single")), lit(true))
              .as("merge_consistent"),
            // STATISTICAL bound, not a theorem (the only one in this
            // file's new checks — r8 advice): HLL lgK=12 has RSE ~1.6%,
            // so 8% is a ~5-sigma envelope (miss prob ~3e-7 per source;
            // the estimate is deterministic per dataset — a red here
            // means an astronomically unlucky CORPUS, not a flaky run).
            // merge_consistent above is the bit-exact theorem; this one
            // only guards against a grossly wrong sketch.
            coalesce(bool_and(
              abs(col("vocab_est") - col("vocab_exact")).cast("double")
                / col("vocab_exact") <= 0.08), lit(true)).as("est_within_envelope"),
            (count(lit(1)) > 0).as("checked_some"))
      },
      Some("SELECT TRUE AS sums_exact, TRUE AS merge_consistent, " +
        "TRUE AS est_within_envelope, TRUE AS checked_some"),
      "invariant for x61: integer sums equal the direct pass; the " +
        "shard-merged HLL estimate equals the single-pass sketch " +
        "BIT-EXACTLY (registers are per-slot maxima); estimate within " +
        "the sketch's 5% envelope of exact vocabulary")
  )
}
