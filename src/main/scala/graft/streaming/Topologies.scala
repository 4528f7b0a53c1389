package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Relational

/** The reference's five topologies (KSA = reference
  * `src/main/scala/KafkaStreamsApp.scala`), re-expressed as Structured
  * Streaming programs. Every topology is a pure `DataFrame => DataFrame`
  * transform, so the SAME code runs on a streaming input (MemoryStream /
  * file / Kafka source) and on a batch input — batch execution simply
  * ignores watermarks. That shared-plan property is the correctness
  * argument (SURVEY §2.3): Kafka Streams emits per record, Spark per
  * micro-batch; the two agree at the final fixpoint, which is exactly the
  * batch result. The streaming test suite asserts that equality.
  *
  * Emission mapping:
  *  - KTable results (A1 count, A2 windowed aggregate) → `update` output
  *    mode: each micro-batch emits refreshed rows = `ktable.toStream`
  *    (A3, KSA:150) continuous changelog emission.
  *  - Stream-stream join results (flagship) → `append` (engine rule).
  *
  * Input column contracts are the [[OrderEvent]]/[[PaymentEvent]] case
  * classes.
  */
object Topologies {

  /** `expensiveOrdersTopology` (KSA:106-111): S1 → P1 filter(amount >=
    * threshold) → K1. Stateless single-stage pipeline — no watermark, no
    * shuffle, no state store.
    */
  def expensiveOrders(orders: DataFrame, threshold: Double = 1000.0): DataFrame =
    Relational.filterRecords(col("amount") >= threshold)(orders)

  /** `purchasedListOfProductsTopology` (KSA:113-118): P2 mapValues
    * (Order → products list) → P5. Pure projection.
    */
  def purchasedProducts(orders: DataFrame): DataFrame =
    Relational.mapValues(col("user"), col("products"))(orders)

  /** `purchasedProductsByFirstLetterTopology` (KSA:120-133): P3
    * flatMapValues(products) → G1 groupBy(first letter of user, lowered).
    * The reference declares the grouping but never aggregates it
    * (KSA:125-128 — dead code after declaration); we aggregate with
    * `count` so the operator is observable. Unwindowed aggregate →
    * `update` output mode.
    */
  def productsByFirstLetter(orders: DataFrame): DataFrame =
    Relational.countByMappedKey(lower(substring(col("user"), 1, 1)), "first_letter")(
      Relational.flatMapValues(Seq(col("user")), col("products"), "product")(orders))

  /** `numberOfProductsByUserEveryTenSecondsTopology`, unwindowed half
    * (KSA:140, KSA:144): P3 explode → G2 groupByKey → A1 count() →
    * KTable[user, Long]. `update` output mode = A3 toStream changelog.
    */
  def productsPerUser(orders: DataFrame): DataFrame =
    Relational.countByKey(col("user"), "user")(
      Relational.flatMapValues(Seq(col("user")), col("products"), "product")(orders))

  /** `numberOfProductsByUserEveryTenSecondsTopology`, windowed half
    * (KSA:142, KSA:146-148): tumbling 10-second event-time windows,
    * epoch-aligned, custom fold (0L, +1) = count. `grace` maps Kafka
    * Streams' window grace (default 24 h) to the watermark's
    * allowed lateness; rows later than that are dropped in streaming and
    * (by definition) absent from the batch fixpoint comparison.
    */
  def productsPerUserWindowed(orders: DataFrame, window: String = "10 seconds",
      grace: String = "24 hours"): DataFrame =
    Relational.windowedCountByKey(col("ts"), window, col("user"), "user")(
      Relational.flatMapValues(Seq(col("user"), col("ts")), col("products"), "product")(
        orders.withWatermark("ts", grace)))

  /** Hopping variant of [[productsPerUserWindowed]] (Kafka Streams
    * `TimeWindows.of(size).advanceBy(hop)` — the reference only uses the
    * tumbling size == hop case): each event is counted into size/hop
    * overlapping epoch-aligned windows. Streaming state holds size/hop
    * live (user, window) cells per key; append mode emits each window
    * exactly once when the watermark passes its end — same
    * lateness/grace mapping as the tumbling topology.
    */
  def productsPerUserHopping(orders: DataFrame, window: String = "20 seconds",
      hop: String = "10 seconds", grace: String = "24 hours"): DataFrame =
    Relational.hoppingCountByKey(col("ts"), window, hop, col("user"), "user")(
      Relational.flatMapValues(Seq(col("user"), col("ts")), col("products"), "product")(
        orders.withWatermark("ts", grace)))

  /** Streaming document curation — the batch curation pipeline
    * (normalize → quality gate → fingerprint dedup) applied to a LIVE
    * document stream, the shape an ingestion-time curation service runs:
    * each arriving doc is normalized and quality-scored with the same
    * codegen'd expressions as the batch path
    * ([[graft.ops.TextAnalysis.qualityExpr]]), then content-deduped on
    * `md5(norm)` within the watermark horizon
    * (`dropDuplicatesWithinWatermark`: state bounded by arrival rate ×
    * grace, the only scale-safe streaming dedup). Unlike the batch
    * pipeline there is no min-doc_id survivor election — a stream keeps
    * the FIRST arrival per fingerprint, which is the online analog.
    */
  def curateDocuments(docs: DataFrame, minQuality: Double = 0.45,
      grace: String = "10 minutes"): DataFrame =
    docs
      .withColumn("norm", graft.ops.TextAnalysis.normalize(col("text")))
      .withColumn("quality", graft.ops.TextAnalysis.qualityExpr(col("norm")))
      .filter(col("quality") >= minQuality)
      .withColumn("norm_fp", md5(col("norm")))
      .withWatermark("ts", grace)
      .dropDuplicatesWithinWatermark("norm_fp")
      .select(col("doc_id"), col("norm_fp"), col("quality"), col("ts"))

  /** Streaming TRENDING: the per-window winner of a windowed count —
    * CHAINED streaming aggregations (Spark 4 multiple-stateful-operator
    * support): a watermarked tumbling count per (window, key), then a
    * second aggregation per window picking the max-count key. The second
    * groupBy is on the window struct itself, so event-time semantics (and
    * watermark-driven finalization in append mode) propagate through both
    * stateful operators. `max(struct(cnt, key))` is the deterministic
    * argmax: highest count, ties to the lexicographically-last key —
    * identical in batch and streaming, which the fixpoint test asserts.
    */
  def trendingKeys(events: DataFrame, key: Column, tsCol: Column,
      window: String = "10 seconds", grace: String = "24 hours"): DataFrame =
    events
      .select(key.as("key"), tsCol.as("ts"))
      .withWatermark("ts", grace)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("key"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("w"))
      .agg(max(struct(col("cnt"), col("key"))).as("m"))
      .select(col("w.start").as("window_start"),
        col("m.key").as("top_key"), col("m.cnt").as("top_cnt"))

  /** X1 streaming exact dedup: drop re-deliveries of the same order id
    * arriving within the watermark horizon — the streaming analog of
    * [[graft.ops.Dedup.exact]]. `dropDuplicatesWithinWatermark` is the only
    * scale-safe formulation: plain streaming `dropDuplicates` keeps every
    * key seen forever, while watermark-scoped state is bounded by
    * (arrival rate × grace).
    */
  def dedupOrders(orders: DataFrame, grace: String = "10 minutes"): DataFrame =
    orders.withWatermark("ts", grace).dropDuplicatesWithinWatermark("orderId")

  /** `paidOrdersTopology` — the flagship (KSA:155-189):
    *
    *  - J1 (KSA:162-165): orders ⋈ profiles on the user key. The profile
    *    KTable maps to a stream-static join: each micro-batch sees the
    *    table's current snapshot — the closest Spark analog of "current
    *    value of the changelog" (SURVEY §7 "what's hard" #1).
    *  - J2 (KSA:167-171): ⋈ broadcast discounts on the profile extracted
    *    from the in-flight value; the GlobalKTable IS a broadcast dim.
    *    Joiner applies `amount * discount.amount` (KSA:170).
    *  - P4 (KSA:173): re-key by orderId — declared by selection; the
    *    exchange materializes at the next keyed operator.
    *  - J3 (KSA:177-186): ⋈ payments within ±`joinWindow`, both sides
    *    watermarked (symmetric bounds ⇒ both states are prunable).
    *  - J4 (KSA:179-180, 185): Option-joiner → residual `status = PAID`.
    *
    * Streaming output is append-only (stream-stream join rule); the
    * batch application of this same function is the oracle fixpoint.
    */
  def paidOrders(orders: DataFrame, payments: DataFrame, profiles: DataFrame,
      discounts: DataFrame, joinWindow: String = "5 minutes"): DataFrame =
    enrichedRekeyed(orders, profiles, discounts, joinWindow)
      .join(watermarkedPayments(payments, joinWindow),
        expr(intervalCond(joinWindow)))
      .filter(col("status") === "PAID")
      .select(col("orderId"), col("user"), col("profile"), col("amount"), col("status"))

  /** Left-outer flagship variant — "orders with OR without payment", the
    * DSL `leftJoin` surface the reference leaves unused (SURVEY §2.4).
    * Same stages as [[paidOrders]], but the J3 payment join keeps
    * unmatched orders with null payment columns, and the PAID residual
    * moves INTO the join condition: applied after an outer join it would
    * drop exactly the null-padded rows the outer join exists to emit.
    *
    * Streaming semantics: an unmatched order is emitted (null-padded)
    * only once the watermark passes the end of its join interval — the
    * state-expiry emission that the DSL's left-join grace period maps to.
    * Until then the engine cannot know a matching payment won't still
    * arrive. The batch application of this same function is the fixpoint
    * the streaming test compares against.
    */
  def paidOrdersLeftOuter(orders: DataFrame, payments: DataFrame, profiles: DataFrame,
      discounts: DataFrame, joinWindow: String = "5 minutes"): DataFrame =
    enrichedRekeyed(orders, profiles, discounts, joinWindow)
      .join(watermarkedPayments(payments, joinWindow),
        expr(intervalCond(joinWindow) + " AND status = 'PAID'"), "left_outer")
      .select(col("orderId"), col("user"), col("profile"), col("amount"), col("status"))

  /** Full-outer flagship variant — the DSL `outerJoin`: every order AND
    * every payment appears, null-padded when the other side never arrives
    * inside the interval. No status residual here (with an outer join a
    * failed residual would null-pad BOTH sides of a matched pair — the
    * filtered-join composition belongs to the inner/left flavors); the
    * emitted key is whichever side is present. Same watermark-expiry
    * emission discipline as [[paidOrdersLeftOuter]], on both states.
    */
  def paidOrdersFullOuter(orders: DataFrame, payments: DataFrame, profiles: DataFrame,
      discounts: DataFrame, joinWindow: String = "5 minutes"): DataFrame =
    enrichedRekeyed(orders, profiles, discounts, joinWindow)
      .join(watermarkedPayments(payments, joinWindow),
        expr(intervalCond(joinWindow)), "full_outer")
      .select(coalesce(col("key"), col("p_orderId")).as("orderId"),
        col("user"), col("profile"), col("amount"), col("status"))

  /** Shared J1→J2→P4 prefix of the flagship: profile snapshot join,
    * broadcast discount join with the discount applied, re-key by orderId.
    */
  private def enrichedRekeyed(orders: DataFrame, profiles: DataFrame,
      discounts: DataFrame, joinWindow: String): DataFrame = {
    val withProfile = Relational.streamTableJoin(profiles, Seq("user"))(
      orders.withWatermark("ts", joinWindow))
    val discounted = Relational.globalTableJoin(
        discounts.withColumnRenamed("amount", "discount")
          .withColumnRenamed("profile", "d_profile"),
        col("profile") === col("d_profile"))(withProfile)
      .withColumn("amount", col("amount") * col("discount"))
      .drop("discount", "d_profile")
    Relational.selectKey(col("orderId"), "key")(discounted)
  }

  private def watermarkedPayments(payments: DataFrame, joinWindow: String): DataFrame =
    payments
      .withColumnRenamed("orderId", "p_orderId")
      .withColumnRenamed("ts", "pts")
      .withWatermark("pts", joinWindow)

  private def intervalCond(joinWindow: String): String =
    s"key = p_orderId AND pts BETWEEN ts - INTERVAL $joinWindow " +
      s"AND ts + INTERVAL $joinWindow"
}
