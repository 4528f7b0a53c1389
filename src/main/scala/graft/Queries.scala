package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Relational._

/** The registered query catalog: one named query per SURVEY.md §2 operator
  * (plus extensions), each with an equivalent DuckDB oracle SQL where
  * SQL-expressible. `SparkEntry` exposes these to the driver.
  *
  * CATALOG MAP — which file owns which entries (each family file owns its
  * entries' oracles too; the only shared oracle helpers are
  * `ExtensionQueries.gopherStatsSql` and `.ngramPairsCte`, single-homed
  * there and imported by their consumers):
  *  - `Queries` (this file): the s-, p-, g-, a-, j-prefixed
  *    reference-parity entries,
  *    `flagship_paid_orders`, the inline TPC-H shapes (q1, q3-q7, q10,
  *    q14, q18, q21), and `o14_grouping_sets_sql`.
  *  - `TpchQueries`: the remaining TPC-H shapes (q2, q8, q9, q11-q13,
  *    q15-q17, q19, q20, q22).
  *  - `SupersetQueries`: o1-o21 relational-superset entries.
  *  - `XDedupQueries`: x1, x2*, x8, x10, x11, x16, x21*, x25, x30, x34,
  *    x40, x50-x52, x60, x64, x3d, x4d, x4g.
  *  - `XSimilarityQueries`: x3*, x7, x9, x13, x24, x28, x31, x33, x35,
  *    x36, x57.
  *  - `XTextQueries`: x4*, x12, x14*, x18, x23, x26, x27, x29, x37b,
  *    x44, x45, x49, x53, x55, x56, x59.
  *  - `XMixtureQueries`: x6c-x6f, x19, x22, x32, x39, x41, x43, x46-x48,
  *    x54, x58, x62*.
  *  - `XPipelineQueries`: x5*, x6, x6b, x6g-x6j, x15, x17, x20, x37,
  *    x38, x42, x61, x63.
  *  - `CheckQueries`: every `*_check` twin for the no-oracle entries.
  *  - `ExtensionQueries`: shared artifacts + the family-file aggregation
  *    only (no entries of its own).
  *
  * Determinism rules (so the driver's hash-compare is stable):
  *  - money sums go through exact integer arithmetic (long cents, or
  *    `decimal(18,2)` where a comparison needs the typed value) then cast
  *    to double — double-sum order is nondeterministic under partial
  *    aggregation;
  *  - products of 2-decimal doubles are summed in integer cents;
  *  - event timestamps are compared in epoch MICROseconds (integer `div`),
  *    matching DuckDB's TIMESTAMP_NS→µs truncation;
  *  - every computed column is aliased identically in Spark and SQL.
  */
object Queries {

  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      doc: String)

  /** Exact sum of a 2-decimal money column, emitted as double — summed as
    * integer CENTS (optimization r12): `sum(long)` is a primitive codegen
    * aggregate, where `sum(decimal(18,2))` tracked 128-bit overflow and
    * allocated a Decimal per row in the hot loop. Both routes are exact
    * until one final IEEE conversion, and bit-equal for any group sum
    * under 2^53 cents (~9e13 dollars — far above any fixture or realistic
    * group); the fixtures' money columns sit exactly on the cents grid
    * (verified: round(x*100) == CAST(x AS DECIMAL(18,2))*100 on every
    * row), and the oracle mirrors the same arithmetic, so the driver's
    * hash-compare is unchanged.
    */
  private def moneySum(c: String, as: String) =
    (sum(round(col(c) * 100).cast("long")).cast("double") / 100.0).as(as)

  val all: Seq[Q] = Seq(

    // ================= sources (SURVEY §2.1) =================

    Q("s1_source_scan",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value")),
      Some("SELECT event_id, user_id, event_type, value FROM events"),
      "S1/S2 stream source batch analog: parquet scan incl. nanos-timestamp handling (KSA:104, KSA:175)"),

    Q("s1b_json_props",
      (s, dir) => graft.ops.Serde.fromJsonDropMalformed(
          col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"),
          keep = Seq(col("event_id"), col("user_id")))(
          Tables.events(s, dir))
        .filter(col("k").isNotNull)
        .select(col("event_id"), col("user_id"), col("k")),
      // the json_valid guard must be a CASE branch, not an AND conjunct:
      // DuckDB 1.0 can reorder/vector-evaluate conjuncts, and
      // json_extract_string HARD-ERRORS on a malformed-JSON row the
      // json_valid conjunct would have masked (trips at hostile sf1's
      // empty-string props; same pushdown-hazard class as the
      // list_dot_product oracles). CASE guarantees branch gating.
      Some("""SELECT event_id, user_id, CAST(ks AS INT) AS k
             |FROM (SELECT event_id, user_id,
             |        CASE WHEN json_valid(props)
             |             THEN json_extract_string(props, '$.k') END AS ks
             |      FROM events)
             |WHERE ks IS NOT NULL""".stripMargin),
      "serde drop-malformed JSON decode over events.props (KSA:59-74): undecodable records dropped"),

    Q("s3_table_compaction",
      (s, dir) => compactLatest(
          Seq(col("user_id")), Seq(expr("ts div 1000"), col("event_id")))(Tables.events(s, dir))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type")),
      Some("""SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
             |FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin),
      "S3 compacted-topic KTable + A3 toStream fixpoint: latest value per key (KSA:156-157, KSA:150)"),

    Q("s3b_tombstone_compaction",
      // the tombstone half of the KTable contract: error events play the
      // null-value delete marker for their user key — a user whose LATEST
      // event is an error vanishes from the table; an older error is
      // overridden by any newer re-insert
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("v",
          when(col("event_type") === "error", lit(null).cast("double"))
            .otherwise(col("value")))
        compactLatestWithTombstones(
            Seq(col("user_id")), Seq(expr("ts div 1000"), col("event_id")), col("v"))(ev)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("v").as("last_value"))
      },
      Some("""SELECT user_id, event_id AS last_event_id, v AS last_value FROM (
             |  SELECT user_id, event_id,
             |         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
             |  FROM events
             |  QUALIFY row_number() OVER (PARTITION BY user_id
             |                             ORDER BY ts DESC, event_id DESC) = 1)
             |WHERE v IS NOT NULL""".stripMargin),
      "S3 tombstone semantics: null value = Kafka delete marker; the key " +
        "drops only when the tombstone is the newest record (election " +
        "before the null filter)"),

    // ================= stateless ops (SURVEY §2.2) =================

    Q("p1_filter_expensive",
      (s, dir) => filterRecords(col("o_totalprice") >= 300000)(Tables.orders(s, dir))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus")),
      Some("SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders WHERE o_totalprice >= 300000"),
      "P1 filter: expensiveOrdersTopology's amount >= threshold predicate (KSA:107-109)"),

    Q("p2_project",
      (s, dir) => mapValues(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))(
        Tables.orders(s, dir)),
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders"),
      "P2 mapValues: pure projection (KSA:114-116); column pruning reaches the scan"),

    Q("p3_explode_tokens",
      (s, dir) => flatMapValues(Seq(col("doc_id")), split(col("text"), " "), "token")(
        Tables.documents(s, dir)),
      Some("SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents"),
      "P3 flatMapValues: one row per array element (KSA:121-123)"),

    Q("p4_selectkey",
      (s, dir) => selectKey(col("l_orderkey"), "key")(Tables.lineitem(s, dir))
        .select(col("key"), col("l_partkey"), col("l_suppkey"), col("l_quantity")),
      Some("SELECT l_orderkey AS key, l_partkey, l_suppkey, l_quantity FROM lineitem"),
      "P4 selectKey re-key (KSA:173); shuffle deferred to next keyed op (EnsureRequirements)"),

    // ================= grouping & aggregation (SURVEY §2.3) =================

    Q("g1_groupby_keymapper",
      (s, dir) => countByMappedKey(lower(substring(col("p_name"), 1, 1)), "first_letter")(
        Tables.part(s, dir)),
      Some("SELECT lower(substring(p_name, 1, 1)) AS first_letter, count(*) AS cnt FROM part GROUP BY 1"),
      "G1 groupBy with key-mapper lambda = derived grouping expression (KSA:125-128)"),

    Q("g2_a1_count_by_key",
      (s, dir) => countByKey(col("o_custkey"), "o_custkey")(Tables.orders(s, dir)),
      Some("SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey"),
      "G2 groupByKey + A1 unwindowed count → KTable fixpoint (KSA:140, KSA:144)"),

    Q("g3_cogroup",
      // the DSL cogroup (2.5+): order totals and purchase-event values
      // aggregated into ONE keyed table — one shuffle of the tagged
      // union, never a join of per-stream aggregates; money through
      // decimal(18,2) so both engines sum exactly (Queries header rule)
      (s, dir) => cogroupAgg("user_id", Seq(
          ("orders", Tables.orders(s, dir),
            col("o_custkey"), col("o_totalprice").cast("decimal(18,2)")),
          ("purchases", Tables.events(s, dir).filter(col("event_type") === "purchase"),
            col("user_id"), col("value").cast("decimal(18,2)"))))
        .select(col("user_id"),
          col("orders_sum").cast("double").as("orders_sum"), col("orders_cnt"),
          col("purchases_sum").cast("double").as("purchases_sum"), col("purchases_cnt")),
      Some("""SELECT k AS user_id,
             |  CAST(sum(CASE WHEN src = 'orders' THEN v ELSE 0 END) AS DOUBLE) AS orders_sum,
             |  count(*) FILTER (WHERE src = 'orders') AS orders_cnt,
             |  CAST(sum(CASE WHEN src = 'purchases' THEN v ELSE 0 END) AS DOUBLE) AS purchases_sum,
             |  count(*) FILTER (WHERE src = 'purchases') AS purchases_cnt
             |FROM (
             |  SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
             |         'orders' AS src FROM orders
             |  UNION ALL
             |  SELECT user_id, CAST(value AS DECIMAL(18,2)), 'purchases'
             |  FROM events WHERE event_type = 'purchase')
             |GROUP BY k""".stripMargin),
      "G superset: COGROUP (KGroupedStream.cogroup) — several streams " +
        "aggregated into one keyed table via a tagged union and a single " +
        "hash aggregate (the DSL's one-state-store property; one shuffle)"),

    Q("a2_windowed_count",
      (s, dir) => windowedCountByKey(col("ts_ts"), "10 seconds", col("user_id"), "user_id")(
        Tables.events(s, dir)),
      // ts IS NOT NULL: a timestampless event belongs to no window — the
      // engine's window() drops it, the oracle must too
      Some("""SELECT user_id, epoch_us(ts) // 10000000 * 10 AS window_start, count(*) AS cnt
             |FROM events WHERE ts IS NOT NULL GROUP BY 1, 2""".stripMargin),
      "A2 tumbling 10s windowed aggregate, epoch-aligned (KSA:142, KSA:146-148)"),

    Q("a2b_hopping_window",
      // size 20s / hop 10s: every event belongs to exactly two
      // epoch-aligned windows, starts floor(t/10)*10 and that minus 10 —
      // the oracle enumerates them per event and re-groups
      (s, dir) => hoppingCountByKey(col("ts_ts"), "20 seconds", "10 seconds",
        col("user_id"), "user_id")(Tables.events(s, dir)),
      Some("""SELECT user_id, ws AS window_start, count(*) AS cnt
             |FROM (SELECT user_id,
             |        unnest([epoch_us(ts) // 10000000 * 10 - 10,
             |                epoch_us(ts) // 10000000 * 10]) AS ws
             |      FROM events WHERE ts IS NOT NULL)
             |GROUP BY 1, 2""".stripMargin),
      "A2 superset: HOPPING windows (size 20s, advance 10s — Kafka Streams " +
        "TimeWindows.advanceBy); in-scan window assignment + one map-side-" +
        "combined hash aggregate, no self-join"),

    Q("g4_table_regroup",
      // `ktable.groupBy(newKey).count()` — re-group a TABLE, not a
      // stream: how many users' CURRENT (latest) event is of each type.
      // The subtractor semantics (an upsert retracts the key's old
      // group's contribution) is the streaming twin
      // Stateful.tableRegroupDeltas; this is its batch fixpoint.
      (s, dir) => compactLatest(
          Seq(col("user_id")), Seq(expr("ts div 1000"), col("event_id")))(
          Tables.events(s, dir))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_users")),
      Some("""WITH t AS (SELECT user_id, event_type FROM events
             |           QUALIFY row_number() OVER (PARTITION BY user_id
             |                     ORDER BY ts DESC, event_id DESC) = 1)
             |SELECT event_type, count(*) AS n_users FROM t GROUP BY 1""".stripMargin),
      "KTable re-group aggregation (groupBy + adder/SUBTRACTOR) batch " +
        "fixpoint: count per group of each key's current value"),

    Q("a2c_sliding_window",
      // Kafka Streams SlidingWindows (2.7+), the fourth window type:
      // per EVENT, the aggregate over (t − size, t] — windows bound to
      // actual event times, not an epoch grid. One per-key RANGE frame
      // (parallel across keys, a window over the key's own timeline);
      // ties at the same timestamp all land in each other's window in
      // both engines.
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-10000000L + 1L, 0L) // (t − 10 s, t] in µs
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"))
          .withColumn("cnt_10s", count(lit(1)).over(w))
          .select(col("user_id"), col("event_id"), col("cnt_10s"))
      },
      Some("""SELECT user_id, event_id,
             |  count(*) OVER (PARTITION BY user_id ORDER BY us
             |                 RANGE BETWEEN 9999999 PRECEDING AND CURRENT ROW) AS cnt_10s
             |FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)""".stripMargin),
      "A2 superset: SLIDING windows (Kafka Streams SlidingWindows) — per " +
        "event the trailing 10 s count, event-time-bound windows via one " +
        "per-key RANGE frame"),

    Q("a2d_suppressed_final",
      // suppress(untilWindowCloses) batch fixpoint: tumbling 10 s count,
      // only windows CLOSED by the final watermark (max ts − 30 s) are
      // emitted — the exact set an append-mode watermarked run emits
      // (StreamingSpec asserts the exactly-once-per-window equivalence).
      (s, dir) => suppressedWindowedCountFinal(
        col("ts_ts"), "10 seconds", 30L, col("user_id"), "user_id")(
        Tables.events(s, dir)),
      Some("""WITH wc AS (SELECT user_id, epoch_us(ts) // 10000000 * 10 AS window_start,
             |              count(*) AS cnt
             |            FROM events GROUP BY 1, 2),
             |wm AS (SELECT epoch_us(max(ts)) // 1000000 - 30 AS wm_s FROM events)
             |SELECT user_id, window_start, cnt
             |FROM wc, wm WHERE window_start + 10 <= wm_s""".stripMargin),
      "A2 superset: suppress(untilWindowCloses) emit-final windowed " +
        "aggregate — append-mode watermark gating's batch fixpoint; " +
        "windows still open at end-of-input are withheld"),

    // ================= joins (SURVEY §2.4) =================

    Q("j1_stream_table_join",
      (s, dir) => streamTableJoin(
          Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("profile")),
          Seq("o_custkey"))(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("profile")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment AS profile
             |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin),
      "J1 stream-table equi-join: enrich order with current profile (KSA:162-165)"),

    Q("j1b_stream_table_left_join",
      // `stream.leftJoin(table)` — the null-padding variant of J1: an
      // order whose customer is missing from the table keeps flowing with
      // a null profile (KS leftJoin calls the joiner with null) instead
      // of being dropped. Orders with out-of-range custkeys play the
      // table miss.
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"),
          col("c_mktsegment").as("profile")),
          col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("profile")),
      Some("""SELECT o_orderkey, o_custkey, c_mktsegment AS profile
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin),
      "J1 variant: stream-table LEFT join — table miss emits a null-joined " +
        "row instead of dropping (KS stream.leftJoin(table))"),

    Q("j2_globaltable_join",
      (s, dir) => {
        val enriched = streamTableJoin(
          Tables.customer(s, dir).select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("profile")),
          Seq("o_custkey"))(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
        globalTableJoin(Tables.discounts(s), col("profile") === col("p_profile"))(
            enriched.withColumnRenamed("profile", "p_profile"))
          .select(col("o_orderkey"), col("p_profile").as("profile"),
            (col("o_totalprice") * (lit(1.0) - col("factor"))).as("discounted"))
      },
      Some(s"""SELECT o_orderkey, c_mktsegment AS profile, o_totalprice * (1.0 - factor) AS discounted
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN ${Tables.discountsSql} ON c_mktsegment = d.profile""".stripMargin),
      "J2 stream-globalTable join on extracted foreign key, broadcast dim (KSA:167-171)"),

    Q("j3_interval_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"), col("user_id"), col("ts_us").as("p_us"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("e_event_id"), col("user_id").as("e_user_id"),
            col("ts_us").as("e_us"))
        intervalJoin(errors, col("user_id") === col("e_user_id"),
            col("p_us"), col("e_us"), 300000000L)(purchases)
          .select(col("p_event_id"), col("e_event_id"), col("user_id"))
      },
      Some("""SELECT p.event_id AS p_event_id, e.event_id AS e_event_id, p.user_id
             |FROM events p JOIN events e
             |  ON p.user_id = e.user_id
             | AND p.event_type = 'purchase' AND e.event_type = 'error'
             | AND epoch_us(e.ts) BETWEEN epoch_us(p.ts) - 300000000 AND epoch_us(p.ts) + 300000000""".stripMargin),
      "J3 stream-stream windowed join: same key within ±5 min, inclusive (KSA:177-186)"),

    Q("j3b_outer_interval_join",
      // the DSL outerJoin flavor of j3: every purchase AND every error
      // appears, null-padded when the other side has no row in the ±5 min
      // band for that user; the emitted user_id is whichever side exists
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"), col("user_id"), col("ts_us").as("p_us"))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("e_event_id"), col("user_id").as("e_user_id"),
            col("ts_us").as("e_us"))
        intervalJoin(errors, col("user_id") === col("e_user_id"),
            col("p_us"), col("e_us"), 300000000L, "full_outer")(purchases)
          .select(col("p_event_id"), col("e_event_id"),
            coalesce(col("user_id"), col("e_user_id")).as("user_id"))
      },
      Some("""WITH p AS (SELECT event_id AS p_event_id, user_id, epoch_us(ts) AS p_us
             |          FROM events WHERE event_type = 'purchase'),
             |     e AS (SELECT event_id AS e_event_id, user_id AS e_user_id,
             |                  epoch_us(ts) AS e_us
             |          FROM events WHERE event_type = 'error')
             |SELECT p_event_id, e_event_id,
             |       coalesce(user_id, e_user_id) AS user_id
             |FROM p FULL OUTER JOIN e
             |  ON user_id = e_user_id
             | AND e_us BETWEEN p_us - 300000000 AND p_us + 300000000""".stripMargin),
      "J3 superset: FULL OUTER windowed stream-stream join (the DSL " +
        "outerJoin — both unmatched sides survive null-padded); streaming " +
        "twin Topologies.paidOrdersFullOuter"),

    Q("j4_filtered_join",
      (s, dir) => filteredJoin(
          Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment").as("profile")),
          col("o_custkey") === col("c_custkey"),
          col("o_orderstatus") === "F")(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")))
        .select(col("o_orderkey"), col("o_custkey"), col("profile")),
      Some("""SELECT o_orderkey, o_custkey, c_mktsegment AS profile
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderstatus = 'F'""".stripMargin),
      "J4 Option-joiner = join + residual predicate (KSA:179-180, KSA:185)"),

    Q("j5_table_table_join",
      // KTable–KTable outer join (`ktableA.outerJoin(ktableB)` — DSL
      // table surface beyond the reference's usage): two changelogs
      // derived from the SAME event stream with independent update
      // cadence — last click and last purchase per user — joined on the
      // table key. Batch fixpoint of the update-stream join
      // (streaming exact twin: Stateful.tableTableJoinExact); both
      // compactions are key-partitioned windows on one user_id exchange.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        def latest(t: String, as: String) = compactLatest(
            Seq(col("user_id")), Seq(expr("ts div 1000"), col("event_id")))(
            ev.filter(col("event_type") === t))
          .select(col("user_id"), col("event_id").as(as))
        latest("click", "last_click")
          .join(latest("purchase", "last_purchase"), Seq("user_id"), "full_outer")
          .select(col("user_id"), col("last_click"), col("last_purchase"))
      },
      Some("""WITH lc AS (SELECT user_id, event_id AS last_click FROM events
             |            WHERE event_type = 'click'
             |            QUALIFY row_number() OVER (PARTITION BY user_id
             |                      ORDER BY ts DESC, event_id DESC) = 1),
             |lp AS (SELECT user_id, event_id AS last_purchase FROM events
             |       WHERE event_type = 'purchase'
             |       QUALIFY row_number() OVER (PARTITION BY user_id
             |                 ORDER BY ts DESC, event_id DESC) = 1)
             |SELECT user_id, last_click, last_purchase
             |FROM lc FULL OUTER JOIN lp USING (user_id)""".stripMargin),
      "KTable–KTable outer join: two compacted changelogs joined on the " +
        "table key — the DSL two-table join's batch fixpoint"),

    Q("j6_fk_table_join",
      // KTable FOREIGN-KEY join (KS 2.4 `ktable.join(other, fkExtractor)`)
      // batch fixpoint: the child table (purchase events keyed by
      // event_id, fk = user_id) inner-joined to the parent table (latest
      // signup per user). The streaming exact twin is the two-hop
      // subscription/response topology `Stateful.{fkSubscriptions,
      // fkJoinResponses}` — fk-move unsubscribe deltas, parent-update
      // fan-out, tombstone retraction — spec-pinned to equal this
      // fixpoint (StreamingSpec).
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val parents = compactLatest(
            Seq(col("user_id")), Seq(expr("ts div 1000"), col("event_id")))(
            ev.filter(col("event_type") === "signup"))
          .select(col("user_id"), col("event_id").as("last_signup"))
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"))
          .join(parents, Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("last_signup"))
      },
      Some("""WITH p AS (SELECT user_id, event_id AS last_signup FROM events
             |           WHERE event_type = 'signup'
             |           QUALIFY row_number() OVER (PARTITION BY user_id
             |                     ORDER BY ts DESC, event_id DESC) = 1)
             |SELECT e.event_id, e.user_id, p.last_signup
             |FROM events e JOIN p USING (user_id)
             |WHERE e.event_type = 'purchase'""".stripMargin),
      "KTable foreign-key join (KS 2.4) batch fixpoint: child rows joined " +
        "to their parent's current value via the fk column"),

    // ================= flagship composite (SURVEY §3.1) =================

    Q("flagship_paid_orders",
      (s, dir) => Flagship.paidOrders(s, dir),
      Some(Flagship.oracleSql),
      "paidOrdersTopology: J1 ⋈ J2(broadcast) → selectKey → J3 interval ⋈ → J4 filter (KSA:155-189)"),

    // ================= TPC-H-style headline aggregates =================

    Q("q1_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp_ntz"))
        .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("disc100", round(col("l_discount") * 100).cast("long"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum("l_quantity", "sum_qty"),
          moneySum("l_extendedprice", "sum_base_price"),
          (sum(col("cents") * (lit(100L) - col("disc100"))).cast("double") / 10000.0)
            .as("sum_disc_price"),
          count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
             |  count(*) AS cnt
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      "TPC-H Q1-style pricing summary; money sums exact via decimal/integer-cents"),

    Q("q3_shipping_priority",
      // FACT-FIRST orientation (optimization r12): lineitem — the biggest
      // table at every SF — is the STREAMED side, and the (filtered)
      // customer⋈orders chain is the build side. Written dims-first, the
      // planner's size estimates made it broadcast the raw filtered
      // lineitem scan (collect the fact to the driver, ship it to every
      // executor) while streaming a 20x smaller chain; at cluster SFs the
      // same written order degenerates to shuffling the chain into the
      // fact's hash side. Inner joins commute, so the result is identical.
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp_ntz"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp_ntz"))
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir)
            .filter(col("c_mktsegment") === "BUILDING")
            .select(col("c_custkey")),
          col("c_custkey") === col("o_custkey"))
        .withColumn("rev_cents",
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg((sum(col("rev_cents")).cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_orderdate,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1995-03-15'
             |  AND l_shipdate > TIMESTAMP '1995-03-15'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey
             |LIMIT 10""".stripMargin),
      "TPC-H Q3-style shipping priority: 3-way join, pushed filters, integer-cents revenue, top-10"),

    Q("q5_region_volume",
      // FACT-FIRST orientation (optimization r12, same rationale as q3):
      // written region-first, the executed sf0.1 plan streamed NATION (25
      // rows) and broadcast BOTH lineitem and orders — the two fact
      // tables collected to the driver per run. Streaming lineitem keeps
      // the dims on the build side at sf0.1 (all under the broadcast
      // threshold) and leaves the fact un-shuffled until the agg at any
      // SF where the mid tables outgrow broadcast (AQE then plans SMJ on
      // the join keys, still fact-streamed). Inner joins commute.
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(s, dir)
            .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name")),
          col("n_nationkey") === col("c_nationkey"))
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .withColumn("rev_cents",
          (round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))))
        .groupBy(col("n_name"))
        .agg((sum(col("rev_cents")).cast("double") / 10000.0).as("revenue")),
      Some("""SELECT n_name,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
             |FROM region
             |JOIN nation ON n_regionkey = r_regionkey
             |JOIN customer ON c_nationkey = n_nationkey
             |JOIN orders ON o_custkey = c_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin),
      "TPC-H Q5-style regional volume: 6-way join incl. broadcast dims, local-supplier residual"),

    Q("q4_order_priority",
      (s, dir) => {
        // genuine correlated EXISTS through the SQL surface — Catalyst
        // decorrelates it into a left-semi join (RewritePredicateSubquery)
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT o_orderpriority, count(*) AS order_count
                |FROM orders_v o
                |WHERE EXISTS (SELECT 1 FROM lineitem_v
                |              WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
                |GROUP BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
             |GROUP BY o_orderpriority""".stripMargin),
      "TPC-H Q4-style: correlated EXISTS decorrelated to a left-semi join, priority counts"),

    Q("q18_large_orders",
      (s, dir) => {
        // IN-subquery over a HAVING aggregate — planned as a semi-join
        // against the aggregated subquery
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                |FROM orders_v
                |WHERE o_orderkey IN (
                |  SELECT l_orderkey FROM lineitem_v
                |  GROUP BY l_orderkey
                |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders
             |WHERE o_orderkey IN (
             |  SELECT l_orderkey FROM lineitem
             |  GROUP BY l_orderkey
             |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)""".stripMargin),
      "TPC-H Q18-style: IN-subquery over a HAVING aggregate = semi-join against an agg"),

    Q("q6_forecast_revenue",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          round(col("l_discount") * 100).cast("long").between(5L, 7L) &&
          col("l_quantity") < 24)
        .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
            round(col("l_discount") * 100).cast("long")).cast("double") / 10000.0)
          .as("revenue")),
      // discount compared in exact integer hundredths — a raw double
      // BETWEEN 0.05 AND 0.07 is representation-dependent at the edges
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |                * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
             |  AND l_quantity < 24""".stripMargin),
      "TPC-H Q6-style forecast revenue: pure scan + filter + aggregate, fully pushed down"),

    Q("q10_returned_items",
      // Orientation A/B'd at sf0.1 AND sf1 this round and kept AS WRITTEN:
      // unlike q3/q5, q10's R-filter cuts lineitem to ~25%, so the
      // broadcast the planner picks here (the filtered fact) is genuinely
      // the smaller side at bench scale, and at sf1 the estimates push
      // both fact joins to SMJ — measured best-or-equal at both scales
      // (0.55/1.6 s vs 0.52-0.72/1.5-4.1 s for the fact-first and
      // chain-join variants, which either broadcast the 1.5M-row orders
      // projection at sf1 or pay an AQE shuffle-write at sf0.1).
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("rev_cents",
          round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg((sum(col("rev_cents")).cast("double") / 10000.0).as("revenue"))
        // custkey tiebreak makes the top-20 cutoff deterministic under ties
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue DESC, c_custkey
             |LIMIT 20""".stripMargin),
      "TPC-H Q10-style: returned-item revenue per customer, top-20 via TakeOrderedAndProject"),

    Q("q14_promo_share",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .withColumn("rev_cents",
          round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .agg((lit(100.0) *
          sum(when(col("p_type").startsWith("PROMO"), col("rev_cents"))
            .otherwise(lit(0L))).cast("double") /
          sum(col("rev_cents")).cast("double")).as("promo_pct")),
      Some("""SELECT 100.0 *
             |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
             |                THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))
             |                ELSE 0 END) AS DOUBLE)
             |  / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) AS promo_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin),
      "TPC-H Q14-style promo revenue share: conditional aggregation in exact integer cents, one month partition-prunable"),

    Q("q7_nation_volume",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).filter(
          col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") <= lit("1996-12-31").cast("timestamp"))
        val n1 = Tables.nation(s, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        li.join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2")
            || (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .withColumn("l_year", year(col("l_shipdate")))
          .withColumn("vol_cp",
            round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(sum(col("vol_cp")).as("revenue_cp"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       CAST(year(l_shipdate) AS INT) AS l_year,
             |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
             |                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_cp
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             | JOIN orders ON l_orderkey = o_orderkey
             | JOIN customer ON o_custkey = c_custkey
             | JOIN nation n1 ON s_nationkey = n1.n_nationkey
             | JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
             |GROUP BY 1, 2, 3""".stripMargin),
      "TPC-H Q7-style bi-national trade volume: five-table chain, both nation " +
        "dims broadcast, date range pushed to the lineitem scan, exact integer cents"),

    Q("q21_waiting_suppliers",
      (s, dir) => {
        // the SQL front door (same planner): EXISTS decorrelates to a semi
        // join, the correlated NOT EXISTS to an anti join — no driver loop,
        // no cartesian. "Late" = shipped > 60 days after the order date
        // (this fixture has no commit/receipt dates).
        //
        // Spill diet (measured, sf30 on a 16 GB heap): written as one flat
        // five-way FROM, the optimizer placed the supplier join UNDER the
        // semi/anti self-joins, so every SMJ sort carried s_name through
        // the triple-lineitem exchange — 21 GB of memory spill sorting
        // rows twice as wide as the join keys need. The CTE pre-aggregates
        // waiting counts per l_suppkey FIRST (the self-join sorts carry
        // only orderkey/suppkey/one date), then resolves names against the
        // supplier table ABOVE the aggregate — count-sum re-aggregation by
        // name is exact because counts are associative.
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""WITH waiting AS (
                |  SELECT l1.l_suppkey, count(*) AS cnt
                |  FROM lineitem_v l1, orders_v
                |  WHERE o_orderkey = l1.l_orderkey
                |    AND o_orderstatus = 'F'
                |    AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
                |    AND EXISTS (SELECT 1 FROM lineitem_v l2
                |                WHERE l2.l_orderkey = l1.l_orderkey
                |                  AND l2.l_suppkey <> l1.l_suppkey)
                |    AND NOT EXISTS (SELECT 1 FROM lineitem_v l3
                |                    WHERE l3.l_orderkey = l1.l_orderkey
                |                      AND l3.l_suppkey <> l1.l_suppkey
                |                      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
                |  GROUP BY l1.l_suppkey)
                |SELECT s_name, sum(cnt) AS numwait
                |FROM waiting JOIN supplier_v ON s_suppkey = l_suppkey
                |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM supplier, lineitem l1, orders
             |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
             |  AND o_orderstatus = 'F'
             |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin),
      "TPC-H Q21-style waiting suppliers: sole-late-supplier detection — " +
        "EXISTS → semi join, correlated NOT EXISTS → anti join, top-10 TakeOrdered"),

    Q("o14_grouping_sets_sql",
      (s, dir) => {
        // the SQL entry path of the engine: the same Catalyst planner,
        // driven by spark.sql over a registered view
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
                |FROM orders_v
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin),
      "GROUPING SETS through the spark.sql surface (same planner, SQL front door)")
  )

  /** Full catalog: reference parity + extensions + superset ops +
    * driver-visible invariants over the no-oracle queries. */
  def catalog: Seq[Q] =
    all ++ TpchQueries.all ++ ExtensionQueries.all ++ SupersetQueries.all ++ CheckQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

/** The flagship paid-orders pipeline (SURVEY §3.1) over the testdata mapping
  * (FIXTURES.md §C): orders enriched with profile (J1), discounted via the
  * broadcast global table (J2), re-keyed by order (P4), interval-joined to
  * its lineitems shipped within 90 days ("payments", J3), kept only when
  * `l_returnflag = 'N'` ("PAID", J4).
  */
object Flagship {
  import graft.ops.Relational._

  def paidOrders(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    val profiles = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("profile"))
    // J1: co-partitioned stream-table join on the user key
    val withProfile = orders.join(profiles, col("o_custkey") === col("c_custkey"))
    // J2: broadcast global-table join on the extracted profile key
    val discounted = globalTableJoin(
        Tables.discounts(s).withColumnRenamed("profile", "d_profile"),
        col("profile") === col("d_profile"))(withProfile)
      .withColumn("discounted", col("o_totalprice") * (lit(1.0) - col("factor")))
    // P4: re-key by orderId (shuffle planned at the next join)
    val rekeyed = selectKey(col("o_orderkey"), "key")(discounted)
    // J3: interval join to "payments" (lineitems shipped within 90 days).
    // FACT-FIRST orientation (optimization r12): the lineitem side is the
    // biggest table at every SF, so it STREAMS and the enriched-order
    // chain is the build side — written chain-first, the executed sf0.1
    // plan broadcast the raw N-filtered lineitem scan (the fact collected
    // to the driver) while streaming the 4x smaller chain. Inner joins
    // commute; output columns unchanged.
    val payments = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_shipdate"), col("l_returnflag"))
    payments.join(rekeyed,
        col("key") === col("l_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      // J4: Option joiner — keep only "PAID"
      .filter(col("l_returnflag") === "N")
      .select(col("o_orderkey"), col("l_linenumber"), col("profile"),
        col("discounted"), col("l_quantity"))
  }

  val oracleSql: String =
    s"""SELECT o_orderkey, l_linenumber, c_mktsegment AS profile,
       |  o_totalprice * (1.0 - factor) AS discounted, l_quantity
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN ${Tables.discountsSql} ON c_mktsegment = d.profile
       |JOIN lineitem ON l_orderkey = o_orderkey
       | AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
       |WHERE l_returnflag = 'N'""".stripMargin
}
