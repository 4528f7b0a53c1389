package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.Q

/** Superset relational operators beyond the reference's surface
  * (SURVEY.md §2.6: the reference has none of these; Spark gives them for
  * free and a user of the engine expects them): sorts/limits, ranking
  * windows, set operations, rollup, distinct + approximate aggregation,
  * session windows.
  */
object SupersetQueries {

  val all: Seq[Q] = Seq(

    Q("o1_topk",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      "sort + limit → TakeOrderedAndProject (no global sort materialized)"),

    Q("o2_rank_window",
      (s, dir) => Tables.orders(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn")),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders
             |QUALIFY rn <= 2""".stripMargin),
      "ranking window: top-2 orders per customer, deterministic tiebreak"),

    Q("o18_dist_windows",
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          ntile(4).over(Window.partitionBy(col("l_returnflag"))
            .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber")))
            .as("quartile"),
          cume_dist().over(Window.partitionBy(col("l_returnflag"))
            .orderBy(col("l_quantity"))).as("cd"),
          percent_rank().over(Window.partitionBy(col("l_returnflag"))
            .orderBy(col("l_quantity"))).as("pr")),
      // cume_dist/percent_rank order on l_quantity only: rank functions
      // over ties are order-insensitive, so no tiebreak needed there;
      // ntile IS position-sensitive, so its ordering must be total.
      // Both are exact integer ratios (rank/n), bit-identical in any IEEE
      // engine — emitted raw; rounding only risks tie disagreements
      // NULLS FIRST on l_quantity pins DuckDB to Spark's ASC default: a
      // NULL measure ranks below every real value in all three functions
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             |  CAST(ntile(4) OVER (PARTITION BY l_returnflag
             |       ORDER BY l_quantity NULLS FIRST, l_orderkey, l_linenumber) AS INT) AS quartile,
             |  cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity NULLS FIRST) AS cd,
             |  percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity NULLS FIRST) AS pr
             |FROM lineitem""".stripMargin),
      "distribution window functions (ntile/cume_dist/percent_rank) — " +
        "per-partition sort class, same as o2; partition count bounds the task"),

    Q("o3_intersect",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin),
      "set op: INTERSECT (customers with both statuses)"),

    Q("o3b_except",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin),
      "set op: EXCEPT"),

    Q("o3c_except_all",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .exceptAll(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      },
      // multiset semantics: each occurrence cancels one from the other side
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |EXCEPT ALL
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin),
      "set op: EXCEPT ALL (bag difference — duplicates preserved per multiplicity)"),

    Q("o4_rollup",
      (s, dir) => Tables.customer(s, dir)
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"), grouping_id().as("gid")),
      Some("""SELECT n_name, c_mktsegment, count(*) AS cnt, GROUPING(n_name, c_mktsegment) AS gid
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, c_mktsegment)""".stripMargin),
      "ROLLUP hierarchy totals with grouping id"),

    Q("o5_distinct_agg",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nparts"), count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nparts, count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "distinct aggregation (expand + two-phase agg)"),

    Q("o6_approx_distinct",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_nparts")),
      None, // HLL++ estimates are engine-specific; driver does rows-only check
      "approx_count_distinct (HyperLogLog++): sketch-based cardinality at scale"),

    Q("o7_session_window",
      (s, dir) => Tables.events(s, dir)
        .groupBy(session_window(col("ts_ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
          col("session_window.start").cast("long").as("session_start"), col("cnt")),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events
             |           WHERE ts IS NOT NULL),
             |m AS (SELECT user_id, us,
             |        CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 300000000
             |               OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e),
             |s AS (SELECT user_id, us,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY us
             |                         ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM m)
             |SELECT user_id, min(us) // 1000000 AS session_start, count(*) AS cnt
             |FROM s GROUP BY user_id, sid""".stripMargin),
      "session windows (5-min gap) — gaps-and-islands equivalent as oracle"),

    // The Kafka Streams DSL offers leftJoin/outerJoin (unused by the
    // reference — SURVEY §2.4); a user switching engines expects them, so
    // they are first-class here with oracles.

    Q("o8_left_join",
      (s, dir) => Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
        .join(Tables.orders(s, dir)
            .filter(col("o_totalprice") >= 400000)
            .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey")),
      Some("""SELECT c_custkey, c_mktsegment, o_orderkey
             |FROM customer
             |LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice >= 400000) o
             |  ON c_custkey = o_custkey""".stripMargin),
      "left outer join: customers kept without matching big orders (DSL leftJoin analog)"),

    Q("o9_semi_anti_join",
      (s, dir) => {
        val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") >= 400000)
          .select(col("o_custkey"))
        val c = Tables.customer(s, dir).select(col("c_custkey"))
        c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
          .withColumn("has_big_order", lit(true))
          .unionAll(
            c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
              .withColumn("has_big_order", lit(false)))
      },
      // EXISTS, not IN: `NOT IN` returns no rows if the subquery ever
      // yields a NULL key — correct today only because o_custkey is
      // non-null; EXISTS has the anti-join semantics unconditionally
      Some("""SELECT c_custkey, TRUE AS has_big_order FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 400000)
             |UNION ALL
             |SELECT c_custkey, FALSE AS has_big_order FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 400000)""".stripMargin),
      "semi + anti join partition of customers by big-order existence"),

    Q("o10_salted_join",
      (s, dir) => graft.ops.Relational.saltedJoin(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
          "o_orderkey", 8)(
          Tables.lineitem(s, dir).select(col("l_orderkey").as("o_orderkey"),
            col("l_linenumber"), col("l_quantity")))
        .select(col("o_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("o_orderpriority")),
      // The oracle is the UNSALTED join: salting must not change results,
      // only the physical distribution of hot keys.
      Some("""SELECT l_orderkey AS o_orderkey, l_linenumber, l_quantity, o_orderpriority
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin),
      "salted equi-join for extreme key skew — result identical to the plain join by construction"),

    Q("o11_percentile",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
          percentile(col("l_quantity"), lit(0.95)).as("p95_qty")),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.95) AS p95_qty
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      "exact interpolated percentiles per group (sort-based aggregate)"),

    Q("o11b_approx_percentile",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("median_est")),
      None, // sketch estimates are engine-specific; rows-only check
      "approx percentile (KLL-style sketch) — the constant-memory scale path next to exact o11"),

    Q("o4b_cube",
      (s, dir) => Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), grouping_id().as("gid")),
      Some("""SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
             |  GROUPING(c_mktsegment, o_orderpriority) AS gid
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY CUBE(c_mktsegment, o_orderpriority)""".stripMargin),
      "CUBE over two dims with grouping id (expand + two-phase agg)"),

    Q("o12_moving_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, 0)
        Tables.orders(s, dir)
          .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("cents")).over(w).as("mov_cents"),
            count(lit(1)).over(w).as("mov_n"))
      },
      // CAST the window sum itself: DuckDB widens sum(BIGINT) OVER (...) to
      // HUGEINT (int128), which the driver hash does not width-normalize.
      // NULLS FIRST pins DuckDB's default (NULLS LAST for ASC) to Spark's
      // (NULLS FIRST) — a NULL order date sorts as "earliest known"
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
             |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_cents,
             |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
             |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n
             |FROM orders""".stripMargin),
      "sliding window frame (ROWS 2 PRECEDING): moving sum in exact integer cents"),

    Q("o15_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_us").as("us"))
        // right side deduped to one row per (user, ts) so the as-of match
        // is deterministic in BOTH engines (DuckDB ASOF picks an arbitrary
        // row among ties; here ties cannot exist by construction)
        val purchases = graft.ops.Relational.compactLatest(
            Seq(col("user_id"), col("ts_us")), Seq(col("event_id")))(
            e.filter(col("event_type") === "purchase"))
          .select(col("user_id"), col("ts_us").as("p_us"),
            col("event_id").as("p_event_id"), col("value").as("p_value"))
        graft.ops.Relational.asofJoin(purchases, Seq("user_id"), "us", "p_us",
          Seq("p_event_id", "p_value"), "p_event_id")(clicks)
      },
      // ts IS NOT NULL on both sides mirrors the op's unplaceable-record
      // drop (DuckDB's ASOF would otherwise match a NULL-ts click to the
      // user's LAST purchase — NULL as +infinity, not SQL comparison)
      Some("""WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
             |           WHERE event_type = 'click' AND ts IS NOT NULL),
             |r AS (SELECT user_id, epoch_us(ts) AS p_us, event_id AS p_event_id, value AS p_value
             |      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
             |      QUALIFY row_number() OVER (PARTITION BY user_id, epoch_us(ts)
             |                                 ORDER BY event_id DESC) = 1)
             |SELECT l.event_id, l.user_id, l.us, r.p_event_id, r.p_value
             |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.p_us""".stripMargin),
      "AS-OF join: each click matched to the user's latest at-or-before purchase (union + ordered carry, no range-join pair explosion)"),

    Q("o16_pivot",
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        // explicit value list: with it, pivot needs NO extra distinct-values
        // job and the output schema is static — the scale-safe form
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("unspecified"),
          coalesce(col("5-LOW"), lit(0L)).as("low")),
      // pivot = grouped conditional aggregation; count(*) FILTER is its
      // relational spelling (0 for empty cells either way)
      Some("""SELECT o_orderstatus,
             |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
             |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
             |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
             |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS unspecified,
             |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
             |FROM orders GROUP BY o_orderstatus""".stripMargin),
      "pivot with an explicit value list (static schema, no extra distinct scan) = conditional aggregation"),

    Q("o17_range_frame",
      (s, dir) => {
        // trailing 30-day revenue per customer at each order — the RANGE
        // frame (value-based, not row-count) that powers rolling
        // feature-engineering; ordered by epoch DAYS so the frame bound is
        // an exact integer interval in both engines
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("days"))
          .rangeBetween(-30, 0)
        Tables.orders(s, dir)
          .withColumn("days", datediff(col("o_orderdate"), lit("1990-01-01").cast("date")).cast("long"))
          .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("cents")).over(w).cast("long").as("trail30_cents"),
            count(lit(1)).over(w).as("trail30_n"))
      },
      // CAST the window sum (HUGEINT widening, the o12 lesson)
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |    OVER (PARTITION BY o_custkey ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
             |          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail30_cents,
             |  count(*) OVER (PARTITION BY o_custkey ORDER BY datediff('day', DATE '1990-01-01', o_orderdate)
             |          RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS trail30_n
             |FROM orders""".stripMargin),
      "RANGE window frame: trailing 30-day revenue per customer (value-based frame, exact integer day offsets)"),

    Q("o19_scd2",
      (s, dir) => {
        // the orders table read as a per-customer status changelog:
        // order = seconds * 1e9 + orderkey, one per-key-unique scalar
        // (dates are day-grained, so same-day ties are real; orderkey
        // stays < 1e9 far beyond this fixture's scale)
        val ord = unix_timestamp(col("o_orderdate")) * lit(1000000000L) +
          col("o_orderkey")
        graft.ops.Relational.scd2(
            Seq(col("o_custkey")), col("o_orderstatus"), ord)(
            Tables.orders(s, dir))
          .select(col("o_custkey"), col("value").as("status"),
            col("valid_from"), col("valid_to"))
      },
      // o_orderdate IS NOT NULL mirrors scd2's NULL-ordinal drop
      Some("""WITH ch AS (SELECT o_custkey, o_orderstatus AS status,
             |              epoch_us(o_orderdate) // 1000000 * 1000000000 + o_orderkey AS ord
             |            FROM orders WHERE o_orderdate IS NOT NULL),
             |d AS (SELECT o_custkey, status, ord,
             |        lag(status) OVER (PARTITION BY o_custkey ORDER BY ord) AS pv,
             |        row_number() OVER (PARTITION BY o_custkey ORDER BY ord) AS rn
             |      FROM ch),
             |sc AS (SELECT o_custkey, status, ord AS valid_from FROM d
             |       WHERE rn = 1 OR pv IS DISTINCT FROM status)
             |SELECT o_custkey, status, valid_from,
             |       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS valid_to
             |FROM sc""".stripMargin),
      "SCD type-2: upsert changelog → validity intervals, consecutive " +
        "same-value records collapsed; one shuffle on the dimension key"),

    Q("o13_branch_merge",
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
        val branches = graft.ops.Relational.branch(Seq(
          col("o_totalprice") >= 300000, col("o_totalprice") >= 100000))(o)
        graft.ops.Relational.merge(Seq(
          branches(0).withColumn("tier", lit("high")),
          branches(1).withColumn("tier", lit("mid")),
          branches(2).withColumn("tier", lit("low"))))
      },
      // first-match-wins branch semantics = ordered CASE WHEN
      Some("""SELECT o_orderkey, o_totalprice,
             |  CASE WHEN o_totalprice >= 300000 THEN 'high'
             |       WHEN o_totalprice >= 100000 THEN 'mid'
             |       ELSE 'low' END AS tier
             |FROM orders""".stripMargin),
      "DSL branch/merge: first-match routing into tagged branches, merged back (union)"),

    Q("o20_funnel",
      // times compared at MICROS in both engines: events.ts is parquet
      // nanos read as long here but truncated to a µs TIMESTAMP by
      // DuckDB, and a strictly-after test at nanos would pass events the
      // µs twin rejects (same-micro, later-nano)
      (s, dir) => graft.ops.Sequences.funnel(
        col("user_id"), col("event_type"), expr("ts div 1000"),
        Seq("view", "click", "purchase"))(Tables.events(s, dir)),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS u FROM events),
             |s1 AS (SELECT user_id, min(u) AS t1 FROM e
             |       WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (SELECT s1.user_id, s1.t1, min(e.u) AS t2
             |       FROM s1 LEFT JOIN e ON e.user_id = s1.user_id
             |         AND e.event_type = 'click' AND e.u > s1.t1
             |       GROUP BY s1.user_id, s1.t1),
             |s3 AS (SELECT s2.user_id, s2.t1, s2.t2, min(e.u) AS t3
             |       FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
             |         AND e.event_type = 'purchase' AND e.u > s2.t2
             |       GROUP BY s2.user_id, s2.t1, s2.t2)
             |SELECT user_id, t1, t2, t3,
             |       1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
             |         + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS steps_completed
             |FROM s3""".stripMargin),
      "ordered funnel conversion (view -> click -> purchase): first step-N " +
        "time strictly after step N-1, per user — one keyed aggregate + " +
        "left join per step on one reused user_id partitioning, no windows, " +
        "no per-user event buffering"),

    Q("o21_retention",
      // day-grain cohorts over epoch-micros time (same µs grain as o20;
      // 86400000000 µs per day)
      (s, dir) => graft.ops.Sequences.retention(
        col("user_id"), expr("ts div 1000"), 86400000000L)(
        Tables.events(s, dir)),
      Some("""WITH act AS (SELECT DISTINCT user_id,
             |              epoch_us(ts) // 86400000000 AS d FROM events
             |             WHERE ts IS NOT NULL),
             |c AS (SELECT user_id, min(d) AS d0 FROM act GROUP BY user_id),
             |sz AS (SELECT d0, count(*) AS cohort_size FROM c GROUP BY d0),
             |cell AS (SELECT c.d0 AS cohort, a.d - c.d0 AS bucket_offset,
             |           count(*) AS n_active
             |         FROM act a JOIN c USING (user_id) GROUP BY 1, 2)
             |SELECT cohort, bucket_offset, n_active, cohort_size,
             |       CAST(n_active AS DOUBLE) / cohort_size AS retention
             |FROM cell JOIN sz ON sz.d0 = cell.cohort""".stripMargin),
      "cohort retention (day grain): per (first-active-day cohort, day " +
        "offset) the count and fraction of cohort members active that day " +
        "— shared key-hashed exchange for activity distinct + cohort min, " +
        "map-side-collapsed cell rollup, broadcast cohort sizes")
  )
}
