package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import graft.ops.Relational._

/** Per-operator unit tests for the reference-parity surface (SURVEY §2),
  * 3–10-row literal inputs with hand-computed expectations, including the
  * edge cases the reference semantics imply (SURVEY §5.2.2): empty product
  * lists for P3, inclusive ±5 min J3 bounds, A2 epoch window alignment.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("P1 filter keeps only matching records (KSA:107-109)") {
    val df = Seq(("o1", 1500.0), ("o2", 999.99), ("o3", 1000.0)).toDF("orderId", "amount")
    assert(rowsOf(filterRecords(col("amount") >= 1000)(df)) ===
      Set(Seq("o1", 1500.0), Seq("o3", 1000.0)))
  }

  test("P2 mapValues is a pure projection (KSA:114-116)") {
    val df = Seq(("o1", "alice", 5.0)).toDF("orderId", "user", "amount")
    val out = mapValues(col("user"), col("amount"))(df)
    assert(out.columns.toSeq === Seq("user", "amount"))
    assert(rowsOf(out) === Set(Seq("alice", 5.0)))
  }

  test("P3 flatMapValues: one row per element, empty list → zero rows (KSA:121-123)") {
    val df = Seq(
      ("alice", Seq("iPhone", "MacBook")),
      ("bob", Seq.empty[String]),
      ("carol", Seq("iPad"))).toDF("user", "products")
    val out = flatMapValues(Seq(col("user")), col("products"), "product")(df)
    assert(rowsOf(out) ===
      Set(Seq("alice", "iPhone"), Seq("alice", "MacBook"), Seq("carol", "iPad")))
  }

  test("P4 selectKey declares the key; rekeyEager materializes the exchange (KSA:173)") {
    val df = Seq(("o1", "a"), ("o2", "b")).toDF("orderId", "v")
    val lazyKeyed = selectKey(col("orderId"), "key")(df)
    assert(lazyKeyed.columns.contains("key"))
    // lazy variant plans no exchange on its own
    assert(!lazyKeyed.queryExecution.executedPlan.toString.contains("Exchange"))
    val eager = rekeyEager(col("orderId"), "key")(df)
    assert(eager.queryExecution.optimizedPlan.toString.contains("RepartitionByExpression"))
    assert(rowsOf(eager.select(col("orderId"), col("v"))) === rowsOf(df))
  }

  test("G1 groupBy with key-mapper lambda = derived grouping expression (KSA:125-128)") {
    val df = Seq(("Alice", "p1"), ("adam", "p2"), ("Bob", "p3")).toDF("user", "product")
    val out = countByMappedKey(lower(substring(col("user"), 1, 1)), "first_letter")(df)
    assert(rowsOf(out) === Set(Seq("a", 2L), Seq("b", 1L)))
  }

  test("G2+A1 count by existing key (KSA:140, KSA:144)") {
    val df = Seq(("alice", 1), ("alice", 2), ("bob", 3)).toDF("user", "x")
    assert(rowsOf(countByKey(col("user"), "user")(df)) ===
      Set(Seq("alice", 2L), Seq("bob", 1L)))
  }

  test("A2 tumbling windows are epoch-aligned; boundary row starts the next window (KSA:142)") {
    // 00:00:09.999 is in window [0,10); 00:00:10.000 starts [10,20)
    val df = Seq(
      ("u", ts("2024-01-01T00:00:09.999Z")),
      ("u", ts("2024-01-01T00:00:10.000Z")),
      ("u", ts("2024-01-01T00:00:19.999Z"))).toDF("user", "ts")
    val out = windowedCountByKey(col("ts"), "10 seconds", col("user"), "user")(df)
    val base = Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    assert(rowsOf(out) === Set(Seq("u", base, 1L), Seq("u", base + 10, 2L)))
  }

  test("A2 superset: hopping windows assign each event to size/hop overlapping windows") {
    // size 20s / hop 10s: 00:00:25 is in [10,30) and [20,40)
    val df = Seq(
      ("u", ts("2024-01-01T00:00:25.000Z")),
      ("u", ts("2024-01-01T00:00:05.000Z")),
      ("v", ts("2024-01-01T00:00:10.000Z"))).toDF("user", "ts")
    val out = hoppingCountByKey(col("ts"), "20 seconds", "10 seconds",
      col("user"), "user")(df)
    val base = Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    // every event lands in exactly 2 windows; 00:00:05 in [-10,10) and [0,20)
    assert(rowsOf(out) === Set(
      Seq("u", base - 10, 1L), Seq("u", base, 1L),
      Seq("u", base + 10, 1L), Seq("u", base + 20, 1L),
      Seq("v", base, 1L), Seq("v", base + 10, 1L)))
    // differential: hopping(size=2*hop) == union of the two tumbling grids
    // (the epoch-aligned grid and nothing else — starts are hop multiples)
    val grid0 = windowedCountByKey(col("ts"), "20 seconds", col("user"), "user")(df)
    val grid1 = windowedCountByKey(col("ts"), "20 seconds", col("user"), "user")(
      df.withColumn("ts", col("ts") + expr("INTERVAL 10 SECONDS")))
      .withColumn("window_start", col("window_start") - 10)
    assert(rowsOf(out) === rowsOf(grid0.unionByName(grid1)))
  }

  test("S3 compactLatest keeps the latest value per key with deterministic ties (KSA:156-157)") {
    val df = Seq(
      ("alice", 1L, "v1"), ("alice", 3L, "v3"), ("alice", 2L, "v2"),
      ("bob", 1L, "b1")).toDF("user", "seq", "v")
    val out = compactLatest(Seq(col("user")), Seq(col("seq")))(df)
    assert(rowsOf(out) === Set(Seq("alice", 3L, "v3"), Seq("bob", 1L, "b1")))
  }

  test("J1 stream-table equi-join enriches with the current table value (KSA:162-165)") {
    val stream = Seq(("alice", "o1"), ("bob", "o2"), ("eve", "o3")).toDF("user", "orderId")
    val table = Seq(("alice", "gold"), ("bob", "basic")).toDF("user", "profile")
    val out = streamTableJoin(table, Seq("user"))(stream)
    assert(rowsOf(out) ===
      Set(Seq("alice", "o1", "gold"), Seq("bob", "o2", "basic"))) // eve: no profile → dropped (inner)
  }

  test("J2 global-table join on extracted foreign key applies the value joiner (KSA:167-171)") {
    val stream = Seq(("o1", "gold", 100.0), ("o2", "basic", 50.0)).toDF("orderId", "profile", "amount")
    val dim = Seq(("gold", 0.5), ("basic", 1.0)).toDF("d_profile", "factor")
    val out = globalTableJoin(dim, col("profile") === col("d_profile"))(stream)
      .withColumn("amount", col("amount") * col("factor"))
      .select(col("orderId"), col("amount"))
    assert(rowsOf(out) === Set(Seq("o1", 50.0), Seq("o2", 50.0)))
  }

  test("J3 interval join bounds are inclusive at exactly ±tolerance (KSA:177-186)") {
    val tolUs = 300000000L // ±5 min in micros
    val left = Seq(("k", 1000000000L)).toDF("k", "lts")
    val right = Seq(
      ("k", 1000000000L - tolUs),     // exactly -5 min: kept
      ("k", 1000000000L + tolUs),     // exactly +5 min: kept
      ("k", 1000000000L - tolUs - 1), // 1 µs too early: dropped
      ("k", 1000000000L + tolUs + 1)  // 1 µs too late: dropped
    ).toDF("rk", "rts")
    val out = intervalJoin(right, col("k") === col("rk"), col("lts"), col("rts"), tolUs)(left)
    assert(out.count() === 2)
    assert(rowsOf(out.select(col("rts"))) ===
      Set(Seq(1000000000L - tolUs), Seq(1000000000L + tolUs)))
  }

  test("G superset: cogroup folds several streams into one keyed table in ONE shuffle") {
    val a = Seq(("u1", 10.0), ("u1", 5.0), ("u2", 1.0)).toDF("k", "v")
    val b = Seq(("u1", 2.0), ("u3", 7.0)).toDF("k", "v")
    val out = cogroupAgg("user",
      Seq(("x", a, col("k"), col("v")), ("y", b, col("k"), col("v"))))
    assert(rowsOf(out) === Set(
      Seq("u1", 15.0, 2L, 2.0, 1L),
      Seq("u2", 1.0, 1L, 0.0, 0L),
      Seq("u3", 0.0, 0L, 7.0, 1L)))
    // the DSL's one-state-store property: a single exchange feeds the
    // aggregate (tagged union, not per-stream aggregates joined); count
    // in the plan string — AQE wraps the exec tree so collect() sees none
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // AQE toString repeats the plan
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("S3 tombstones: key drops only when the newest record is a delete marker") {
    val df = Seq(
      ("alice", 1L, Some("v1")), ("alice", 2L, None), // tombstone newest → gone
      ("bob", 1L, None), ("bob", 2L, Some("b2")),     // re-insert beats old tombstone
      ("carol", 1L, Some("c1"))).toDF("user", "seq", "v")
    val out = compactLatestWithTombstones(Seq(col("user")), Seq(col("seq")), col("v"))(df)
    assert(rowsOf(out) === Set(Seq("bob", 2L, "b2"), Seq("carol", 1L, "c1")))
  }

  test("J3 superset: full-outer interval join null-pads BOTH unmatched sides") {
    val tolUs = 300000000L
    val left = Seq(("k", 1000000000L), ("lonely", 5L)).toDF("k", "lts")
    val right = Seq(
      ("k", 1000000000L + tolUs),      // matched at the inclusive edge
      ("k", 9000000000L),              // same key, out of band: null-padded
      ("other", 1000000000L)           // no matching key: null-padded
    ).toDF("rk", "rts")
    val out = intervalJoin(right, col("k") === col("rk"), col("lts"), col("rts"),
      tolUs, "full_outer")(left)
      .select(col("k"), col("rk"), col("rts"))
    assert(rowsOf(out) === Set(
      Seq("k", "k", 1000000000L + tolUs),
      Seq("lonely", null, null),
      Seq(null, "k", 9000000000L),
      Seq(null, "other", 1000000000L)))
  }

  test("branch routes first-match-wins with a default branch; merge reunites losslessly") {
    val df = Seq((1, Some(350)), (2, Some(150)), (3, Some(50)), (4, None))
      .toDF("id", "v")
    val bs = branch(Seq(col("v") >= 300, col("v") >= 100))(df)
    assert(bs.size === 3)
    assert(rowsOf(bs(0).select(col("id"))) === Set(Seq(1)))
    assert(rowsOf(bs(1).select(col("id"))) === Set(Seq(2))) // 350 already taken by branch 0
    assert(rowsOf(bs(2).select(col("id"))) === Set(Seq(3), Seq(4))) // incl. NULL → default
    assert(rowsOf(merge(bs)) === rowsOf(df)) // partition: nothing lost or duplicated
  }

  test("salted join equals the plain join, including duplicate and hot keys") {
    val left = Seq.tabulate(40)(i => (if (i % 4 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val right = Seq(("hot", "H"), ("k1", "A"), ("k1", "B"), ("k2", "C")).toDF("k", "d")
    val plain = left.join(right, Seq("k"))
    val salted = saltedJoin(right, "k", 4)(left)
    assert(rowsOf(salted) === rowsOf(plain))
    assert(salted.count() === plain.count())
  }

  test("J4 filtered join drops rows failing the Option-joiner predicate (KSA:179-180)") {
    val orders = Seq(("o1", "u1"), ("o2", "u2")).toDF("orderId", "user")
    val payments = Seq(("o1", "PAID"), ("o2", "PENDING")).toDF("p_orderId", "status")
    val out = filteredJoin(payments, col("orderId") === col("p_orderId"),
      col("status") === "PAID")(orders)
    assert(rowsOf(out.select(col("orderId"))) === Set(Seq("o1")))
  }

  test("capPerKey keeps at most k deterministic survivors per key, equal to the window rank form") {
    val df = (1L to 40L).map(i => (s"g${i % 3}", i)).toDF("src", "doc")
    val out = capPerKey(col("src"), col("doc"), 5)(df)
    val counts = out.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 5L)) // every group capped (all have >5)
    // small group survives whole
    val small = capPerKey(col("src"), col("doc"), 5)(
      Seq(("solo", 1L), ("solo", 2L)).toDF("src", "doc"))
    assert(small.count() === 2L)
    // equals the window-rank formulation (same score, same tiebreak)
    val score = conv(substring(md5(col("doc").cast("string")), 1, 12), 16, 10)
      .cast("double")
    val viaWindow = df
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(score.desc, col("doc"))))
      .filter(col("rn") <= 5)
      .select(col("src").as("key"), col("doc").as("id"))
    assert(rowsOf(out) === rowsOf(viaWindow))
  }

  test("asofJoin: latest at-or-before match, inclusive ties, nulls before any right row") {
    val quotes = Seq( // (sym, ts, px, seq)
      ("A", 3L, 1.0, 1L), ("A", 7L, 2.0, 2L),
      ("A", 7L, 3.0, 3L), // same (key, ts): greatest tiebreak must win
      ("B", 5L, 9.0, 4L)).toDF("sym", "qts", "px", "seq")
    val trades = Seq(
      ("A", 2L, "t0"), // before any quote → null
      ("A", 3L, "t1"), // ts tie with quote → inclusive match (px=1.0)
      ("A", 8L, "t2"), // latest of the two ts=7 quotes → px=3.0 (seq 3)
      ("B", 9L, "t3"), // other key
      ("C", 1L, "t4")  // key with no quotes at all → null
    ).toDF("sym", "tts", "tid")
    val out = asofJoin(quotes, Seq("sym"), "tts", "qts",
      Seq("px", "seq"), "seq")(trades)
    assert(out.columns.toSeq === Seq("sym", "tts", "tid", "px", "seq"))
    assert(rowsOf(out.select(col("tid"), col("px"), col("seq"))) === Set(
      Seq("t0", null, null),
      Seq("t1", 1.0, 1L),
      Seq("t2", 3.0, 3L), // all attached columns from the SAME matched row
      Seq("t3", 9.0, 4L),
      Seq("t4", null, null)))
    // one exchange (the key partitioning), never a nested-loop range join
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
  }

  test("scd2 collapses unchanged upserts and chains validity intervals") {
    val ch = Seq( // (key, value, ord)
      ("k1", "new", 1L),
      ("k1", "new", 2L),      // re-upsert of the same value: no new version
      ("k1", "paid", 3L),
      ("k1", "paid", 4L),
      ("k1", "shipped", 5L),
      ("k2", "new", 1L),
      ("k3", null, 1L),       // null value is a version like any other
      ("k3", null, 2L),       // ...collapsed null-safely
      ("k3", "fixed", 3L)
    ).toDF("k", "v", "ord")
    val out = scd2(Seq(col("k")), col("v"), col("ord"))(ch)
    assert(rowsOf(out) === Set(
      Seq("k1", "new", 1L, 3L),
      Seq("k1", "paid", 3L, 5L),
      Seq("k1", "shipped", 5L, null),
      Seq("k2", "new", 1L, null),
      Seq("k3", null, 1L, 3L),
      Seq("k3", "fixed", 3L, null)))
    // intervals chain: every non-null valid_to equals the next valid_from
    // (asserted by construction above) and each key has exactly one open row
    assert(out.filter(col("valid_to").isNull).count() === 3)
  }
}
