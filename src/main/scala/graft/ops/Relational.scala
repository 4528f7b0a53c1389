package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's operator surface (SURVEY.md §2), re-expressed as a library
  * of declarative DataFrame combinators. Each function cites the reference
  * expression it reproduces (KSA = reference
  * `src/main/scala/KafkaStreamsApp.scala`).
  *
  * Design: every combinator is `DataFrame => DataFrame` over declarative
  * Column expressions, so the whole pipeline stays inside Catalyst — filters
  * push down to the scan, projections prune columns, joins pick
  * broadcast/SMJ/SHJ by statistics, and whole-stage codegen fuses chains.
  * This is deliberate (SURVEY.md §4.2): zero custom planner rules are needed
  * for reference parity; the operators below ARE the logical plan.
  *
  * These run identically on batch DataFrames and streaming DataFrames
  * (Structured Streaming shares the API) — see [[graft.streaming.Topologies]]
  * for the streaming wiring with watermarks.
  */
object Relational {

  // ---- stateless row operators (SURVEY §2.2) ----

  /** P1 — `stream.filter((k, v) => Boolean)` (KSA:107-109). */
  def filterRecords(pred: Column)(df: DataFrame): DataFrame = df.filter(pred)

  /** P2 — `stream.mapValues(v => v2)` (KSA:114-116): a pure projection. */
  def mapValues(cols: Column*)(df: DataFrame): DataFrame = df.select(cols: _*)

  /** P3 — `stream.flatMapValues(v => Iterable)` (KSA:121-123, KSA:185):
    * one output row per array element; empty arrays yield zero rows,
    * matching the reference's Iterable semantics.
    */
  def flatMapValues(keep: Seq[Column], arr: Column, as: String)(df: DataFrame): DataFrame =
    df.select(keep :+ explode(arr).as(as): _*)

  /** P4 — `stream.selectKey((k, v) => k2)` (KSA:173). In Kafka Streams this
    * marks a repartition-topic boundary; Spark's analog (shuffle exchange) is
    * planned lazily by `EnsureRequirements` at the next key-based operator,
    * which is strictly better (no shuffle if the new key is never grouped or
    * joined on). We therefore only *declare* the key column; callers that
    * need an eager co-location (e.g. to reuse one partitioning across several
    * downstream ops) use [[rekeyEager]].
    */
  def selectKey(newKey: Column, as: String)(df: DataFrame): DataFrame =
    df.withColumn(as, newKey)

  /** P4 (eager variant) — materialize the shuffle now so several downstream
    * keyed ops reuse one exchange instead of each planning their own.
    */
  def rekeyEager(newKey: Column, as: String)(df: DataFrame): DataFrame =
    df.withColumn(as, newKey).repartition(col(as))

  // ---- grouping & aggregation (SURVEY §2.3) ----

  /** G1 — `stream.groupBy((k, v) => newKey)` (KSA:125-128): the key-mapper
    * lambda becomes the derived grouping expression; the repartition topic
    * becomes the hash-partitioned shuffle with map-side partial aggregation.
    */
  def countByMappedKey(keyExpr: Column, as: String)(df: DataFrame): DataFrame =
    df.groupBy(keyExpr.as(as)).agg(count(lit(1)).as("cnt"))

  /** G2 + A1 — `stream.groupByKey.count()` (KSA:140, KSA:144): running count
    * per existing key. Batch result = the streaming KTable's final fixpoint
    * (SURVEY §2.3 note on emission cadence).
    */
  def countByKey(key: Column, as: String)(df: DataFrame): DataFrame =
    df.groupBy(key.as(as)).agg(count(lit(1)).as("cnt"))

  /** A2 — `grouped.windowedBy(TimeWindows.of(10s)).aggregate(0L)(+1)`
    * (KSA:142, KSA:146-148): tumbling event-time windows aligned to epoch.
    * `Windowed[K]` ≈ the `window(start, end)` struct; we expose the start as
    * epoch seconds (bigint) so results are engine-portable.
    */
  def windowedCountByKey(ts: Column, windowDuration: String, key: Column, as: String)(
      df: DataFrame): DataFrame =
    df.groupBy(window(ts, windowDuration), key.as(as))
      .agg(count(lit(1)).as("cnt"))
      .select(col(as), col("window.start").cast("long").as("window_start"), col("cnt"))

  /** A2 superset — HOPPING event-time windows (Kafka Streams
    * `TimeWindows.of(size).advanceBy(hop)`; the reference uses only the
    * tumbling special case size == hop, KSA:142). Each event lands in
    * size/hop overlapping epoch-aligned windows; Spark's `window(ts, size,
    * hop)` generates those assignments INSIDE the scan projection (an
    * explode of size/hop structs per row — no self-join, no window
    * function), then one hash aggregate with map-side combine, so the
    * shuffle carries (key, window) partial counts, not size/hop copies of
    * the raw stream. Same output contract as [[windowedCountByKey]].
    */
  def hoppingCountByKey(ts: Column, windowDuration: String, hopDuration: String,
      key: Column, as: String)(df: DataFrame): DataFrame =
    df.groupBy(window(ts, windowDuration, hopDuration), key.as(as))
      .agg(count(lit(1)).as("cnt"))
      .select(col(as), col("window.start").cast("long").as("window_start"), col("cnt"))

  /** A2 superset — batch fixpoint of Kafka Streams
    * `suppress(untilWindowCloses(withGrace(D)))` (emit-FINAL windowed
    * aggregation; the reference's KTable emits every update, KSA:146-150 —
    * suppress is the DSL's one-result-per-window variant). The Spark twin
    * is APPEND output mode on a watermarked windowed aggregate: a window
    * emits exactly once, when the watermark (max event time − D) passes
    * its end; windows still open at end-of-input are never emitted. This
    * batch form reproduces that final emitted set: the same tumbling
    * count, filtered to windows whose end ≤ max(ts) − D. The max(ts)
    * scalar is a single-row broadcast (the exempted scalar idiom) — no
    * extra shuffle beyond the aggregate's own; at 100 TB the watermark
    * scalar is one tiny aggregate over a column the scan already reads.
    * StreamingSpec asserts the append-mode run emits each closed window
    * exactly once and equals this fixpoint.
    */
  def suppressedWindowedCountFinal(ts: Column, windowDuration: String,
      delaySeconds: Long, key: Column, as: String)(df: DataFrame): DataFrame = {
    val wm = df.agg((max(ts).cast("long") - delaySeconds).as("wm_s"))
    df.groupBy(window(ts, windowDuration), key.as(as))
      .agg(count(lit(1)).as("cnt"))
      .select(col(as), col("window.start").cast("long").as("window_start"),
        col("window.end").cast("long").as("window_end"), col("cnt"))
      .crossJoin(broadcast(wm))
      .filter(col("window_end") <= col("wm_s"))
      .select(col(as), col("window_start"), col("cnt"))
  }

  /** S3 batch semantics — compacted-topic KTable (`builder.table`,
    * KSA:156-157; `cleanup.policy=compact` KSA:35): latest value per key.
    * Also A3's final state (`ktable.toStream`, KSA:150 — in batch the
    * changelog's fixpoint IS the table). Orders by `order` descending with
    * deterministic tiebreaks supplied by the caller.
    */
  def compactLatest(partitionKeys: Seq[Column], order: Seq[Column])(df: DataFrame): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(partitionKeys: _*).orderBy(order.map(_.desc): _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** S3 with TOMBSTONES — the full compacted-topic KTable contract: a
    * null value at a key is a delete marker (Kafka tombstone,
    * `cleanup.policy=compact` removes the key once the tombstone is the
    * newest record), so the table's fixpoint drops keys whose LATEST
    * record is null-valued. Election first, then the null filter: a
    * tombstone only deletes if nothing newer re-inserted the key — an
    * eager `filter(value.isNotNull)` BEFORE compaction would wrongly
    * resurrect the previous value.
    */
  def compactLatestWithTombstones(partitionKeys: Seq[Column], order: Seq[Column],
      value: Column)(df: DataFrame): DataFrame =
    compactLatest(partitionKeys, order)(df).filter(value.isNotNull)

  // ---- joins (SURVEY §2.4) ----

  /** J1 — stream–table equi-join (`stream.join(ktable)`, KSA:162-165):
    * co-partitioned lookup of the current table value. Batch: a plain
    * equi-join; Catalyst picks broadcast vs sort-merge from statistics (with
    * AQE re-planning at runtime).
    */
  def streamTableJoin(table: DataFrame, keys: Seq[String])(stream: DataFrame): DataFrame =
    stream.join(table, keys)

  /** J2 — stream–GlobalKTable join with foreign-key extractor
    * (KSA:167-171): the key-extractor lambda (KSA:169) becomes `joinExpr`; the
    * replicated global table becomes an explicit `broadcast()` so the planner
    * is pinned to the reference's distribution semantics (replicate the dim
    * to every node, never shuffle the stream).
    */
  def globalTableJoin(dim: DataFrame, joinExpr: Column)(stream: DataFrame): DataFrame =
    stream.join(broadcast(dim), joinExpr)

  /** J3 — stream–stream windowed join (`JoinWindows.of(5 min)`,
    * KSA:177-186): equi-join on the key plus a symmetric event-time band,
    * bounds inclusive (Kafka Streams `JoinWindows` is inclusive on both
    * ends). `leftTs`/`rightTs` must be the same unit (we use epoch micros).
    */
  def intervalJoin(right: DataFrame, eq: Column, leftTs: Column, rightTs: Column,
      toleranceUs: Long, joinType: String = "inner")(left: DataFrame): DataFrame =
    left.join(right,
      eq && (rightTs >= leftTs - toleranceUs) && (rightTs <= leftTs + toleranceUs),
      joinType)

  /** J4 — filtered join (joiner returning `Option`, KSA:179-180 +
    * `flatMapValues(_.toIterable)` KSA:185): an inner join with a residual
    * predicate; `None` results = rows failing the predicate, dropped.
    */
  def filteredJoin(right: DataFrame, eq: Column, residual: Column)(left: DataFrame): DataFrame =
    left.join(right, eq).filter(residual)

  /** G-superset — COGROUP (Kafka Streams `KGroupedStream.cogroup`, DSL
    * 2.5+): aggregate several differently-shaped streams into ONE keyed
    * table. The DSL's defining property is a single state store fed by
    * all inputs; the batch analog is union-with-tags into a single hash
    * aggregate — ONE shuffle of the combined stream with map-side
    * partials, never a join of per-stream aggregates (which would
    * shuffle each input separately and then join the results).
    *
    * Each input contributes (tag, frame, key, value); the output is one
    * row per key with `<tag>_sum` / `<tag>_cnt` per input (absent
    * streams contribute 0 — the DSL aggregator's initializer).
    */
  def cogroupAgg(as: String, inputs: Seq[(String, DataFrame, Column, Column)]): DataFrame = {
    require(inputs.nonEmpty, "cogroup needs at least one input")
    val tagged = inputs.map { case (tag, df, key, value) =>
      df.select(key.as(as), value.as("__v"), lit(tag).as("__src"))
    }.reduce(_ unionByName _)
    val aggs = inputs.flatMap { case (tag, _, _, _) => Seq(
      sum(when(col("__src") === tag, col("__v")).otherwise(lit(0))).as(s"${tag}_sum"),
      sum(when(col("__src") === tag, 1L).otherwise(0L)).as(s"${tag}_cnt"))
    }
    tagged.groupBy(col(as)).agg(aggs.head, aggs.tail: _*)
  }

  /** Cap the number of rows per key at `k`, deterministically — "at most
    * N documents per source/domain", the standard cardinality-control step
    * in corpus curation. Survivors are selected by descending 48-bit
    * md5-prefix of the id (a stable pseudo-random order: the same rows
    * win on every run and engine, ties broken by lowest id), through the
    * bounded [[graft.functions.TopKByScore]] aggregate: map-side buffers
    * hold at most k entries per key, so a key with billions of rows never
    * funnels through the single-task sort a `Window.partitionBy(key)`
    * rank would plan. The 48-bit prefix is exact as a double (< 2^53);
    * prefix collisions fall back to the id tiebreak, which both the
    * aggregate and the window/QUALIFY formulation share.
    *
    * @param id a LONG id column (the aggregate's element type)
    */
  def capPerKey(key: Column, id: Column, k: Int)(df: DataFrame): DataFrame = {
    val score =
      conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10).cast("double")
    df.select(key.as("key"), id.as("id"))
      .groupBy(col("key"))
      .agg(graft.functions.TopKByScore(k)(score, col("id")).as("hits"))
      .select(col("key"), explode(col("hits")).as("h"))
      .select(col("key"), col("h.id").as("id"))
  }

  /** AS-OF (point-in-time) left join: attach to each left row the LATEST
    * right row with the same key whose timestamp is at or before the left
    * row's — the time-series lookup (DuckDB/kdb ASOF JOIN, pandas
    * merge_asof) that Spark has no native operator for.
    *
    * Scale shape: the naive formulation — a range-condition join plus a
    * per-left-row max — pairs every left row with ALL earlier right rows
    * before discarding all but one (quadratic per key, and Spark would
    * plan the range join as a broadcast nested loop). Instead the two
    * sides are UNIONED with a side tag, hash-partitioned by key, sorted
    * within each key by (ts, tag, tiebreak), and the right row rides
    * forward via `last(ignoreNulls)` over ROWS UNBOUNDED PRECEDING: one
    * shuffle of left+right, one per-key sort, zero pair amplification —
    * the same merge-scan an ASOF-specialized engine runs, expressed in
    * Catalyst operators. Right rows sort BEFORE left rows at equal ts
    * (at-or-before is inclusive); among right rows sharing (key, ts) the
    * greatest `rightTiebreak` wins, making the result deterministic.
    * Right values arrive as ONE struct, so all attached columns come from
    * the SAME matched row (per-column carry would mix rows when a right
    * column is null). Left rows with no prior right row get nulls.
    *
    * @param right         the lookup side
    * @param keys          equality key column names present on both sides
    * @param leftTs        left timestamp column name (comparable to rightTs)
    * @param rightTs       right timestamp column name
    * @param rightVals     right columns to attach (must not collide with left's)
    * @param rightTiebreak right column ordering rows within (key, ts) ties
    */
  def asofJoin(right: DataFrame, keys: Seq[String], leftTs: String, rightTs: String,
      rightVals: Seq[String], rightTiebreak: String)(left: DataFrame): DataFrame = {
    require(keys.nonEmpty, "asofJoin requires at least one equality key")
    require(rightVals.nonEmpty, "asofJoin requires right value columns to attach")
    val keyCols = keys.map(col)
    val lrowType = left.select(struct(left.columns.map(col): _*).as("s")).schema("s").dataType
    val rvalsType = right.select(struct(rightVals.map(col): _*).as("s")).schema("s").dataType
    val tbType = right.schema(rightTiebreak).dataType
    // rows with a NULL timestamp are dropped on BOTH sides — the same
    // unplaceable-record contract as scd2 and transitionCounts. A NULL
    // right row is never "at-or-before" anything, and without the filter
    // it sorts NULLS-FIRST ahead of every real row and its values are
    // carried into every left row until a real right row overwrites
    // them. A NULL left row has no point on the timeline to look back
    // FROM; note SQL's own `l.ts >= r.ts` matches it to nothing, while
    // DuckDB's ASOF implementation treats the NULL as +infinity and
    // hands it the key's LAST right row — the drop is the semantics a
    // plain-SQL oracle can state (`WHERE ts IS NOT NULL` on both inputs).
    val l = left.filter(col(leftTs).isNotNull).select(keyCols ++ Seq(
      col(leftTs).as("__ts"), lit(1).as("__is_left"),
      lit(null).cast(tbType).as("__tb"),
      struct(left.columns.map(col): _*).as("__lrow"),
      lit(null).cast(rvalsType).as("__rvals")): _*)
    val r = right.filter(col(rightTs).isNotNull).select(keyCols ++ Seq(
      col(rightTs).as("__ts"), lit(0).as("__is_left"),
      col(rightTiebreak).as("__tb"),
      lit(null).cast(lrowType).as("__lrow"),
      struct(rightVals.map(col): _*).as("__rvals")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__is_left"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__rvals", last(col("__rvals"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(col("__lrow.*") +: rightVals.map(v => col(s"__rvals.$v").as(v)): _*)
  }

  /** Slowly-changing-dimension type 2: turn an upsert changelog
    * (key, value, order) into validity intervals — each output row says
    * "`key` held `value` from `valid_from` until `valid_to`" (null
    * `valid_to` = still current). Consecutive records carrying the SAME
    * value collapse into one interval (a re-upsert of an unchanged value
    * is not a new version — the standard SCD2 rule), null-safely, so a
    * null value is one version like any other.
    *
    * The [[compactLatest]] operator is the type-1 half of this pair
    * (latest value only); this keeps history. Both window per key: one
    * shuffle on the dimension key, per-key sort bounded by that key's
    * history length — the SCD2 shape every warehouse runs, and the right
    * one at scale because dimension histories are short relative to the
    * fact tables they describe.
    *
    * @param order a per-key-unique orderable column (combine timestamp
    *              and a tiebreak into one scalar if needed — uniqueness
    *              is what makes the versioning deterministic)
    */
  def scd2(keys: Seq[Column], value: Column, order: Column)(df: DataFrame): DataFrame = {
    require(keys.nonEmpty, "scd2 requires at least one key column")
    // a changelog record with a NULL ordinal has no place in the version
    // history — dropped, like a timestampless record at a window operator
    val base = df.select(keys :+ value.as("value") :+ order.as("valid_from"): _*)
      .filter(col("valid_from").isNotNull)
    val w = Window.partitionBy(keys: _*).orderBy(col("valid_from"))
    base
      .withColumn("__prev", lag(col("value"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // first record per key, or a value change. Null-safe equality alone
      // cannot express "first": a key OPENING with a null value has
      // null <=> lag-null = true and would vanish — hence the rank test.
      .filter(col("__rn") === 1 || !(col("value") <=> col("__prev")))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .drop("__prev", "__rn")
  }

  /** DSL `stream.split().branch(...).defaultBranch()` analog: route each
    * record to the FIRST branch whose predicate matches (Kafka Streams
    * branch semantics — predicates are tried in order, a record lands in
    * exactly one branch). Returns `predicates.size + 1` DataFrames, the
    * last being the no-match remainder. Compose with [[merge]] for
    * tagged-union pipelines. Each branch is a filter over the same source
    * plan — Catalyst pushes all of them to the scan.
    */
  def branch(predicates: Seq[Column])(df: DataFrame): Seq[DataFrame] = {
    // null-safe: a NULL predicate result means "no match" (→ default
    // branch), like CASE WHEN — under raw three-valued logic a null would
    // drop the record from EVERY branch and break the partition property
    val norm = predicates.map(p => coalesce(p, lit(false)))
    val firstMatch = norm.zipWithIndex.map { case (p, i) =>
      norm.take(i).foldLeft(p)((acc, prev) => acc && !prev)
    }
    val remainder = norm.map(p => !p).reduce(_ && _)
    (firstMatch :+ remainder).map(df.filter)
  }

  /** DSL `stream.merge(other)` analog: union by column name — works for
    * batch and streaming inputs alike (streaming union is stateless).
    */
  def merge(streams: Seq[DataFrame]): DataFrame =
    streams.reduce(_.unionByName(_))

  /** Salted inner equi-join for EXTREME key skew: when one join key is so
    * hot that its rows exceed a single task (AQE's skew-join split handles
    * moderate skew automatically; salting is the manual fallback beyond
    * that). The left (big, skewed) side gets a deterministic per-row salt
    * in [0, saltBuckets); the right side is replicated once per salt value;
    * the join key becomes (key, salt), splitting each hot key's hash group
    * across `saltBuckets` tasks. Result set is identical to the plain
    * inner join — only the physical distribution changes. Right-side
    * amplification is `saltBuckets`×, so use for joins whose right side is
    * mid-sized: too big to broadcast, small enough to replicate a few ways.
    */
  def saltedJoin(right: DataFrame, key: String, saltBuckets: Int)(left: DataFrame): DataFrame = {
    require(saltBuckets > 1, s"saltBuckets must be > 1, got $saltBuckets")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
