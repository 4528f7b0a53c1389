package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user running totals: the accumulator for [[Stateful.runningTotals]]. */
final case class UserTotals(user: String, orders: Long, products: Long, amount: Double)

/** A profile-table changelog record (the compacted-topic upsert stream
  * behind `builder.table`, KSA:156-157): at `ts`, `user`'s profile became
  * `profile`.
  */
final case class ProfileUpdate(user: String, profile: String, ts: Timestamp)

/** Internal co-processing envelope for [[Stateful.streamTableJoinExact]]:
  * order events and profile upserts unioned into one keyed stream.
  */
final case class CoEvent(user: String, isProfile: Boolean, profile: String,
    orderId: String, amount: Double, ts: Timestamp)

/** Output of the exact stream–table join: an order enriched with the
  * profile current when it was processed.
  */
final case class EnrichedOrder(orderId: String, user: String, amount: Double,
    profile: String, ts: Timestamp)

/** Upsert envelope for [[Stateful.tableTableJoinExact]]: both changelogs
  * unioned into one keyed stream, tagged by side.
  */
final case class TableSide(user: String, isRight: Boolean, v: String, ts: Timestamp)

/** Per-key latest value of each side — the two-table join state. */
final case class PairState(left: String, right: String)

/** One row of the joined changelog: the key and both sides' CURRENT
  * values at `ts` (null until that side has upserted — the outer view).
  */
final case class JoinedPair(user: String, left: String, right: String, ts: Timestamp)

/** Child-table changelog record for the FK join: at `ts`, child `id`'s
  * value became `v` with foreign key `fk` (null = no parent reference).
  */
final case class ChildUpdate(id: String, fk: String, v: String, ts: Timestamp)

/** Stage-1 → stage-2 subscription event of the FK join (Kafka Streams'
  * subscription topic record, keyed by the PARENT key): child `id` now
  * subscribes to parent `fk` carrying value `v`, or drops a stale
  * subscription after an fk move (`subscribe = false`).
  */
final case class FkSubscription(fk: String, id: String, v: String,
    subscribe: Boolean, ts: Timestamp)

/** Stage-2 envelope: subscriptions and parent upserts, one keyed stream. */
final case class FkEvent(fk: String, isParent: Boolean, parentV: String,
    id: String, childV: String, subscribe: Boolean, ts: Timestamp)

/** Stage-2 state per parent key: the parent's current value and the
  * subscribed children with their current values (Kafka Streams'
  * subscription store). Size = O(fk fan-in) per key.
  */
final case class FkParentState(parentV: String, children: Map[String, String])

/** One row of the FK-join changelog, keyed by CHILD id: the child's
  * value, its current fk, and that parent's current value.
  */
final case class FkJoined(id: String, v: String, fk: String, parentV: String,
    ts: Timestamp)

/** One retract/add delta of a table re-group aggregation
  * ([[Stateful.tableRegroupDeltas]]): the key's move between groups as
  * ±1 contributions.
  */
final case class RegroupDelta(group: String, delta: Long, ts: Timestamp)

/** Per-key state of [[Stateful.slidingCounts]]: event timestamps (ms)
  * inside the retention horizon. Size = rate × (window + grace) per key —
  * the same bound as Kafka Streams' sliding-window store.
  */
final case class SlidingBuf(ts: Seq[Long])

/** One sliding-window changelog row: the count over `(endMs − size,
  * endMs]` for key `user`. Re-emitted with a larger count when a late
  * tie/mate lands in the window — last row per (user, endMs) is the
  * window's final value.
  */
final case class SlidingCount(user: String, endMs: Long, cnt: Long)

/** Custom per-key state — the GENERAL form of the reference's windowed
  * custom fold (`aggregate(initializer)(adder)`, KSA:146-148). The
  * built-in aggregates cover the reference's actual folds (count); this is
  * the escape hatch a user needs the moment their adder isn't expressible
  * as a SQL aggregate: `KeyValueGroupedDataset.mapGroupsWithState` holds
  * one accumulator per key in the state store (RocksDB-backed at scale,
  * exactly the role of Kafka Streams' per-key state stores), and emits the
  * refreshed value each micro-batch (update mode = toStream changelog).
  *
  * Scale notes: state is partitioned by key across executors; memory is
  * O(distinct keys × accumulator size) cluster-wide. For keys that stop
  * arriving, use [[Stateful.runningTotalsTtl]] — unbounded key spaces
  * need ttl'd state, same discipline as compacted-topic retention.
  */
object Stateful {

  /** THE running-totals fold — the single definition every generation of
    * the operator shares (`mapGroupsWithState`, event-time-TTL,
    * `transformWithState`, and the batch fixpoint oracle), so the oracle
    * cannot silently drift from the operators it checks.
    */
  private[streaming] def foldTotals(user: String, prev: UserTotals,
      es: IterableOnce[OrderEvent]): UserTotals =
    es.iterator.foldLeft(prev) { (acc, e) =>
      UserTotals(user, acc.orders + 1, acc.products + e.products.size,
        acc.amount + e.amount)
    }

  /** Running (orders, products, amount) totals per user, one state entry
    * per key, updated per micro-batch. Works on batch Datasets too (state
    * starts empty, one group pass) — the shared-fixpoint property the
    * streaming tests assert.
    */
  def runningTotals(orders: Dataset[OrderEvent]): Dataset[UserTotals] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders.groupByKey(_.user)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (user: String, events: Iterator[OrderEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0L, 0.0))
          val next = foldTotals(user, prev, events)
          state.update(next)
          next
      }
  }

  /** [[runningTotals]] with idle-state TTL — the discipline the object
    * scaladoc above demands for unbounded key spaces: a key that receives
    * no events for `idleMs` of EVENT time has its accumulator DROPPED from
    * the state store once the watermark passes its idle deadline, so
    * cluster-wide state is bounded by (active keys × accumulator size)
    * instead of (all keys ever seen) — the same retention contract as a
    * TTL'd compacted topic. A key that reappears after expiry restarts
    * its totals from zero.
    *
    * Event-time (not processing-time) timeout, deliberately: expiry then
    * rides the same watermark that bounds every other state store in the
    * engine — deterministic, replayable, and free of the busy-spin
    * ProcessingTimeTimeout causes (its `shouldRunAnotherBatch` is
    * unconditionally true, so an armed idle deadline makes the engine run
    * empty micro-batches back-to-back between data arrivals). The input
    * must carry a watermark on `ts`; `watermarkDelay` applies it.
    * Streaming-only by nature (timeouts never fire in batch — use
    * [[runningTotals]] as the batch fixpoint).
    *
    * `flatMapGroupsWithState` rather than `mapGroupsWithState` because the
    * timeout invocation must emit NOTHING (there is no refreshed value for
    * an expiring key — mapGroups would be forced to re-emit stale totals).
    */
  def runningTotalsTtl(orders: Dataset[OrderEvent], idleMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "0 seconds"): Dataset[UserTotals] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders.withWatermark("ts", watermarkDelay)
      .as[OrderEvent]
      .groupByKey(_.user)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (user: String, events: Iterator[OrderEvent], state: GroupState[UserTotals]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val evs = events.toSeq // the fold AND the deadline both need them
            val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0L, 0.0))
            val next = foldTotals(user, prev, evs)
            state.update(next)
            // re-arm on every batch that touches the key: idle time counts
            // from LAST activity. Clamped above the current watermark —
            // Spark rejects a deadline the watermark already passed (a key
            // whose events arrive at the watermark edge still gets one
            // full idle period).
            val deadline = math.max(evs.map(_.ts.getTime).max + idleMs,
              state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(deadline)
            Iterator.single(next)
          }
      }
  }

  /** EXACT KTable–KTable join (`ktableA.outerJoin(ktableB)` — the DSL's
    * two-changelog join, unused by the reference but core table surface):
    * both inputs are upsert streams keyed by `user`; per key the state
    * holds each side's latest value, and EVERY upsert on either side
    * emits the refreshed joined row with the other side's current value
    * (null until that side exists — the full-outer view). The emitted
    * stream is the join's changelog; its last row per key is the batch
    * full-outer join of the two compacted tables (the fixpoint property
    * StreamingSpec pins). Total order inside a batch: event time, then
    * left-before-right, then value — without the tiebreaks, equal-ts
    * ties keep shuffle arrival order and the result varies across runs.
    *
    * Scale: state is two values per distinct key, partitioned across
    * executors — the same O(keys) posture as Kafka Streams' two RocksDB
    * stores for this operator.
    */
  def tableTableJoinExact(left: Dataset[ProfileUpdate],
      right: Dataset[ProfileUpdate]): Dataset[JoinedPair] = {
    val spark = left.sparkSession
    import spark.implicits._
    val co = left.map(p => TableSide(p.user, isRight = false, p.profile, p.ts))
      .unionByName(right.map(p => TableSide(p.user, isRight = true, p.profile, p.ts)))
    co.groupByKey(_.user)
      .flatMapGroupsWithState[PairState, JoinedPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: String, events: Iterator[TableSide], state: GroupState[PairState]) =>
          val out = Seq.newBuilder[JoinedPair]
          var st = state.getOption.getOrElse(PairState(null, null))
          events.toSeq.sortBy(e =>
              (e.ts.getTime, if (e.isRight) 1 else 0,
                Option(e.v).getOrElse(""))).foreach { e =>
            st = if (e.isRight) st.copy(right = e.v) else st.copy(left = e.v)
            out += JoinedPair(user, st.left, st.right, e.ts)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Table RE-GROUP aggregation deltas (`ktable.groupBy(newKey)
    * .aggregate(adder, SUBTRACTOR)` — the DSL operator whose subtractor
    * retracts a key's old contribution when its value moves to another
    * group): keyed by the table's primary key, state = the key's current
    * group; each upsert emits a −1 delta to the group it leaves and a +1
    * to the one it enters (nothing when unchanged). Summing the delta
    * stream per group — a plain update-mode aggregation downstream, the
    * second hop — maintains the live re-grouped counts; the batch
    * composition's fixpoint is `compactLatest → groupBy count`
    * (`g4_table_regroup`, spec-pinned).
    */
  def tableRegroupDeltas(upserts: Dataset[ProfileUpdate]): Dataset[RegroupDelta] = {
    val spark = upserts.sparkSession
    import spark.implicits._
    upserts.groupByKey(_.user)
      .flatMapGroupsWithState[String, RegroupDelta](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, es: Iterator[ProfileUpdate], state: GroupState[String]) =>
          val out = Seq.newBuilder[RegroupDelta]
          var group = state.getOption.orNull
          es.toSeq.sortBy(e =>
              (e.ts.getTime, Option(e.profile).getOrElse(""))).foreach { e =>
            if (e.profile != group) {
              if (group != null) out += RegroupDelta(group, -1L, e.ts)
              if (e.profile != null) out += RegroupDelta(e.profile, 1L, e.ts)
              group = e.profile
            }
          }
          if (group != null) state.update(group) else state.remove()
          out.result().iterator
      }
  }

  /** STREAMING sliding windows (KS `SlidingWindows.ofTimeDifference` —
    * the per-event-bound window type; batch fixpoint `a2c_sliding_window`):
    * per key, each event defines the window `(t − size, t]`, and the
    * operator maintains the count of every window an arrival touches. An
    * arrival at `t` (re-)emits the count for every DISTINCT stored window
    * end in `[t, t + size)` — in event-time order that is just its own
    * window; a late arrival or a cross-batch tie additionally REFRESHES
    * the windows it newly falls into (update-changelog semantics, exactly
    * KS's sliding-window aggregate). Resolution: last row per
    * (user, endMs) is the window's value.
    *
    * State and lateness: timestamps older than `maxSeen − size − grace`
    * are pruned and arrivals older than `maxSeen − grace` are dropped
    * (the grace contract), so per-key state is bounded by
    * rate × (size + grace) — the KS store bound.
    */
  def slidingCounts(events: Dataset[OrderEvent], sizeMs: Long,
      graceMs: Long): Dataset[SlidingCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[SlidingBuf, SlidingCount](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: String, es: Iterator[OrderEvent], state: GroupState[SlidingBuf]) =>
          val out = Seq.newBuilder[SlidingCount]
          var buf = state.getOption.map(_.ts.toVector).getOrElse(Vector.empty[Long])
          var maxSeen = if (buf.isEmpty) Long.MinValue else buf.max
          es.toSeq.sortBy(e => (e.ts.getTime, e.orderId)).foreach { e =>
            val t = e.ts.getTime
            if (maxSeen == Long.MinValue || t >= maxSeen - graceMs) {
              buf = buf :+ t
              maxSeen = math.max(maxSeen, t)
              // windows this arrival touches: distinct ends in [t, t+size)
              buf.filter(t2 => t2 >= t && t2 < t + sizeMs).distinct.sorted
                .foreach { t2 =>
                  out += SlidingCount(user, t2,
                    buf.count(t0 => t0 > t2 - sizeMs && t0 <= t2))
                }
              buf = buf.filter(_ >= maxSeen - sizeMs - graceMs)
            } // else: beyond grace — dropped, like a watermark-late row
          }
          state.update(SlidingBuf(buf))
          out.result().iterator
      }
  }

  /** Stage 1 of the EXACT KTable FOREIGN-KEY join (Kafka Streams 2.4's
    * `ktable.join(other, fkExtractor, ...)` — the DSL's hardest operator):
    * keyed by CHILD id, state = the child's last fk. Each child upsert
    * emits the subscription delta the parent side needs: an unsubscribe
    * to the OLD parent when the fk moved (so that parent's future updates
    * stop fanning out to this child), and a subscribe to the new parent
    * carrying the child's current value. This is exactly the reference
    * DSL's subscription-topic re-key; the stage boundary that is a
    * repartition topic there is a keyed exchange here.
    */
  def fkSubscriptions(children: Dataset[ChildUpdate]): Dataset[FkSubscription] = {
    val spark = children.sparkSession
    import spark.implicits._
    children.groupByKey(_.id)
      .flatMapGroupsWithState[String, FkSubscription](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (id: String, events: Iterator[ChildUpdate], state: GroupState[String]) =>
          val out = Seq.newBuilder[FkSubscription]
          var fk = state.getOption.orNull
          events.toSeq.sortBy(e =>
              (e.ts.getTime, Option(e.v).getOrElse(""))).foreach { e =>
            if (fk != null && fk != e.fk)
              out += FkSubscription(fk, id, null, subscribe = false, e.ts)
            if (e.fk != null)
              out += FkSubscription(e.fk, id, e.v, subscribe = true, e.ts)
            fk = e.fk
          }
          if (fk != null) state.update(fk) else state.remove()
          out.result().iterator
      }
  }

  /** Stage 2 of the EXACT FK join: keyed by PARENT key, state = the
    * parent's current value plus the subscribed children (the
    * subscription store). A parent upsert fans the new value out to every
    * subscribed child; a subscribe emits the refreshed row for that child
    * if the parent exists (INNER semantics — a child whose parent has not
    * arrived emits nothing yet); an unsubscribe detaches the child and,
    * if a pair had been emitted, retracts it with a TOMBSTONE row (null
    * `v`/`parentV`) so a child whose new fk never matches does not keep
    * its stale pair. Changelog resolution per child id: take the max-ts
    * row, and at equal ts a non-null `parentV` beats the tombstone (the
    * new match and the move's retraction share the move's timestamp —
    * this is the version-resolution rule Kafka Streams implements with
    * subscription versions). Total order inside a batch: event time,
    * parent-before-subscription on ties, child id.
    */
  def fkJoinResponses(events: Dataset[FkEvent]): Dataset[FkJoined] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.fk)
      .flatMapGroupsWithState[FkParentState, FkJoined](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (fk: String, es: Iterator[FkEvent], state: GroupState[FkParentState]) =>
          val out = Seq.newBuilder[FkJoined]
          var st = state.getOption.getOrElse(FkParentState(null, Map.empty))
          es.toSeq.sortBy(e =>
              (e.ts.getTime, if (e.isParent) 0 else 1,
                Option(e.id).getOrElse(""))).foreach { e =>
            if (e.isParent) {
              st = st.copy(parentV = e.parentV)
              st.children.toSeq.sortBy(_._1).foreach { case (id, cv) =>
                out += FkJoined(id, cv, fk, e.parentV, e.ts)
              }
            } else if (e.subscribe) {
              st = st.copy(children = st.children + (e.id -> e.childV))
              if (st.parentV != null)
                out += FkJoined(e.id, e.childV, fk, st.parentV, e.ts)
            } else {
              // unsubscribe: detach AND retract — the tombstone row
              // (null v, null parentV) withdraws the old pair in case the
              // child's new fk never matches; when it does match, the
              // match row shares the move's timestamp and wins the
              // documented tie rule (at equal ts, non-null parentV wins)
              st = st.copy(children = st.children - e.id)
              if (st.parentV != null)
                out += FkJoined(e.id, null, fk, null, e.ts)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Union a subscription stream and a parent changelog into the stage-2
    * envelope (the response-side input).
    */
  def fkCoEvents(subs: Dataset[FkSubscription],
      parents: Dataset[ProfileUpdate]): Dataset[FkEvent] = {
    val spark = subs.sparkSession
    import spark.implicits._
    subs.map(s => FkEvent(s.fk, isParent = false, null, s.id, s.v, s.subscribe, s.ts))
      .unionByName(parents.map(p =>
        FkEvent(p.user, isParent = true, p.profile, null, null, subscribe = false, p.ts)))
  }

  /** The composed EXACT FK join. Chained `flatMapGroupsWithState` stages
    * are not a legal single STREAMING pipeline (Spark's unsupported-
    * operations checker), matching the reference topology, where the
    * stage boundary is a real repartition topic: run stage 1 and stage 2
    * as two hops (StreamingSpec drives them that way). In BATCH execution
    * the stages fuse into one plan and this composition is the whole
    * operator — its fixpoint equals the DataFrame inner join of the two
    * compacted tables (spec-pinned).
    */
  def fkTableJoinExact(children: Dataset[ChildUpdate],
      parents: Dataset[ProfileUpdate]): Dataset[FkJoined] =
    fkJoinResponses(fkCoEvents(fkSubscriptions(children), parents))

  /** EXACT changelog-table join (J1's hard case — SURVEY §7 "what's hard"
    * #1): the profile table is itself a STREAM of upserts, not a static
    * snapshot. Kafka Streams backs `stream.join(ktable)` with a per-key
    * state store holding the table's latest value; this reproduces that
    * with `flatMapGroupsWithState` over the UNION of both inputs keyed by
    * user: profile records upsert the state, order records read it and
    * emit enriched (inner-join: orders with no profile yet are dropped,
    * exactly the KTable-miss behavior). Within a micro-batch, events are
    * applied in event-time order, so an upsert and a later order in the
    * same batch see each other — the deterministic refinement of Kafka
    * Streams' processing-order semantics.
    *
    * Scale: state is one (user → profile) entry per key, hash-partitioned
    * across executors — identical footprint to the reference's RocksDB
    * store; the shuffle key is the join key, same as the repartition
    * topics it replaces.
    */
  def streamTableJoinExact(orders: Dataset[OrderEvent],
      profiles: Dataset[ProfileUpdate]): Dataset[EnrichedOrder] = {
    val spark = orders.sparkSession
    import spark.implicits._
    val co = orders
      .map(o => CoEvent(o.user, isProfile = false, null, o.orderId, o.amount, o.ts))
      .unionByName(
        profiles.map(p => CoEvent(p.user, isProfile = true, p.profile, null, 0.0, p.ts)))
    co.groupByKey(_.user)
      .flatMapGroupsWithState[String, EnrichedOrder](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: String, events: Iterator[CoEvent], state: GroupState[String]) =>
          val out = Seq.newBuilder[EnrichedOrder]
          var profile = state.getOption.orNull
          // total order: event time, then PROFILE-BEFORE-ORDER on equal
          // timestamps (the table-update-wins refinement), then orderId —
          // without the tiebreaks, equal-ts ties keep shuffle arrival
          // order and the join result varies across runs/retries
          events.toSeq.sortBy(e =>
              (e.ts.getTime, if (e.isProfile) 0 else 1,
                Option(e.orderId).getOrElse(""))).foreach { e =>
            if (e.isProfile) profile = e.profile
            else if (profile != null)
              out += EnrichedOrder(e.orderId, user, e.amount, profile, e.ts)
          }
          if (profile != null) state.update(profile)
          out.result().iterator
      }
  }

  /** Streaming analog of [[graft.ops.Sequences.transitionCounts]]'s
    * pair extraction: per key, emit a (from, to) row for every
    * consecutive state pair, carrying the LAST state across micro-batches
    * in per-key state (events inside a batch are sorted by event time;
    * cross-batch order is arrival order, correct once the source is
    * per-key ordered — the Kafka-partition guarantee this engine's
    * sources model). Downstream, the same `groupBy(from, to).count`
    * as the batch op — in update mode — maintains the live transition
    * matrix. Batch execution (empty initial state, one group pass) gives
    * the batch op's pairs exactly — the shared-fixpoint test property.
    */
  def transitionPairs(events: Dataset[OrderEvent]): Dataset[(String, String)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .flatMapGroupsWithState[(Boolean, String), (String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[OrderEvent], state: GroupState[(Boolean, String)]) =>
          val out = Seq.newBuilder[(String, String)]
          // (initialized, lastState) — lastState may be null (an event
          // with no products), mirroring the batch op, whose NULL states
          // occupy a position: the (x, null) pair is dropped, the
          // (null, y) pair is kept with a null from_state
          var (have, last) = state.getOption.getOrElse((false, null: String))
          // orderId as the deterministic tiebreak within equal timestamps,
          // mirroring the batch op's orderCols contract
          rows.toSeq.sortBy(e => (e.ts.getTime, e.orderId)).foreach { e =>
            val s = e.products.headOption.orNull
            if (have && s != null) out += ((last, s))
            last = s
            have = true
          }
          if (have) state.update((true, last))
          out.result().iterator
      }
  }

  /** The running-totals fold as a Spark 4 `StatefulProcessor`: state is a
    * typed `ValueState` declared in `init` with a DECLARATIVE TTL — the
    * engine expires idle entries itself (lazily, on read/maintenance;
    * wall-clock based), where the `mapGroupsWithState` generation
    * hand-rolls timeout handling. No timers registered, so no
    * timeout-driven micro-batches.
    */
  final class RunningTotalsProcessor(ttl: Duration)
      extends StatefulProcessor[String, OrderEvent, UserTotals] {
    @transient private var totals: ValueState[UserTotals] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals]("totals",
        Encoders.product[UserTotals], TTLConfig(ttl))
    override def handleInputRows(user: String, rows: Iterator[OrderEvent],
        timerValues: TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(user, 0L, 0L, 0.0)
      val next = Stateful.foldTotals(user, prev, rows)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** [[runningTotals]] on `transformWithState` — the Spark 4 stateful API
    * this engine targets going forward: typed state cells (value/list/map)
    * per key, declarative TTL instead of hand-rolled timeouts, timers when
    * event-driven expiry is needed. Requires the RocksDB state store
    * provider (the scale-correct choice anyway — see the RocksDB test).
    *
    * Caveat shared with every processing-time stateful operator: in
    * ProcessingTime mode `shouldRunAnotherBatch` is unconditionally true,
    * so the query runs micro-batches CONTINUOUSLY (that is how TTL
    * cleanup and timers get serviced between arrivals). Pace it with a
    * processing-time trigger in production, and never wait on
    * `processAllAvailable` in tests — the no-new-data signal it blocks on
    * is never raised while batches keep self-scheduling; poll the sink.
    */
  def runningTotalsTws(orders: Dataset[OrderEvent],
      ttl: Duration = Duration.ofMinutes(30)): Dataset[UserTotals] = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders.groupByKey(_.user)
      .transformWithState(new RunningTotalsProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** A session closed by [[SessionCloseProcessor]]: `[start, end)` with
    * `end = last event + gap` — exactly the interval Spark's own
    * `session_window(ts, gap)` assigns, so the batch session-window query
    * is the fixpoint oracle for the emitted stream.
    */
  final case class ClosedSession(user: String, start: Timestamp, end: Timestamp,
      cnt: Long)

  /** Internal accumulator for one open session of one key. */
  final case class OpenSession(user: String, startMs: Long, lastMs: Long, cnt: Long)

  /** Session-close emission via EVENT-TIME TIMERS — the
    * `transformWithState` timer surface (`registerTimer` /
    * `handleExpiredTimer`) that declarative TTL cannot express: TTL drops
    * idle state silently, while a session close must EMIT a record when
    * the watermark passes `last event + gap`. This is the event-driven
    * output shape of CDC session analytics (emit the finished session
    * exactly once, as soon as it is provably finished).
    *
    * Mechanics: the key holds a LIST of disjoint open sessions. Each
    * event is the interval `[t, t + gap)`; it merges every open session
    * it overlaps (possibly bridging two, possibly extending a session's
    * START backward — an in-order impossibility, but routine under
    * allowed lateness) or opens a new one. NOTHING is emitted while
    * handling rows: a session separated by an in-batch gap is not yet
    * provably closed, because a late-but-in-watermark event can still
    * land in (or bridge) it — emission happens exclusively in
    * `handleExpiredTimer`, once the watermark passes a session's
    * `last + gap` (after which Spark itself drops any row that could
    * still touch it — that is what makes the emission final). Timers are
    * re-armed per open session after each batch.
    *
    * Merge rule is strictly-less overlap (`[a, a+gap)` and `[b, b+gap)`
    * merge iff they intersect; touching intervals do NOT) —
    * byte-identical to `session_window`'s non-overlap semantics, which
    * the streaming test asserts against the batch query.
    */
  final class SessionCloseProcessor(gapMs: Long)
      extends StatefulProcessor[String, OrderEvent, ClosedSession] {
    @transient private var sess: org.apache.spark.sql.streaming.ListState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getListState[OpenSession]("sessions",
        Encoders.product[OpenSession], TTLConfig.NONE)

    private def closed(s: OpenSession): ClosedSession =
      ClosedSession(s.user, new Timestamp(s.startMs),
        new Timestamp(s.lastMs + gapMs), s.cnt)

    override def handleInputRows(user: String, rows: Iterator[OrderEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val open = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
      open ++= sess.get()
      rows.foreach { e =>
        val t = e.ts.getTime
        // sessions the event-interval [t, t+gap) strictly overlaps
        val (touched, rest) = open.partition(s =>
          t < s.lastMs + gapMs && s.startMs < t + gapMs)
        val merged =
          if (touched.isEmpty) OpenSession(user, t, t, 1L)
          else OpenSession(user,
            math.min(t, touched.map(_.startMs).min),
            math.max(t, touched.map(_.lastMs).max),
            touched.map(_.cnt).sum + 1L)
        open.clear()
        open ++= rest += merged
      }
      sess.put(open.toArray)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      open.foreach(s => getHandle.registerTimer(s.lastMs + gapMs))
      Iterator.empty
    }

    override def handleExpiredTimer(user: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val expiry = expiredTimerInfo.getExpiryTimeInMs()
      val all = sess.get().toSeq
      val (done, still) = all.partition(s => s.lastMs + gapMs <= expiry)
      if (still.isEmpty) sess.clear() else sess.put(still.toArray)
      done.sortBy(_.startMs).map(closed).iterator
    }
  }

  /** Stream of CLOSED sessions per user, emitted exactly once each when
    * the event-time watermark proves no further event can extend them.
    * Batch fixpoint: `groupBy(session_window(ts, gap), user).count` over
    * the same events (the o7 query shape).
    */
  def sessionClose(events: Dataset[OrderEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .as[OrderEvent]
      .groupByKey(_.user)
      .transformWithState(new SessionCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** One emitted grid cell of [[resampleTicks]]: at `gridMs` (cell start,
    * epoch ms), `user`'s forward-filled value was `v`.
    */
  final case class GridTick(user: String, gridMs: Long, v: Double)

  /** A buffered observation awaiting its cell's emission. */
  final case class Obs(ms: Long, v: Double)

  /** Cursor for one key's grid: the next cell to emit, the carried
    * last-observation pair, and whether anything was emitted yet (while
    * false, a late-but-in-watermark observation may still move the grid
    * start backward).
    */
  final case class GridCursor(nextCell: Long, carryMs: Long, carryV: Double,
      hasCarry: Boolean, emitted: Boolean)

  /** The STREAMING twin of [[graft.ops.Timeseries.resampleFfill]]: emit one
    * tick per `stepMs` grid cell per key, forward-filling from the latest
    * observation, each cell exactly once — when the watermark passes its
    * end, which is the moment the cell is provably complete (any later row
    * that could land in it would be dropped as beyond-watermark). Emission
    * happens ONLY in `handleExpiredTimer`; `handleInputRows` just buffers
    * observations and (re-)arms the next cell's timer.
    *
    * Same-cell ties resolve to the lexicographically greatest `(ms, v)`,
    * matching the batch operator exactly. Before anything is emitted, a
    * late-but-in-watermark observation may move the grid start BACKWARD
    * (the batch anchor is the key's true first bucket); once emission has
    * begun the watermark itself guarantees no row below the cursor can
    * arrive. Ticks continue for gap cells as long as the watermark
    * advances — unbounded forward fill; real deployments bound dead keys
    * with a TTL or an end-of-series marker.
    */
  final class ResampleProcessor(stepMs: Long)
      extends StatefulProcessor[String, OrderEvent, GridTick] {
    @transient private var cursor: ValueState[GridCursor] = _
    @transient private var pending: org.apache.spark.sql.streaming.ListState[Obs] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cursor = getHandle.getValueState[GridCursor]("cursor",
        Encoders.product[GridCursor], TTLConfig.NONE)
      pending = getHandle.getListState[Obs]("pending",
        Encoders.product[Obs], TTLConfig.NONE)
    }

    private def bucket(ms: Long): Long = ms - java.lang.Math.floorMod(ms, stepMs)

    override def handleInputRows(user: String, rows: Iterator[OrderEvent],
        timerValues: TimerValues): Iterator[GridTick] = {
      var c = if (cursor.exists()) cursor.get()
        else GridCursor(Long.MaxValue, 0L, 0.0, hasCarry = false, emitted = false)
      rows.foreach { e =>
        val ms = e.ts.getTime
        pending.appendValue(Obs(ms, e.amount))
        val b = bucket(ms)
        // grid start: min observed bucket, movable only pre-emission
        // (post-emission the watermark filter makes b < nextCell impossible)
        if (b < c.nextCell && !c.emitted) c = c.copy(nextCell = b)
      }
      cursor.update(c)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(c.nextCell + stepMs)
      Iterator.empty
    }

    override def handleExpiredTimer(user: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[GridTick] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      var c = cursor.get()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Obs]
      buf ++= pending.get()
      val out = scala.collection.mutable.ArrayBuffer.empty[GridTick]
      while (c.nextCell + stepMs <= wm) {
        val cellEnd = c.nextCell + stepMs
        val (ripe, rest) = buf.partition(_.ms < cellEnd)
        buf.clear(); buf ++= rest
        val carry0: Option[Obs] =
          if (c.hasCarry) Some(Obs(c.carryMs, c.carryV)) else None
        val best = ripe.foldLeft(carry0) {
          case (Some(b), o) =>
            if (o.ms > b.ms || (o.ms == b.ms && o.v > b.v)) Some(o) else Some(b)
          case (None, o) => Some(o)
        }
        best.foreach { b =>
          out += GridTick(user, c.nextCell, b.v)
          c = c.copy(carryMs = b.ms, carryV = b.v, hasCarry = true, emitted = true)
        }
        c = c.copy(nextCell = cellEnd)
      }
      if (buf.isEmpty) pending.clear() else pending.put(buf.toArray)
      cursor.update(c)
      getHandle.registerTimer(c.nextCell + stepMs)
      out.iterator
    }
  }

  /** Stream of forward-filled grid ticks per user (cell start in epoch ms,
    * one tick per cell, emitted exactly once when the watermark passes the
    * cell's end). Batch fixpoint: [[graft.ops.Timeseries.resampleFfill]]
    * over the same events, restricted to cells the watermark reached.
    */
  def resampleTicks(events: Dataset[OrderEvent], stepMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[GridTick] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .as[OrderEvent]
      .groupByKey(_.user)
      .transformWithState(new ResampleProcessor(stepMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** One changelog row of [[topProducts]]: after `seq` events for `user`,
    * `product` sits at `rank` (1-based) with `cnt` occurrences. `seq` is
    * the per-key changelog version — consumers (and the fixpoint test)
    * keep a user's rows with the highest `seq` as the current top-k.
    */
  final case class TopProduct(user: String, seq: Long, product: String,
      cnt: Long, rank: Int)

  /** Running per-key top-k products via MAP state — the `MapState` cell
    * type of the Spark 4 stateful API (the value/list cells are covered
    * by [[RunningTotalsProcessor]] / [[SessionCloseProcessor]]): one
    * (product → count) entry per key per product, point-updated per
    * arriving event — RocksDB reads/writes only the touched sub-keys,
    * where a ValueState holding the whole map would rewrite it wholesale
    * every batch (the reason MapState exists). After each batch the
    * processor re-emits the key's refreshed top-k slate (cnt desc,
    * product asc — deterministic ties), stamped with the key's event
    * count as changelog version.
    *
    * State is O(distinct products per key); the emitted slate is O(k).
    * No timers, no TTL → TimeMode.None, so the query only runs batches
    * when data arrives (`processAllAvailable` is safe in tests).
    */
  final class TopProductsProcessor(k: Int)
      extends StatefulProcessor[String, OrderEvent, TopProduct] {
    @transient private var counts: org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: String, rows: Iterator[OrderEvent],
        timerValues: TimerValues): Iterator[TopProduct] = {
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { e =>
        n += 1
        e.products.foreach { p =>
          val cur = if (counts.containsKey(p)) counts.getValue(p) else 0L
          counts.updateValue(p, cur + 1L)
        }
      }
      seen.update(n)
      counts.iterator().toSeq
        .sortBy { case (p, c) => (-c, p) }
        .take(k)
        .zipWithIndex
        .map { case ((p, c), i) => TopProduct(user, n, p, c, i + 1) }
        .iterator
    }
  }

  /** Per-user running top-`k` product slate as an update-mode changelog
    * (the streaming twin of `groupBy(user, product).count` + bounded
    * top-k). Requires the RocksDB state store provider.
    */
  def topProducts(events: Dataset[OrderEvent], k: Int): Dataset[TopProduct] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user)
      .transformWithState(new TopProductsProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Batch reference fold for [[runningTotals]] — same arithmetic, same
    * per-key sequential order; used by tests as the fixpoint oracle.
    */
  def runningTotalsBatch(spark: SparkSession, orders: Seq[OrderEvent]): Seq[UserTotals] =
    orders.groupBy(_.user).map { case (user, es) =>
      foldTotals(user, UserTotals(user, 0L, 0L, 0.0), es)
    }.toSeq

  /** A quote tick: the right (lookup) side of the streaming as-of join —
    * at `ts`, `sym` traded at `price`; `quoteId` breaks (sym, ts) ties
    * (greatest wins, matching [[graft.ops.Relational.asofJoin]]).
    */
  final case class Quote(sym: String, quoteId: String, price: Double, ts: Timestamp)

  /** A trade: the left side of the streaming as-of join — wants the
    * prevailing quote at-or-before its event time.
    */
  final case class Trade(tradeId: String, sym: String, qty: Double, ts: Timestamp)

  /** Internal union envelope for [[asofJoinExact]]. */
  final case class AsofTick(sym: String, isLeft: Boolean, tradeId: String,
      qty: Double, quoteId: String, price: Double, ts: Timestamp)

  /** Buffered right row: a quote awaiting (or serving) matches. */
  final case class AsofQuoteRec(tsMs: Long, tb: String, price: Double)

  /** Buffered left row: a trade whose event time the watermark has not
    * passed yet.
    */
  final case class AsofTradeRec(tsMs: Long, tradeId: String, qty: Double)

  /** Per-sym as-of state: quote history (pruned below the watermark) and
    * the pending-trade buffer.
    */
  final case class AsofBuf(quotes: Seq[AsofQuoteRec], trades: Seq[AsofTradeRec])

  /** One matched trade: the prevailing quote's price/id, or None when no
    * quote at-or-before the trade existed (the left-join null).
    */
  final case class AsofJoinedTrade(tradeId: String, sym: String, qty: Double,
      ts: Timestamp, price: Option[Double], quoteId: Option[String])

  /** Streaming AS-OF join — the out-of-order-correct twin of
    * [[graft.ops.Relational.asofJoin]] (catalog entry `o15_asof_join`).
    *
    * The batch operator's merge-scan needs the full history sorted; a
    * stream gets rows in arrival order, with lefts and rights arbitrarily
    * interleaved inside the watermark delay. [[streamTableJoinExact]]
    * (the J1 twin) matches each left against the latest right SEEN AT
    * PROCESSING TIME — exact only under per-key chronological arrival.
    * This operator is exact under any arrival order the watermark
    * admits: trades buffer in per-key state until the watermark passes
    * their event time — by then every quote at-or-before them has either
    * arrived or is late by definition — and only then match and emit
    * (append-mode-correct: each trade emits exactly once, never revised).
    *
    * Semantics match the batch operator: latest quote with
    * `quote.ts <= trade.ts` (inclusive), greatest `quoteId` among equal
    * (sym, ts) quotes, None when no quote precedes. Rows below the
    * watermark on arrival are dropped (standard late-data policy — the
    * one semantic this engine adds over the batch operator, which sees
    * no late data). Emission waits on watermark ADVANCEMENT, so a
    * quiet key flushes via an event-time timer (`EventTimeTimeout`),
    * not only on its next event.
    *
    * Scale shape: state per key is the pending-trade buffer (bounded by
    * the watermark delay × per-key trade rate) plus the quote history
    * ABOVE the watermark and one quote below it (older quotes can never
    * win an as-of match again and are pruned every invocation) — the
    * same O(delay-window) footprint a stream–stream interval join
    * carries, hash-partitioned by sym. Streaming-only (batch execution
    * has no watermark; use the batch operator there).
    */
  /** One as-of invocation as a pure state transition — the unit under the
    * prune-bound and knife-edge tests: `(watermark, state, admitted rows)
    * → (new state, emitted matches)`. Invariants it maintains (asserted
    * by StreamingSpec directly on the returned state):
    *
    *   - emitted trades all have `tsMs < wm` (STRICT — the late-row
    *     filter admits `ts >= wm`, so a quote tying a trade's event time
    *     can still legally arrive; the trade must wait until the
    *     watermark strictly passes it);
    *   - retained quote history holds AT MOST ONE quote strictly below
    *     the watermark (the reigning as-of candidate; older quotes are
    *     dominated forever) — the state bound that keeps per-key memory
    *     O(delay window), not O(stream length);
    *   - retained trades are exactly the not-yet-ripe ones.
    */
  def asofStep(sym: String, wm: Long, prev: AsofBuf,
      incoming: Seq[AsofTick]): (AsofBuf, Seq[AsofJoinedTrade]) = {
    // keep both sides sorted: quotes by (ts, tb) so "last at-or-before"
    // is a scan from the right, trades by (ts, id) for determinism
    val quotesAll = (prev.quotes ++ incoming.collect {
      case e if !e.isLeft => AsofQuoteRec(e.ts.getTime, e.quoteId, e.price)
    }).sortBy(q => (q.tsMs, q.tb))
    val tradesAll = (prev.trades ++ incoming.collect {
      case e if e.isLeft => AsofTradeRec(e.ts.getTime, e.tradeId, e.qty)
    }).sortBy(t => (t.tsMs, t.tradeId))
    val (ripe, pending) = tradesAll.partition(_.tsMs < wm)
    val out = ripe.map { t =>
      val m = quotesAll.takeWhile(_.tsMs <= t.tsMs).lastOption
      AsofJoinedTrade(t.tradeId, sym, t.qty, new Timestamp(t.tsMs),
        m.map(_.price), m.map(_.tb))
    }
    // prune: the latest quote strictly below the watermark still serves
    // future trades; everything older is dominated forever. Quotes AT
    // the watermark stay un-collapsed — a same-ts arrival with a greater
    // quoteId is still admissible and could win a tie.
    val (below, above) = quotesAll.partition(_.tsMs < wm)
    (AsofBuf(below.takeRight(1) ++ above, pending), out)
  }

  def asofJoinExact(trades: Dataset[Trade], quotes: Dataset[Quote],
      delay: Duration): Dataset[AsofJoinedTrade] = {
    val spark = trades.sparkSession
    import spark.implicits._
    val co = trades
      .map(t => AsofTick(t.sym, isLeft = true, t.tradeId, t.qty, null, 0.0, t.ts))
      .unionByName(
        quotes.map(q => AsofTick(q.sym, isLeft = false, null, 0.0, q.quoteId, q.price, q.ts)))
      .withWatermark("ts", s"${delay.toMillis} milliseconds")
    co.groupByKey(_.sym)
      .flatMapGroupsWithState[AsofBuf, AsofJoinedTrade](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (sym: String, events: Iterator[AsofTick], state: GroupState[AsofBuf]) =>
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(AsofBuf(Nil, Nil))
          // ingest, dropping sub-watermark stragglers (late-data policy).
          // Spark's flatMapGroupsWithState additionally pre-filters input
          // older than the PREVIOUS batch's watermark before the function
          // runs, so this filter only tightens the boundary to the current
          // one — the strict ripeness in asofStep makes exactness hold
          // from this filter alone, without leaning on the engine's
          // one-batch-lag internal boundary
          val (next, out) = asofStep(sym, wm, prev,
            events.filter(_.ts.getTime >= wm).toSeq)
          state.update(next)
          // a quiet key must still flush when the watermark passes its
          // pending trades — arm an event-time timer on the earliest one
          // (must exceed the current watermark; post-flush pending >= wm)
          if (next.trades.nonEmpty)
            state.setTimeoutTimestamp(math.max(next.trades.head.tsMs, wm + 1))
          out.iterator
      }
  }
}
