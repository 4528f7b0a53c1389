package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Per-user running totals: the accumulator for [[Stateful.runningTotals]]. */
final case class UserTotals(user: String, orders: Long, products: Long, amount: Double)

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
  * arriving, pass an idle-timeout variant (GroupStateTimeout) — unbounded
  * key spaces need ttl'd state, same discipline as compacted-topic
  * retention.
  */
object Stateful {

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
          val next = events.foldLeft(prev) { (acc, e) =>
            UserTotals(user, acc.orders + 1, acc.products + e.products.size,
              acc.amount + e.amount)
          }
          state.update(next)
          next
      }
  }

  /** Batch reference fold for [[runningTotals]] — same arithmetic, same
    * per-key sequential order; used by tests as the fixpoint oracle.
    */
  def runningTotalsBatch(spark: SparkSession, orders: Seq[OrderEvent]): Seq[UserTotals] =
    orders.groupBy(_.user).map { case (user, es) =>
      es.foldLeft(UserTotals(user, 0L, 0L, 0.0)) { (acc, e) =>
        UserTotals(user, acc.orders + 1, acc.products + e.products.size,
          acc.amount + e.amount)
      }
    }.toSeq
}
