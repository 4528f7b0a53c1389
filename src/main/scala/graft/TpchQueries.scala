package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q

/** TPC-H-style queries beyond the headline set in [[Queries]] — the twelve
  * remaining query shapes (Q2, Q8, Q9, Q11, Q12, Q13, Q15, Q16, Q17, Q19,
  * Q20, Q22), adapted to this fixture's schema (no `partsupp`, no
  * commit/receipt dates, no ship modes, no phone numbers — see TESTDATA.md).
  * Where TPC-H uses `partsupp`, the distinct `(l_partkey, l_suppkey)` pairs
  * observed in `lineitem` stand in as the part–supplier catalog, and
  * `p_retailprice` stands in for `ps_supplycost` as a unit-cost proxy.
  *
  * Each query keeps its original's *planner-significant* feature:
  *  - Q2: correlated scalar MIN subquery → decorrelated to an agg + join;
  *  - Q8: conditional market-share ratio over a 7-table join;
  *  - Q9: multi-fact profit arithmetic kept in exact integer cents;
  *  - Q11: scalar-aggregate threshold subquery (value > fraction of total);
  *  - Q12: date-arithmetic lateness buckets with conditional counts;
  *  - Q13: LEFT outer join preserved through a two-level aggregate;
  *  - Q15: scalar MAX equality join on an aggregated view (exact ints);
  *  - Q16: NOT-IN → anti join under a count-distinct aggregate;
  *  - Q17: correlated scalar AVG subquery (per-part threshold);
  *  - Q19: disjunction of conjunctive join residuals (OR of brand/size/qty);
  *  - Q20: IN-subquery over a HAVING aggregate, two levels deep;
  *  - Q22: scalar-average threshold + NOT EXISTS anti join.
  *
  * Money sums follow the catalog's exactness rules (Queries scaladoc):
  * integer cents / cent-products summed as BIGINT, doubles only at the
  * final division. All date literals are NTZ to match the parquet columns.
  */
object TpchQueries {

  /** `round(price*100) :* (100 - round(disc*100))` — the catalog's exact
    * cent-product revenue term (units of 10^-4 dollars).
    */
  private def revCp = round(col("l_extendedprice") * 100).cast("long") *
    (lit(100L) - round(col("l_discount") * 100).cast("long"))

  private val revCpSql =
    "CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))"

  val all: Seq[Q] = Seq(

    Q("q2_min_cost_supplier",
      (s, dir) => {
        // The oracle states this as a correlated scalar MIN subquery over a
        // CTE. Spark would INLINE that CTE into the subquery, aggregating
        // lineitem twice (two full scans + shuffles — wrong at 100 TB), so
        // the engine side is the hand-decorrelated form: build the
        // qualifying (part, supplier, cost) set ONCE, repartition it by
        // part so the per-part MIN and the min-equality join back onto it
        // ride one reused exchange (ReuseExchange fires on the identical
        // subplan; asserted in TpchPlanSpec).
        // the selective part filter joins BELOW the aggregate (broadcast),
        // so the min-cost agg runs over ~1% of lineitem, not all of it —
        // the pushdown Catalyst can't do for us because the aggregate key
        // set changes (p_brand rides along; it's functionally dependent)
        val partF = Tables.part(s, dir)
          .filter(col("p_size") <= 5 && col("p_type") === "STANDARD")
          .select(col("p_partkey"), col("p_brand"))
        val cost = Tables.lineitem(s, dir)
          .join(broadcast(partF), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_partkey"), col("p_brand"), col("l_suppkey"))
          .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("cost_cents"))
        val euQualified = cost
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"), col("cost_cents"))
          .repartition(col("p_partkey"))
        val minPerPart = euQualified.groupBy(col("p_partkey").as("mk"))
          .agg(min(col("cost_cents")).as("min_cost"))
        euQualified.join(minPerPart,
            col("p_partkey") === col("mk") && col("cost_cents") === col("min_cost"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"), col("cost_cents"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH ps AS (
             |  SELECT l_partkey, l_suppkey,
             |         min(CAST(round(l_extendedprice*100) AS BIGINT)) AS cost_cents
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT s_acctbal, s_name, n_name, p.p_partkey, p_brand, ps.cost_cents
             |FROM part p
             |JOIN ps ON p.p_partkey = ps.l_partkey
             |JOIN supplier ON s_suppkey = ps.l_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE p_size <= 5 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
             |  AND ps.cost_cents = (
             |    SELECT min(ps2.cost_cents)
             |    FROM ps ps2
             |    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
             |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
             |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
             |    WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin),
      "TPC-H Q2-style min-cost supplier: correlated scalar MIN subquery " +
        "decorrelated to agg+join; lineitem pairs stand in for partsupp"),

    Q("q8_market_share",
      (s, dir) => {
        val cn = Tables.nation(s, dir)
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
        val sn = Tables.nation(s, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        Tables.lineitem(s, dir)
          .join(Tables.part(s, dir).filter(col("p_type") === "PROMO").select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, dir)
              .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
                col("o_orderdate") <= lit("1996-12-31").cast("timestamp_ntz")),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
            col("c_rk") === col("r_regionkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
          .withColumn("o_year", year(col("o_orderdate")))
          .withColumn("vol_cp", revCp)
          .groupBy(col("o_year"))
          .agg((sum(when(col("supp_nation") === "NATION_2", col("vol_cp")).otherwise(0L))
            .cast("double") / sum(col("vol_cp")).cast("double")).as("mkt_share"))
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
              |  CAST(sum(CASE WHEN sn.n_name = 'NATION_2' THEN $revCpSql ELSE 0 END) AS DOUBLE)
              |    / CAST(sum($revCpSql) AS DOUBLE) AS mkt_share
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation cn ON c_nationkey = cn.n_nationkey
              |JOIN region ON cn.n_regionkey = r_regionkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation sn ON s_nationkey = sn.n_nationkey
              |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
              |  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
              |GROUP BY 1""".stripMargin),
      "TPC-H Q8-style national market share: 7-table join, both nation dims " +
        "broadcast, conditional/total revenue ratio in exact cents until the final division"),

    Q("q9_product_profit",
      (s, dir) => Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_name").contains("red"))
            .select(col("p_partkey"), col("p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .withColumn("o_year", year(col("o_orderdate")))
        // profit in 10^-4 dollars: revenue cent-product minus retail-cost
        // (p_retailprice as unit-cost proxy) scaled to the same grid
        .withColumn("profit_cp", revCp -
          round(col("p_retailprice") * 100).cast("long") * lit(100L) *
            round(col("l_quantity")).cast("long"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(col("profit_cp")).as("profit_cp")),
      Some(s"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
              |  CAST(sum($revCpSql
              |        - CAST(round(p_retailprice*100) AS BIGINT) * 100
              |          * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS profit_cp
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |WHERE p_name LIKE '%red%'
              |GROUP BY 1, 2""".stripMargin),
      "TPC-H Q9-style product-type profit by supplier nation and year; " +
        "all arithmetic on the exact 10^-4-dollar integer grid (retailprice = cost proxy)"),

    Q("q11_important_parts",
      (s, dir) => {
        // scalar-aggregate threshold subquery: the total is computed once
        // and broadcast into the HAVING-style filter (no second scan of the
        // grouped result, no driver round-trip)
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        s.sql("""WITH v AS (
                |  SELECT l_partkey,
                |         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_cents
                |  FROM lineitem_v
                |  JOIN supplier_v ON l_suppkey = s_suppkey
                |  JOIN nation_v ON s_nationkey = n_nationkey
                |  WHERE n_name IN ('NATION_2', 'NATION_7')
                |  GROUP BY 1)
                |SELECT l_partkey, value_cents FROM v
                |WHERE CAST(value_cents AS DOUBLE) >
                |      (SELECT CAST(sum(value_cents) AS DOUBLE) * 0.001 FROM v)""".stripMargin)
      },
      Some("""WITH v AS (
             |  SELECT l_partkey,
             |         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_cents
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE n_name IN ('NATION_2', 'NATION_7')
             |  GROUP BY 1)
             |SELECT l_partkey, value_cents FROM v
             |WHERE CAST(value_cents AS DOUBLE) >
             |      (SELECT CAST(sum(value_cents) AS DOUBLE) * 0.001 FROM v)""".stripMargin),
      "TPC-H Q11-style important stock: per-part value vs a scalar fraction-of-total " +
        "subquery; integer-cent values, one double multiply at the threshold"),

    Q("q12_priority_lateness",
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .join(Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count")),
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
             |GROUP BY l_linestatus""".stripMargin),
      "TPC-H Q12-style lateness buckets (linestatus stands in for shipmode, " +
        "shipped >60d after order = late): conditional counts, date arithmetic pushed to the join filter"),

    Q("q13_order_distribution",
      (s, dir) => Tables.customer(s, dir).select(col("c_custkey"))
        // LEFT join so zero-order customers survive into the histogram —
        // the outer side must not be lost through both aggregates
        .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") =!= "5-LOW")
            .select(col("o_orderkey"), col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist")),
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             |  GROUP BY c_custkey)
             |GROUP BY c_count""".stripMargin),
      "TPC-H Q13-style customer order-count distribution: outer join preserved " +
        "through a two-level aggregate (count ignores the null-extended rows)"),

    Q("q15_top_supplier",
      (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          // the explicit isnotnull matches the constraint the supplier join
          // infers on the other branch — identical canonical subplans are
          // what lets ReuseExchange compute the aggregate once
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz") &&
            col("l_suppkey").isNotNull)
          .withColumn("rev_cp", revCp)
          .groupBy(col("l_suppkey"))
          .agg(sum(col("rev_cp")).as("total_rev_cp"))
        // scalar MAX joined back on exact integer equality — the broadcast
        // scalar-aggregate idiom (no second full aggregation, no window)
        val mx = rev.agg(max(col("total_rev_cp")).as("mx"))
        rev.join(broadcast(mx), col("total_rev_cp") === col("mx"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev_cp"))
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey, CAST(sum($revCpSql) AS BIGINT) AS total_rev_cp
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
              |  GROUP BY 1)
              |SELECT s_suppkey, s_name, total_rev_cp
              |FROM rev JOIN supplier ON l_suppkey = s_suppkey
              |WHERE total_rev_cp = (SELECT max(total_rev_cp) FROM rev)""".stripMargin),
      "TPC-H Q15-style top supplier: revenue view + scalar MAX equality join; " +
        "exact integer cents make the argmax tie-exact (no FP epsilon)"),

    Q("q16_supplier_variety",
      (s, dir) => {
        // the selective part filter joins BELOW the distinct (broadcast), so
        // the pair-dedup shuffle carries ~13% of lineitem instead of all of it
        val partF = Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "MEDIUM" &&
            col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
        val ps = Tables.lineitem(s, dir)
          .join(broadcast(partF), col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"),
            col("l_suppkey"))
          .distinct()
        val badSupp = Tables.supplier(s, dir)
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        ps.join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
             |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3""".stripMargin),
      "TPC-H Q16-style supplier variety: NOT IN realized as a left-anti join " +
        "under a count-distinct aggregate; distinct lineitem pairs stand in for partsupp"),

    Q("q17_small_qty_revenue",
      (s, dir) => {
        // correlated scalar AVG subquery — per-part threshold decorrelated
        // into an aggregate join (the TPC-H "brand viability" probe)
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        s.sql("""SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 700.0
                |         AS avg_yearly
                |FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
                |WHERE p_brand = 'Brand#23'
                |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity)
                |                    FROM lineitem_v l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
      },
      Some("""SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE) / 700.0
             |         AS avg_yearly
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#23'
             |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * avg(l_quantity)
             |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin),
      "TPC-H Q17-style small-quantity revenue: correlated per-part AVG subquery " +
        "decorrelated to agg+join; integral quantities keep the 0.2×avg threshold bit-identical"),

    Q("q19_disjunctive_revenue",
      (s, dir) => Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg((sum(revCp).cast("double") / 10000.0).as("revenue")),
      Some(s"""SELECT CAST(sum($revCpSql) AS DOUBLE) / 10000.0 AS revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      "TPC-H Q19-style disjunctive revenue: OR of conjunctive residuals over one " +
        "equi-join — the join key is still extracted, the disjunction stays a residual filter"),

    Q("q20_excess_suppliers",
      (s, dir) => {
        // IN-subquery over a grouped HAVING aggregate, the inner side itself
        // a join — planned as semi join against the aggregate (no partsupp:
        // 'supplied >100 units of one small part in 1996' is the stand-in)
        Tables.supplier(s, dir).createOrReplaceTempView("supplier_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        Tables.part(s, dir).createOrReplaceTempView("part_v")
        s.sql("""SELECT s_name, n_name, s_acctbal
                |FROM supplier_v JOIN nation_v ON s_nationkey = n_nationkey
                |WHERE s_suppkey IN (
                |  SELECT l_suppkey
                |  FROM lineitem_v JOIN part_v ON p_partkey = l_partkey
                |  WHERE p_name LIKE 'small%'
                |    AND l_shipdate >= TIMESTAMP_NTZ '1996-01-01'
                |    AND l_shipdate < TIMESTAMP_NTZ '1997-01-01'
                |  GROUP BY l_suppkey, l_partkey
                |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 60)""".stripMargin)
      },
      Some("""SELECT s_name, n_name, s_acctbal
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE p_name LIKE 'small%'
             |    AND l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-01-01'
             |  GROUP BY l_suppkey, l_partkey
             |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 60)""".stripMargin),
      "TPC-H Q20-style excess suppliers: IN over a grouped HAVING aggregate " +
        "whose inner side is itself a join — semi join against the agg, exact integer quantities"),

    Q("q22_idle_customers",
      (s, dir) => {
        // scalar-average threshold + NOT EXISTS anti join (mktsegment stands
        // in for the phone country code; 'idle' = no orders since 1999).
        // The average is compared on the integer-cent grid: a double AVG of
        // raw balances would be partial-aggregation-order-dependent.
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT c_mktsegment, count(*) AS numcust,
                |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0
                |         AS totacctbal
                |FROM customer_v
                |WHERE CAST(round(c_acctbal*100) AS BIGINT) >
                |      (SELECT avg(CAST(round(c_acctbal*100) AS BIGINT))
                |       FROM customer_v WHERE c_acctbal > 0.0)
                |  AND NOT EXISTS (SELECT 1 FROM orders_v
                |                  WHERE o_custkey = c_custkey
                |                    AND o_orderdate >= TIMESTAMP_NTZ '1999-01-01')
                |GROUP BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment, count(*) AS numcust,
             |       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0
             |         AS totacctbal
             |FROM customer
             |WHERE CAST(round(c_acctbal*100) AS BIGINT) >
             |      (SELECT avg(CAST(round(c_acctbal*100) AS BIGINT))
             |       FROM customer WHERE c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
             |GROUP BY c_mktsegment""".stripMargin),
      "TPC-H Q22-style idle high-balance customers: scalar AVG threshold on the " +
        "exact cent grid + correlated NOT EXISTS → anti join")
  )
}
