package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Portable
import graft.functions.Portable.{sql => P}

/** Faithful TPC-H query shapes over the driver's TPC-H-ish tables —
  * the classic "would a reference user recognize this engine" check
  * (the reference's own multi-table test queries are star-join
  * fragments of these; reference: TestDatabaseQueries.java).
  *
  * Every money aggregate routes through DECIMAL(18,2) (Portable) so
  * the result hash-matches DuckDB exactly; product terms widen the
  * decimal (38,x) before the final cast to double, which both engines
  * compute exactly within range.
  *
  * Scale shapes: Q1 is a two-key hash aggregate with map-side
  * partials over a pushed-down date filter; Q6 is a pure
  * filter-aggregate (predicate fully pushed to parquet); Q3 is the
  * canonical broadcast-dim + fact-fact shuffle join with a top-k
  * (TakeOrderedAndProject) — no global sort.
  */
object TpcH {

  /** Q1 pricing summary report (all eight aggregates). */
  val q1: QueryDef = QueryDef(
    "q_tpch_q1",
    (s, dir) => Tables.load(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Portable.dsum(col("l_quantity")).as("sum_qty"),
        Portable.dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(Portable.revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(Portable.revenueTerm(col("l_extendedprice"), col("l_discount")) *
            (lit(1).cast(Portable.Money) + Portable.dec(col("l_tax"))))
          .cast("double").as("sum_charge"),
        Portable.davg(col("l_quantity")).as("avg_qty"),
        Portable.davg(col("l_extendedprice")).as("avg_price"),
        Portable.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")),
    Some(s"""SELECT l_returnflag, l_linestatus,
         ${P.dsum("l_quantity")} AS sum_qty,
         ${P.dsum("l_extendedprice")} AS sum_base_price,
         ${P.revenueSum("l_extendedprice", "l_discount")} AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
              * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         ${P.davg("l_quantity")} AS avg_qty,
         ${P.davg("l_extendedprice")} AS avg_price,
         ${P.davg("l_discount")} AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus"""))

  /** Q3 shipping-priority variant (orders carries o_orderpriority in
    * this schema): top-10 open orders by pending revenue.
    */
  val q3: QueryDef = QueryDef(
    "q_tpch_q3",
    (s, dir) => {
      val c = broadcast(Tables.load(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey"))
      val o = Tables.load(s, dir, "orders")
        .where(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(Portable.revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         ${P.revenueSum("l_extendedprice", "l_discount")} AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND o_orderkey = l_orderkey
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** Q6 forecasting revenue change: pure filter-aggregate, every
    * predicate pushed to the parquet scan.
    */
  val q6: QueryDef = QueryDef(
    "q_tpch_q6",
    (s, dir) => Tables.load(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(Portable.dec(col("l_extendedprice")) * Portable.dec(col("l_discount")))
        .cast("double").as("revenue")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** Q13 customer distribution: outer join with an ON-clause filter
    * (customers with zero qualifying orders must survive with count
    * 0), then a second aggregation over the counts — the classic
    * two-level aggregate.
    */
  val q13: QueryDef = QueryDef(
    "q_tpch_q13",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .where(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""SELECT c_count, COUNT(*) AS custdist FROM (
              SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) t
            GROUP BY c_count"""))

  /** Q16 parts/supplier relationship (adapted: lineitem stands in for
    * partsupp as the part↔supplier relation): distinct-supplier
    * counts per part group, excluding a brand, a type prefix, and a
    * supplier blocklist via anti-join — count-distinct grouping over
    * a filtered join with NOT-IN semantics.
    */
  val q16: QueryDef = QueryDef(
    "q_tpch_q16",
    (s, dir) => {
      val p = Tables.load(s, dir, "part")
        .where(col("p_brand") =!= "Brand#13" && !col("p_type").startsWith("MEDIUM") &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      val blocked = Tables.load(s, dir, "supplier")
        .where(col("s_name").endsWith("1")).select(col("s_suppkey"))
      val ls = Tables.load(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        .join(blocked, col("l_suppkey") === col("s_suppkey"), "left_anti")
      ls.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },
    Some("""SELECT p_brand, p_type, p_size,
            COUNT(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
              AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_name LIKE '%1')
            GROUP BY p_brand, p_type, p_size"""))

  /** Q20 (adapted): suppliers who shipped more than a threshold
    * quantity of PROMO-type parts — an aggregate-with-HAVING subquery
    * feeding a semi-join back to the supplier dimension.
    */
  val q20: QueryDef = QueryDef(
    "q_tpch_q20",
    (s, dir) => {
      val promo = Tables.load(s, dir, "part")
        .where(col("p_type") === "PROMO").select("p_partkey")
      val heavy = Tables.load(s, dir, "lineitem")
        .join(promo, col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(Portable.dsum(col("l_quantity")).as("qty"))
        .where(col("qty") > 100.0)
        .select("l_suppkey")
      Tables.load(s, dir, "supplier")
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
              SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_type = 'PROMO'
              GROUP BY l_suppkey
              HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 100)"""))

  /** Q12 (adapted: order priority stands in for ship mode): per
    * returnflag, how many high- vs low-priority orders shipped in a
    * date window — the CASE-conditional aggregation shape.
    */
  val q12: QueryDef = QueryDef(
    "q_tpch_q12",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val o = Tables.load(s, dir, "orders")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
    },
    Some("""SELECT l_returnflag,
            CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
            CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_returnflag"""))

  /** Q14 promotion effect: promo revenue as a percentage of total
    * revenue in a month window — a ratio of conditional exact-decimal
    * sums (one divide on identical operands, portable).
    */
  val q14: QueryDef = QueryDef(
    "q_tpch_q14",
    (s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
      val p = broadcast(Tables.load(s, dir, "part").select("p_partkey", "p_type"))
      val rev = Portable.revenueTerm(col("l_extendedprice"), col("l_discount"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(Portable.Money)))
            .cast("double") /
          sum(rev).cast("double")).as("promo_revenue_pct"))
    },
    Some("""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1995-04-01'"""))

  val defs: Seq[QueryDef] = Seq(q1, q3, q6, q12, q13, q14, q16, q20)
}
