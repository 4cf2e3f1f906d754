package graft.functions

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Portable.{sql => P}

/** Statistics surface — Spark-first re-expression of the reference's
  * table statistics and per-column histograms that feed its System R
  * cost model (reference: table/stats/TableStats.java,
  * IntHistogram.java, FloatHistogram.java, StringHistogram.java,
  * Bucket.java).
  *
  * At 100 TB these are one narrow scan each: histogram bucketing is a
  * map-side `floor((x-lo)/width)` projection + hash aggregate (only
  * bucket ids shuffle), and distinct counts switch to HyperLogLog
  * (`approx_count_distinct`) when exactness isn't required — the
  * exact variants here exist for the DuckDB hash oracle.
  */
object StatsQueries {

  /** §2.1 row 15 — equi-width numeric histogram of l_quantity over its
    * domain [1, 50], 10 buckets (reference: FloatHistogram.java
    * buckets + Bucket.java counts).
    */
  val histogram: QueryDef = QueryDef(
    "q_histogram",
    (s, dir) => Tables.load(s, dir, "lineitem")
      .groupBy(floor((col("l_quantity") - 1) / 5.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), Portable.dsum(col("l_quantity")).as("sum_qty")),
    Some(s"""SELECT CAST(FLOOR((l_quantity - 1) / 5.0) AS BIGINT) AS bucket,
             COUNT(*) AS n, ${P.dsum("l_quantity")} AS sum_qty
             FROM lineitem GROUP BY 1"""))

  /** §2.1 row 16 — table stats: cardinality + per-column distinct
    * counts + derived reduction factor (reference: TableStats.java
    * getNumRecords / histogram distinct counts feeding
    * QueryOperator cost estimates).
    */
  val tableStats: QueryDef = QueryDef(
    "q_table_stats",
    (s, dir) => Tables.load(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("d_orderkey"),
      countDistinct(col("l_partkey")).as("d_partkey"),
      countDistinct(col("l_suppkey")).as("d_suppkey"),
      countDistinct(col("l_returnflag")).as("d_returnflag"))
      .withColumn("avg_lines_per_order",
        col("n_rows").cast("double") / col("d_orderkey")),
    Some("""SELECT COUNT(*) AS n_rows,
            COUNT(DISTINCT l_orderkey) AS d_orderkey,
            COUNT(DISTINCT l_partkey) AS d_partkey,
            COUNT(DISTINCT l_suppkey) AS d_suppkey,
            COUNT(DISTINCT l_returnflag) AS d_returnflag,
            CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT l_orderkey) AS avg_lines_per_order
            FROM lineitem"""))

  /** §2.1 row 17 — string histogram by leading character (reference:
    * StringHistogram.java buckets strings by first letter).
    */
  val stringHistogram: QueryDef = QueryDef(
    "q_string_histogram",
    (s, dir) => Tables.load(s, dir, "customer")
      .groupBy(substring(col("c_mktsegment"), 1, 1).as("first_letter"))
      .agg(count(lit(1)).as("n")),
    Some("SELECT SUBSTR(c_mktsegment, 1, 1) AS first_letter, COUNT(*) AS n FROM customer GROUP BY 1"))

  /** The 100 TB statistics path: HyperLogLog distinct counts and
    * t-digest-style approximate percentiles — one pass, tiny sketches
    * shuffled instead of exact state. Rows-only (sketch results are
    * engine-specific by design; exact twins are rows 15–16).
    */
  val approxStats: QueryDef = QueryDef(
    "q_approx_stats",
    (s, dir) => Tables.load(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col("l_orderkey")).as("ad_orderkey"),
      approx_count_distinct(col("l_partkey")).as("ad_partkey"),
      expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
        .as("price_p50_p95")),
    None)

  val defs: Seq[QueryDef] = Seq(histogram, tableStats, stringHistogram, approxStats)
}
