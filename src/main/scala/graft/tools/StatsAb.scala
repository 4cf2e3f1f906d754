package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Per-branch phase timer for q_approx_stats (r15 optimization round):
  * attributes the query's wall to its independent aggregate branches so
  * the merge decision (which branches share a scan) is measured, not
  * guessed. Run: sbt "runMain graft.tools.StatsAb [sfdir]"
  */
object StatsAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      println(f"  $label%-24s ${math.min(t1 - t0, System.nanoTime() - t1) / 1e9}%6.2f s")
    }
    val li = Tables.load(spark, dir, "lineitem")
    t("count")(li.agg(count(lit(1))).head())
    t("distinct l_orderkey")(li.select("l_orderkey").distinct()
      .agg(count(lit(1))).head())
    t("distinct l_partkey")(li.select("l_partkey").distinct()
      .agg(count(lit(1))).head())
    t("hll both")(li.agg(approx_count_distinct(col("l_orderkey"), 0.05),
      approx_count_distinct(col("l_partkey"), 0.05)).head())
    t("approx_percentile")(li.agg(
      expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")).head())
    t("exact percentile")(li.agg(
      expr("percentile(l_extendedprice, array(0.45, 0.55, 0.94, 0.96))")).head())
    t("merged non-distinct")(li.agg(
      count(lit(1)), approx_count_distinct(col("l_orderkey"), 0.05),
      approx_count_distinct(col("l_partkey"), 0.05),
      expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)"),
      expr("percentile(l_extendedprice, array(0.45, 0.55, 0.94, 0.96))")).head())
    spark.stop()
  }
}
