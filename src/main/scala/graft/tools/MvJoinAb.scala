package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable
import graft.sources.{MaterializedView, Snapshots}

/** Phase-timed A/B of q_mv_join_incremental (round 8: 7.6–8.5 s at
  * sf0.1, the slowest catalog entry) — attributes wall time to the
  * bootstrap commits, each refresh cycle, and the final serve, so the
  * bench number is explained by measurement rather than guessed at.
  * Run: java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.MvJoinAb
  */
object MvJoinAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"== round $round")
      val root = graft.Roots.scratch + "/mvjoin_ab/" + dir.replaceAll("[^A-Za-z0-9]", "_")
      Snapshots.deleteRecursively(root)
      val (oT, lT, vT) = (s"$root/orders", s"$root/lineitem", s"$root/view")
      val o = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val l = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"),
          col("l_linenumber"), col("l_quantity"))
      t("commit orders")(Snapshots.commitOverwrite(o.where(col("o_orderkey") % 10 =!= 0), oT))
      t("commit lineitem")(Snapshots.commitOverwrite(l.where(col("o_orderkey") % 7 =!= 0), lT))
      t("bootstrap refresh")(MaterializedView.joinRefresh(spark, oT, lT, vT, "o_orderkey"))
      t("deleteWhere left")(Snapshots.deleteWhere(spark, oT, col("o_orderkey") % 9 === 0))
      t("refresh dL")(MaterializedView.joinRefresh(spark, oT, lT, vT, "o_orderkey"))
      t("append both")({
        Snapshots.commitAppend(o.where(col("o_orderkey") % 10 === 0), oT)
        Snapshots.commitAppend(l.where(col("o_orderkey") % 7 === 0), lT)
      })
      t("refresh both+cross")(MaterializedView.joinRefresh(spark, oT, lT, vT, "o_orderkey"))
      t("deleteWhere right")(Snapshots.deleteWhere(spark, lT, col("l_quantity") < 10))
      t("refresh dR")(MaterializedView.joinRefresh(spark, oT, lT, vT, "o_orderkey"))
      t("serve+agg")(MaterializedView.serveJoin(spark, vT)
        .groupBy("o_orderkey", "o_custkey")
        .agg(count(lit(1)).as("n_items"),
          Portable.dsum(col("l_quantity")).as("sum_qty"),
          max(col("o_totalprice")).as("o_totalprice")).count())
    }
    spark.stop()
  }
}
