package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Snapshots

/** Sub-phase timer for the tombstone-maintained BM25 SERVE tail
  * (r15 optimization round): Bm25DmlAb showed serve as the dominant
  * warm phase of t_search_bm25_dml; this breaks the serve chain into
  * its subtrees over the scratch tables the last bench/A-B run left
  * behind, so the next cut is measured, not guessed.
  * Run: sbt "runMain graft.tools.Bm25ServeAb [sfdir]"
  */
object Bm25ServeAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.Roots.scratch + "/invidx/" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + "/bm25dml"
    val (postT, dlT, totT) =
      (s"$root/postings", s"$root/doclen", s"$root/totals")
    require(Snapshots.currentVersion(postT) > 0,
      s"run the bm25dml query once first to populate $root")
    def t(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      println(f"  $label%-26s ${math.min(t1 - t0, System.nanoTime() - t1) / 1e9}%6.2f s")
    }
    t("read postings (buckets)")(Snapshots.read(spark, postT)
      .where(col("b").isin(TextFunctions.searchBuckets: _*)).count())
    t("postings net agg")(TextFunctions.servePostingsNet(
      Snapshots.read(spark, postT)
        .where(col("b").isin(TextFunctions.searchBuckets: _*))).count())
    t("doclen net")(Snapshots.read(spark, dlT).groupBy("doc_id")
      .agg(sum(col("dl")).cast("long").as("dl")).where(col("dl") > 0).count())
    t("totals fold")(Snapshots.read(spark, totT)
      .agg(sum(col("np")).cast("long"), sum(col("totalp")).cast("long")).head())
    t("full serve")(TextFunctions.bm25ServeNet(spark, postT, dlT, totT).count())
    spark.stop()
  }
}
