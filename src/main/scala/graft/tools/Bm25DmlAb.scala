package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.sources.Snapshots

/** Phase-timed A/B of t_search_bm25_dml (round-10 verdict item 3: the
  * query drifted 3.91 s → 5.11–6.28 s between the round-9 and
  * round-10 benches with no committed explanation) — attributes wall
  * time to the bootstrap commit, each maintenance fold, the DML
  * mutations, and the final serve, the MvJoinAb method. Run twice
  * (cold JVM/codegen, then warm) so the fixed-cost floor separates
  * from the per-phase compute.
  * Run: java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.Bm25DmlAb [sfdir]
  */
object Bm25DmlAb {
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
      val root = graft.Roots.scratch + "/invidx/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "/bm25dml_ab"
      Snapshots.deleteRecursively(root)
      val (baseT, postT, dlT, totT) =
        (s"$root/docs", s"$root/postings", s"$root/doclen", s"$root/totals")
      val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
      t("commit bootstrap 90%")(Snapshots.commitOverwrite(
        d.where(pmod(col("doc_id"), lit(10)) =!= 0), baseT))
      t("maintain #1 (bootstrap)")(
        TextFunctions.bm25Maintain(spark, baseT, postT, dlT, totT))
      t("deleteWhere %7")(Snapshots.deleteWhere(
        spark, baseT, pmod(col("doc_id"), lit(7)) === 0))
      t("append held-out 10%")(Snapshots.commitAppend(
        d.where(pmod(col("doc_id"), lit(10)) === 0), baseT))
      t("maintain #2 (deltas)")(
        TextFunctions.bm25Maintain(spark, baseT, postT, dlT, totT))
      t("serve top-10")(
        TextFunctions.bm25ServeNet(spark, postT, dlT, totT).count())
    }
    spark.stop()
  }
}
