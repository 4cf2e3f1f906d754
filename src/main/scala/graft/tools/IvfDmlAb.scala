package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity
import graft.sources.Snapshots

/** Phase-timed A/B of s_knn_ivf_dml (r16 sidecar-feed investigation).
  * Run with the spark jars on the classpath:
  * java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.IvfDmlAb
  */
object IvfDmlAb {
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
    for (round <- 1 to 3) {
      println(s"== round $round")
      val root = graft.Roots.scratch + "/ivfdml_ab/" + dir.replaceAll("[^A-Za-z0-9]", "_")
      Snapshots.deleteRecursively(root)
      val (baseT, centsT, listsT) = (s"$root/vecs", s"$root/cents", s"$root/lists")
      val e = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
      t("commit base")(Snapshots.commitOverwrite(
        e.where(pmod(col("vec_id"), lit(10)) =!= 0), baseT))
      t("maintain 1 (train+assign)")(
        Similarity.ivfListsMaintain(spark, baseT, centsT, listsT))
      t("deleteWhere")(Snapshots.deleteWhere(spark, baseT,
        pmod(col("vec_id"), lit(7)) === 0))
      t("append")(Snapshots.commitAppend(
        e.where(pmod(col("vec_id"), lit(10)) === 0), baseT))
      t("maintain 2 (fold)")(
        Similarity.ivfListsMaintain(spark, baseT, centsT, listsT))
      t("serve count")(Similarity.serveIvfLists(spark, listsT).count())
    }
    spark.stop()
  }
}
