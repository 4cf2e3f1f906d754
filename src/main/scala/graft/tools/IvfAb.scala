package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Phase-timed A/B of s_knn_ivf serving (round-8 watch item: 0.70 →
  * 1.30 s at sf0.1 vs round 7) — attributes serve time to the content
  * key (corpus count + file fingerprint), index resolution, and the
  * probe/score query itself, across repeated in-session runs, so the
  * regression is explained by measurement rather than guessed at.
  * Run: java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.IvfAb
  */
object IvfAb {
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
    for (round <- 1 to 4) {
      println(s"== run $round")
      t("count (content key)")(
        graft.Tables.load(spark, dir, "embeddings").count())
      t("fileFingerprint")(
        graft.sources.Snapshots.fileFingerprint(s"$dir/embeddings.parquet"))
      t("full s_knn_ivf")(Similarity.knnIvf.fn(spark, dir).collect().length)
    }
    spark.stop()
  }
}
