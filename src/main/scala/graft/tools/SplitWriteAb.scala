package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A/B of DML rewrite shapes (r16): plain filtered write (the
  * pre-sidecar delete) vs ONE partitionBy(hit) split write vs TWO
  * parallel filtered writes — decides how the CDC sidecar should be
  * staged. Run with the spark jars on the classpath:
  * java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.SplitWriteAb
  */
object SplitWriteAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.Roots.scratch + "/splitab"
    graft.sources.Snapshots.deleteRecursively(root)
    val src = s"$root/src"
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.mode(SaveMode.Overwrite).parquet(src)
    def t[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val hit = col("l_quantity") < 10
    for (round <- 1 to 3) {
      println(s"== round $round")
      t("plain filtered write (survivors)") {
        spark.read.parquet(src).where(!hit)
          .write.mode(SaveMode.Overwrite).parquet(s"$root/plain")
      }
      t("partitionBy(hit) split write") {
        spark.read.parquet(src).withColumn("__cdc_hit", hit)
          .write.mode(SaveMode.Overwrite).partitionBy("__cdc_hit")
          .parquet(s"$root/split")
      }
      t("two parallel filtered writes") {
        graft.Par.run(
          () => spark.read.parquet(src).where(!hit)
            .write.mode(SaveMode.Overwrite).parquet(s"$root/par_kept"),
          () => spark.read.parquet(src).where(hit)
            .write.mode(SaveMode.Overwrite).parquet(s"$root/par_del"))
      }
    }
    spark.stop()
  }
}
