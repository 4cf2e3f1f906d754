package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: isolate ngram-jaccard cost components. */
object DebugNgram2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.load(spark, dir, "documents")
    val toks = split(lower(col("text")), " ")
    val gramsUnsorted = array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - 2, lit(0))),
      i => crc32(concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def pairs(gramExpr: org.apache.spark.sql.Column) = {
      val g = d.select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 40).as("len_band"), gramExpr.as("grams"))
      g.toDF("a", "lang", "len_band", "g_a")
        .join(g.toDF("b", "lang", "len_band", "g_b"), Seq("lang", "len_band"))
        .where(col("a") < col("b"))
    }
    time("gram build only")(d.select(gramsUnsorted.as("g")).count())
    time("pair count")(pairs(gramsUnsorted).count())
    time("array_intersect")(pairs(gramsUnsorted)
      .select((size(array_intersect(col("g_a"), col("g_b")))).as("i")).where(col("i") >= 0).count())
    time("native on sorted")(pairs(array_sort(gramsUnsorted))
      .select(graft.functions.Native.sortedIntersectSize(col("g_a"), col("g_b")).as("i"))
      .where(col("i") >= 0).count())
    time("sort only")(pairs(array_sort(gramsUnsorted)).count())
    val g = d.select(col("doc_id"), col("lang"),
      floor(col("n_chars") / 40).as("len_band"), gramsUnsorted.as("grams"))
    val inv = g.select(col("doc_id"), col("lang"), col("len_band"),
      explode(col("grams")).as("gram"))
    time("inv explode")(inv.count())
    val co = inv.toDF("a", "lang", "len_band", "gram")
      .join(inv.toDF("b", "lang", "len_band", "gram"), Seq("lang", "len_band", "gram"))
      .where(col("a") < col("b"))
    time("co join")(co.count())
    time("co grouped")(co.groupBy("a", "b").agg(count(lit(1)).as("inter")).count())
    val invCached = inv.cache()
    invCached.count()
    val co2 = invCached.toDF("a", "lang", "len_band", "gram")
      .join(invCached.toDF("b", "lang", "len_band", "gram"), Seq("lang", "len_band", "gram"))
      .where(col("a") < col("b"))
    time("co grouped (inv cached)")(co2.groupBy("a", "b").agg(count(lit(1)).as("inter")).count())
    spark.stop()
  }
}
