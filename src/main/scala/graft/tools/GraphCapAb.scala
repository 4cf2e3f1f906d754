package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B decision artifact for the kNN-graph SKEW remediation named in
  * tools/forget_budget_r15.md: with corpus-adaptive band width landed
  * (the uniform-occupancy term), the residual build cost at the third
  * corpus decade is HOT BUCKETS — label-clustered embeddings whose
  * near-identical vectors share every plane sign at any width. The
  * candidate (FAISS-style) fix is CAP-AND-RERANK: inside a bucket
  * past a per-bucket budget, pair members only against a
  * deterministic HUB SAMPLE of the bucket (cost occupancy × cap, not
  * occupancy²), then exact-rerank as usual. This probe measures, on
  * the synthesized x10 corpus (50k docs), what that buys and what it
  * costs: build wall-clock uncapped vs capped at several budgets, and
  * edge agreement with the uncapped graph (the quality bound a
  * next-round integration would be judged against).
  *
  * Usage: runMain graft.tools.GraphCapAb [baseSfDir] [factor]
  * Prints GRAPHCAPAB lines; redirect into tools/graph_cap_ab_r15.txt.
  */
object GraphCapAb {
  private def timed[T](f: => T): (T, Long) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1000000L)
  }

  /** Capped candidate pairs: buckets at or under `cap` pair all
    * members (identical to the uncapped build); larger buckets pair
    * every member against the bucket's `cap` lowest-hash members (a
    * deterministic, id-hash-ordered hub sample — unbiased by id
    * assignment order, stable across runs).
    */
  private def cappedCandidatePairs(bv: DataFrame, cap: Int): DataFrame = {
    val w = Window.partitionBy("band", "bucket")
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    val ranked = bv.withColumn("rk", row_number().over(w))
    val hubs = ranked.where(col("rk") <= cap)
      .select(col("vec_id").as("b"), col("band"), col("bucket"))
    ranked.select(col("vec_id").as("a"), col("band"), col("bucket"))
      .join(hubs, Seq("band", "bucket"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-graph-cap-ab")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    // the same scaled corpus ForgetBudget measures (embeddings only)
    val stride = 100000000L
    val src = spark.read.parquet(s"$base/embeddings.parquet")
    val emb = (0 until factor).map(i => src
        .withColumn("vec_id", col("vec_id") + lit(i * stride))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"transform(embedding, (x, j) -> cast(x + 0.013 * $i * ((j * 7) % 13 - 6) as float))")))
      .reduce(_ unionByName _).localCheckpoint()
    val n = emb.count()
    val bits = Similarity.graphBitsFor(n)
    println(s"GRAPHCAPAB corpus n=$n bits=$bits")

    val v = Similarity.quantizedOf(emb).localCheckpoint()
    val bv = v.withColumn("buckets", Similarity.lshBandBuckets(col("q"), bits))
      .select(col("vec_id"), posexplode(col("buckets")))
      .toDF("vec_id", "band", "bucket").localCheckpoint()
    val occ = bv.groupBy("band", "bucket").agg(count(lit(1)).as("o"))
      .agg(max(col("o")).as("mx"), expr("percentile_approx(o, 0.99)").as("p99"),
        avg(col("o")).as("mean")).head()
    println(s"GRAPHCAPAB occupancy max=${occ.get(0)} p99=${occ.get(1)} mean=${occ.get(2)}")

    def topK(pairs: DataFrame): DataFrame = {
      val sym = pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b")))
      val scored = sym
        .join(v.select(col("vec_id").as("a"), col("q").as("q_l"), col("nrm").as("n_l")), Seq("a"))
        .join(v.select(col("vec_id").as("b"), col("q").as("q_r"), col("nrm").as("n_r")), Seq("b"))
        .select(col("a"), col("b"),
          Similarity.cosine(graft.functions.Native.dotLong(col("q_l"), col("q_r")),
            col("n_l"), col("n_r")).as("sim"))
      val w = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select(col("a").as("g_src"), col("b").as("g_dst"))
    }
    def materialize(df: DataFrame): (DataFrame, Long) = {
      val c = df.localCheckpoint()
      (c, c.count())
    }

    val full = bv.toDF("a", "band", "bucket")
      .join(bv.toDF("b", "band", "bucket"), Seq("band", "bucket"))
      .where(col("a") < col("b")).select("a", "b").distinct()
    val ((uncapped, uncappedEdges), wallU) = timed(materialize(topK(full)))
    println(s"GRAPHCAPAB uncapped edges=$uncappedEdges wall_ms=$wallU")

    Seq(64, 128, 256).foreach { cap =>
      val ((capped, cappedEdges), wallC) =
        timed(materialize(topK(cappedCandidatePairs(bv, cap))))
      val agree = capped.join(uncapped, Seq("g_src", "g_dst"), "left_semi").count()
      println(s"GRAPHCAPAB cap=$cap edges=$cappedEdges wall_ms=$wallC " +
        s"agree_with_uncapped=${agree} agree_x1000=${agree * 1000 / math.max(1L, uncappedEdges)}")
    }
    spark.stop()
  }
}
