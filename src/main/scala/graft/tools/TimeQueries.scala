package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer: warm + best-of-2 wall time for a
  * comma-separated list of catalog queries at one SF dir — the quick
  * pre-bench check that a NEW query won't land as a full-bench
  * outlier. Run:
  *   java -cp "target/scala-2.13/classes:SPARK_JARS" \
  *     graft.tools.TimeQueries /root/testdata/sf0.1 q_a,q_b
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.registerFunctions(spark)
    val qs = graft.SparkEntry.queries
    for (n <- names) {
      def once(): Double = {
        val t0 = System.nanoTime()
        qs(n)(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm (codegen + any content-keyed index build)
      val best = math.min(once(), once())
      println(f"TIMED $n%-28s $best%6.2f s")
    }
  }
}
