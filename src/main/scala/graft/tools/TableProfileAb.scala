package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-window A/B of q_table_profile (r15 verdict item 3): the r15
  * shared-scan rewrite measured 1.51 s on the builder's host but 2.08 s
  * in the driver's window against a 1.25 s round-open value — this
  * probe times the SHIPPED query repeatedly in one process so the
  * number is attributable to the code, not the host window.
  * Run with the spark jars on the classpath:
  * java -cp "target/scala-2.13/classes:SPARK_JARS" graft.tools.TableProfileAb
  */
object TableProfileAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def mat(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head()
      ()
    }
    for (round <- 1 to 5) {
      val t0 = System.nanoTime()
      mat(graft.functions.StatsQueries.tableProfile.fn(spark, dir))
      println(f"round $round: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
