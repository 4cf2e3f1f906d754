package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named query over a scale-factor directory,
  * with an optional ANSI-SQL oracle (DuckDB-checked by the driver).
  * Rows without an oracle get the driver's weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Table loaders for a driver test-data directory (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Tuned local session factory. Mirrors what a cluster deployment would
  * set: AQE on (runtime re-plan — the dynamic counterpart of the
  * reference's static System R optimizer in QueryPlan.executeOptimal,
  * reference: query/QueryPlan.java), shuffle partitions sized to the
  * machine instead of the 200 default.
  */
object GraftSession {
  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
