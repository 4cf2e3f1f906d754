package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.Snapshots

/** Evidence probe (r16, verdict item 1): the q_mv_join_incremental
  * scenario is replayed up to the ΔR deleteWhere, then the CHANGE FEED
  * between the pre- and post-delete lineitem versions is dumped as a
  * formatted plan to plans/r16/q_mv_join_incremental_feed_<suffix>.txt.
  * Before (manifest-diff netting): the feed scans the old AND new
  * copies of every rewritten dir and nets them. After (CDC sidecar):
  * the feed scans only the DML's own sidecar dir — O(changed rows).
  *
  * Run: sbt "runMain graft.tools.FeedPlanProbe <suffix>"
  */
object FeedPlanProbe {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "after"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = graft.Roots.scratch + "/feedprobe/" + dir.replaceAll("[^A-Za-z0-9]", "_")
    Snapshots.deleteRecursively(root)
    val lT = s"$root/lineitem"
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        col("l_linenumber"), col("l_quantity"))
    Snapshots.commitOverwrite(l.where(col("o_orderkey") % 7 =!= 0), lT)
    Snapshots.commitAppend(l.where(col("o_orderkey") % 7 === 0), lT)
    val fromV = Snapshots.currentVersion(lT)
    Snapshots.deleteWhere(spark, lT, col("l_quantity") < 10)
    val toV = Snapshots.currentVersion(lT)
    val (ins, del) = Snapshots.changesBetween(spark, lT, fromV, toV)
    val txt =
      s"== ins side (v$fromV -> v$toV) ==\n" +
        ins.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode) +
        s"\n== del side (v$fromV -> v$toV) ==\n" +
        del.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
    val out = Paths.get(graft.Roots.repo, "plans", "r16")
    Files.createDirectories(out)
    Files.writeString(out.resolve(s"q_mv_join_incremental_feed_$suffix.txt"), txt)
    println(s"wrote plans/r16/q_mv_join_incremental_feed_$suffix.txt")
    spark.stop()
  }
}
