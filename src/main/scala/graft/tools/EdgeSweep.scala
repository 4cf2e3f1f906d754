package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}
import org.apache.spark.sql.functions.col

/** Diagnostic sweep behind EdgeCaseSpec's full-catalog widening: runs
  * EVERY catalog query against an empty and a single-row corpus and
  * prints the queries that throw, with the exception head — the
  * work-list generator for degenerate-input hardening.
  */
object EdgeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def writeScaled(dst: String, limit: Int): Unit = {
      graft.sources.Snapshots.deleteRecursively(dst)
      Tables.names.foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").limit(limit)
          .coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    }
    for ((label, limit) <- Seq("EMPTY" -> 0, "ONE" -> 1)) {
      val dst = graft.Roots.scratch + s"/edgesweep/${label.toLowerCase}"
      writeScaled(dst, limit)
      var bad = 0
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try { fn(spark, dst).collect(); () }
        catch { case e: Throwable =>
          bad += 1
          println(s"THROW[$label] $name: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(160))
        }
      }
      println(s"== $label: $bad/${SparkEntry.queries.size} throw")
    }
    spark.stop()
  }
}
