package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Optimization-round evidence tool (r16): write `.explain("formatted")`
  * for a named set of catalog queries to plans/r16/<query>_<suffix>.txt
  * (suffix = "before" | "after"), so the round's plan-shape claims
  * (exchange counts, feed sources, netted serves) are checkable files
  * rather than prose. Composite (DML) queries execute their side
  * effects while the final frame is built — run against sf0.01 so the
  * dump stays cheap.
  *
  * Run: sbt "runMain graft.tools.DumpPlansR16 before q1,q2,..."
  */
object DumpPlansR16 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpPlansR16 <suffix> <q1,q2,...> [sfdir]")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.registerFunctions(spark)
    val out = Paths.get(graft.Roots.repo, "plans", "r16")
    Files.createDirectories(out)
    val qs = SparkEntry.queries
    names.foreach { name =>
      val txt =
        try {
          val df = qs(name)(spark, dir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
      Files.writeString(out.resolve(s"${name}_$suffix.txt"), txt)
      println(s"wrote plans/r16/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
