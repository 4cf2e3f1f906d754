package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Forget
import graft.sources.IndexRegistry

/** Per-family fold breakdown of the capstone-vs-audit walk budget
  * (round-14 verdict item 1: q_forget_audit's fold-sum grew 19.2 →
  * 32.9 s at sf0.1 while q_forget_capstone — IDENTICAL maintenance
  * work, different tag — stayed flat). Runs both query shapes
  * back-to-back in BOTH orders, draining the walk log after the
  * bootstrap walk and again after the erasure walk, so the output
  * names (a) which phase grew, (b) which family, and (c) whether the
  * cost follows the QUERY or the POSITION in the run (first-touch
  * warmup vs a real per-query regression).
  *
  * Usage: runMain graft.tools.AuditProbe <sfDir> [reps]
  */
object AuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-audit-probe")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def drain(label: String): Long = {
      val es = IndexRegistry.drainWalkLog()
      val sum = es.map(_._3).sum
      val wall =
        if (es.isEmpty) 0L
        else (es.map(_._5).max - es.map(_._4).min) / 1000000L
      val fams = es.map(e => s"${e._2}=${e._3}").mkString(" ")
      println(s"AUDITPROBE $label sum_ms=$sum wall_ms=$wall $fams")
      sum
    }

    def runShape(tag: String): Unit = {
      val (baseT, _) = Forget.bootstrap(spark, dir, tag = tag)
      drain(s"$tag/bootstrap")
      IndexRegistry.forgetWhere(spark, baseT, pmod(col("doc_id"), lit(7)) === 0)
      drain(s"$tag/erasure")
    }

    IndexRegistry.drainWalkLog()
    (1 to reps).foreach { r =>
      println(s"AUDITPROBE == rep $r: audit-first ==")
      runShape("_aud_probe")
      runShape("_cap_probe")
      println(s"AUDITPROBE == rep $r: capstone-first ==")
      runShape("_cap_probe")
      runShape("_aud_probe")
    }
    spark.stop()
  }
}
