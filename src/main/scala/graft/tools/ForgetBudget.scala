package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Forget
import graft.sources.{IndexRegistry, Snapshots}

/** The measured line behind the capstone's O(erased docs) claim
  * (round-13 candidate #1): bootstrap the six-family document capstone,
  * then run erasure requests of INCREASING size through
  * [[IndexRegistry.maintainAllTimed]] and record, per request, the
  * erased-doc count, the snapshot-delete wall-clock, and each family's
  * fold wall-clock. Two readings make the claim concrete:
  *
  *  - WITHIN one corpus, the per-family fold time is dominated by the
  *    ~0.5 s manifest-commit floor — the variable part moves with the
  *    erased-doc count, not with the corpus;
  *  - ACROSS corpora (sf0.01 → sf0.1, 10× docs), a same-fraction
  *    erasure's fold time grows far slower than 10× — the fold reads
  *    the change feed, never the corpus (the kNN graph's re-rank being
  *    the documented partial exception).
  *
  * Usage: runMain graft.tools.ForgetBudget <outJson> <sfDir> [sfDir...]
  * Writes one JSON object per (sfDir, round) to `outJson` (a JSON
  * array) and mirrors each line to stdout as `FORGETBUDGET {...}`.
  */
object ForgetBudget {
  def main(args: Array[String]): Unit = {
    val outJson = args(0)
    val sfDirs = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("graft-forget-budget")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // erasure requests, smallest to largest (disjoint-ish slices so
    // each round erases fresh docs from what remains)
    val rounds = Seq(
      ("pct1", col("doc_id") % 101 === 1),
      ("pct8", col("doc_id") % 13 === 0),
      ("pct33", col("doc_id") % 3 === 0))

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    sfDirs.foreach { dir =>
      val (baseT, _) = Forget.bootstrap(spark, dir, tag = "_budget")
      val corpus = Snapshots.read(spark, baseT).count()
      rounds.foreach { case (label, cond) =>
        val erased = Snapshots.read(spark, baseT).where(cond).count()
        val t0 = System.nanoTime()
        val v = Snapshots.deleteWhereSelective(spark, baseT, cond)
          .getOrElse(Snapshots.deleteWhere(spark, baseT, cond))
        val deleteMs = (System.nanoTime() - t0) / 1000000L
        // PARALLEL walk (the production default): per-family times are
        // measured inside each future, so sum(fold_ms) is the
        // sequential-equivalent cost while walk_wall_ms is what an
        // erasure actually waits — the max-vs-sum claim, measured in
        // one walk
        val w0 = System.nanoTime()
        val folds = IndexRegistry.maintainAllTimed(spark, baseT)
        val wallMs = (System.nanoTime() - w0) / 1000000L
        val famJson = folds.map { case (f, ms) => s""""$f":$ms""" }.mkString(",")
        val line =
          s"""{"sf_dir":"$dir","round":"$label","corpus_docs":$corpus,""" +
          s""""erased_docs":$erased,"base_version":$v,"delete_ms":$deleteMs,""" +
          s""""fold_ms":{$famJson},"total_fold_ms":${folds.map(_._2).sum},""" +
          s""""walk_wall_ms":$wallMs}"""
        println(s"FORGETBUDGET $line")
        lines += line
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      ("[\n" + lines.mkString(",\n") + "\n]\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
