package graft

import org.apache.spark.sql.functions._

/** Layout-invariance guard (round 8, VERDICT item 7): every PLANS.md
  * scan of the driver-generated testdata shows single-file parquet
  * (`InMemoryFileIndex(1 paths)`), so nothing in CI would catch a
  * single-file-only assumption (e.g. an accidental reliance on row
  * order within a scan, a fingerprint scheme that breaks on
  * directories, a per-file aggregate treated as global) before a
  * scale-up to real multi-file tables. This spec re-runs one
  * representative catalog query per family — a TPC-H multi-join, a
  * shuffle-heavy dedup, and a persisted-index search serve — against a
  * repartitioned MULTI-file copy of every table and asserts row-
  * identical results.
  */
class MultiFileSpec extends SparkSpec {

  test("catalog queries are layout-invariant under multi-file repartitioned testdata") {
    val dst = "/root/repo/target/multifile/sf0_001"
    graft.sources.Snapshots.deleteRecursively(dst)
    Tables.names.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").repartition(4)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    // the copy must actually be multi-file for the big tables, or the
    // test is vacuous
    val liFiles = new java.io.File(s"$dst/lineitem.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(liFiles > 1, s"expected a multi-file lineitem copy, got $liFiles file(s)")

    // one per family: TPC-H multi-join, shuffle-heavy dedup,
    // persisted-index serve, windowed analytics, eval-tier rank stat
    for (q <- Seq("q_tpch_q3", "d_dedup_minhash", "t_inverted_search",
        "q_events_changepoint", "t_eval_auc")) {
      val fn = SparkEntry.queries(q)
      def rows(dir: String): Seq[String] =
        fn(spark, dir).collect().map(_.toString).sorted.toSeq
      val (single, multi) = (rows(sfDir), rows(dst))
      assert(single.nonEmpty, s"$q returned no rows on the single-file layout")
      assert(single == multi,
        s"$q diverged on the multi-file layout: " +
          s"${single.size} vs ${multi.size} rows; first diff: " +
          single.zipAll(multi, "<none>", "<none>")
            .collectFirst { case (a, b) if a != b => s"$a vs $b" }
            .getOrElse("<size-only>"))
    }
  }
}
