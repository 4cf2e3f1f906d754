package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, Events, Extended, Forget, Multimodal, Relational, Similarity, TpcH}
import graft.functions.{StatsQueries, TextFunctions}
import graft.sources.SourceQueries

/** Driver contract — see SURVEY.md §2 (capability
  * inventory) and §7 (build plan). Every implemented capability is one
  * QueryDef: a named DataFrame query plus (where SQL-expressible) a
  * DuckDB oracle that hash-matches bit-for-bit.
  */
object SparkEntry {

  /** All implemented capabilities, in SURVEY §2 order. */
  def all: Seq[QueryDef] =
    Relational.defs ++ Extended.defs ++ StatsQueries.defs ++
      TextFunctions.defs ++ Events.defs ++ Dedup.defs ++
      Similarity.defs ++ Multimodal.defs ++ SourceQueries.defs ++
      TpcH.defs ++ Forget.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The end-to-end preprocessing pipeline (normalize →
    * quality gate → dedup → per-language stats) — the single plan a
    * reference user would run nightly.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("t_pipeline_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.linesIterator.map(_.trim).mkString(" "))).toMap
}
