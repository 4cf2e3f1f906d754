package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + helpers for all suites. One warm session per JVM. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  def physicalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  /** Assert the final physical plan contains an operator/marker. */
  def assertPlanContains(df: DataFrame, marker: String): Unit = {
    val plan = physicalPlan(df)
    assert(plan.contains(marker), s"expected '$marker' in plan:\n$plan")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.create("local[4]", 4)
    // r16: suites run with per-group scratch roots (build.sbt
    // testGrouping), which lengthens every persisted-table path; raise
    // the explain metadata cap so plan assertions on path suffixes
    // (e.g. "postings_pos") are not hidden by location truncation
    s.conf.set("spark.sql.maxMetadataStringLength", "400")
    s
  }
}
