package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization — the Spark counterpart of the reference's
  * System R optimizer (reference: QueryPlan.executeOptimal +
  * TableStats costing + QueryPlanCostsTest). With ANALYZE'd tables and
  * CBO on, Catalyst does the same two jobs: cardinality-aware join
  * strategy selection (broadcast the provably-small side, without any
  * hint) and cost-based join reordering.
  */
class CboSpec extends SparkSpec {

  private def managed(name: String, table: String): Unit = {
    Tables.load(spark, sfDir, table).write.mode("overwrite").saveAsTable(name)
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  test("stats flow into the optimized plan and drive join selection") {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    managed("c_t", "customer")
    managed("o_t", "orders")
    managed("n_t", "nation")
    try {
      // deliberately bad syntactic order: fact-fact first, dim last,
      // and NO broadcast hints anywhere
      val q = spark.table("c_t")
        .join(spark.table("o_t"), col("c_custkey") === col("o_custkey"))
        .join(spark.table("n_t"), col("c_nationkey") === col("n_nationkey"))
        .where(col("n_name") === "NATION_7")
        .groupBy("n_name").agg(count(lit(1)).as("n"))

      // per-table row counts came from ANALYZE, not guesses
      val stats = q.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined, s"no CBO row count: $stats")

      // the 25-row dim is broadcast purely from statistics
      val plan = physicalPlan(q)
      assert(plan.contains("BroadcastHashJoin"), plan)

      // and the result is right
      val rows = q.collect()
      assert(rows.length == 1 && rows.head.getLong(1) > 0)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      Seq("c_t", "o_t", "n_t").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
