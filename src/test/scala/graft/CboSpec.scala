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

  test("join strategy follows the surfaced cost estimates (QueryPlanCostsTest analog)") {
    // The reference asserts IO-cost numbers for competing physical
    // plans (BNLJ vs SNLJ vs hash) and that executeOptimal picks the
    // cheapest. Spark's counterpart: statistics give each join side an
    // estimated size; the planner picks broadcast-hash when the
    // cheaper side fits the threshold and falls back to sort-merge
    // when the surfaced estimate says it does not.
    spark.conf.set("spark.sql.cbo.enabled", "true")
    managed("cc_t", "customer")
    managed("nn_t", "nation")
    try {
      def q = spark.table("cc_t")
        .join(spark.table("nn_t"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))

      // surface the two sides' estimated costs (bytes) from ANALYZE'd stats
      val dimBytes = spark.table("nn_t").queryExecution.optimizedPlan.stats.sizeInBytes
      val factBytes = spark.table("cc_t").queryExecution.optimizedPlan.stats.sizeInBytes
      assert(dimBytes < factBytes,
        s"expected nation ($dimBytes B) cheaper than customer ($factBytes B)")

      // threshold above the cheap side -> broadcast-hash on the dim
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (dimBytes.toLong * 2).toString)
      val broadcastPlan = physicalPlan(q)
      assert(broadcastPlan.contains("BroadcastHashJoin"), broadcastPlan)
      val broadcastRows = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      // threshold below BOTH estimates -> planner must pick the
      // shuffle strategy instead: the decision tracked the numbers
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val smjPlan = physicalPlan(q)
      assert(!smjPlan.contains("BroadcastHashJoin"), smjPlan)
      assert(smjPlan.contains("SortMergeJoin") || smjPlan.contains("ShuffledHashJoin"), smjPlan)

      // physical strategy never changes the answer
      assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == broadcastRows)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.cbo.enabled", "false")
      Seq("cc_t", "nn_t").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
