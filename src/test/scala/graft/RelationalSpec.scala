package graft

import org.apache.spark.sql.functions._

/** Correctness + physical-plan shape for the core relational surface
  * (SURVEY §2.1). The plan assertions are the scale contract: pushed
  * filters, broadcast dims, partial aggregation, top-k without a
  * global sort.
  */
class RelationalSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("every declared query returns rows at sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("plan lint: no query plans a CartesianProduct") {
    for ((name, fn) <- SparkEntry.queries) {
      val plan = physicalPlan(fn(spark, sfDir))
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL exists for every SQL-expressible query") {
    val withOracle = SparkEntry.oracleSql.keySet
    assert(withOracle.subsetOf(SparkEntry.queries.keySet))
    // every oracle is a single line (driver JSON friendliness)
    SparkEntry.oracleSql.values.foreach(s => assert(!s.contains("\n")))
  }

  test("filter + projection are pushed into the parquet scan") {
    val plan = physicalPlan(run("q_index_range_scan"))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("IsNotNull(l_shipdate)") || plan.contains("GreaterThanOrEqual"), plan)
    // pruned read schema: only the needed columns reach the reader
    assert(!plan.contains("l_extendedprice"), plan)
  }

  test("dimension joins broadcast (no fact shuffle)") {
    assertPlanContains(run("q_join_broadcast"), "BroadcastHashJoin")
  }

  test("shuffle-hash hint yields ShuffledHashJoin (Grace hash analog)") {
    assertPlanContains(run("q_join_shuffle_hash"), "ShuffledHashJoin")
  }

  test("merge hint yields SortMergeJoin") {
    assertPlanContains(run("q_join_sort_merge"), "SortMergeJoin")
  }

  test("naive theta join plans as BroadcastNestedLoopJoin; RangeJoin avoids it and matches") {
    import graft.operators.RangeJoin
    val sup = Tables.load(spark, sfDir, "supplier")
    val cust = Tables.load(spark, sfDir, "customer")
    val naive = broadcast(sup)
      .join(cust, col("c_acctbal") > col("s_acctbal"))
      .groupBy("s_suppkey").agg(count(lit(1)).as("n_greater"))
    assertPlanContains(naive, "BroadcastNestedLoopJoin")
    val banded = RangeJoin.countGreater(sup, "s_suppkey", "s_acctbal", cust, "c_acctbal")
    // the pairwise comparison path must be an equi-join on bucket id
    // (the only nested loop left is the 1-row bounds broadcast)
    val plan = physicalPlan(banded)
    assert(plan.contains("HashJoin [bucket") || plan.contains("SortMergeJoin [bucket"), plan)
    val a = naive.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = banded.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("grouped aggregation has map-side partial aggregation") {
    val plan = physicalPlan(run("q_groupby_agg"))
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_"), plan)
  }

  test("star multijoin broadcasts the dimension chain") {
    val plan = physicalPlan(run("q_multijoin_optimal"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    assertPlanContains(run("q_topk"), "TakeOrderedAndProject")
  }

  test("semi/anti join returns one row per customer") {
    val c = Tables.load(spark, sfDir, "customer").count()
    assert(run("q_semi_anti").count() == c)
  }

  test("QueryBuilder pipeline matches the equivalent direct plan") {
    import graft.operators.{PredicateOperator, QueryBuilder}
    val got = QueryBuilder(Tables.load(spark, sfDir, "orders"))
      .where("o_totalprice", PredicateOperator.GreaterThan, 1000)
      .groupBy("o_orderstatus")
      .count("n")
      .execute()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val exp = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 1000)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == exp)
  }

  test("salted skew join matches the plain equi-join") {
    import graft.operators.SkewJoin
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewJoin.saltedEquiJoin(li, "l_orderkey", "l_partkey", o, "o_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("cached table scans from memory with identical results (LRUCache analog)") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val before = li.groupBy("l_orderkey").count().count()
    val cached = li.cache()
    try {
      cached.count() // materialize
      val plan = physicalPlan(cached.groupBy("l_orderkey").count())
      assert(plan.contains("InMemoryTableScan"), plan)
      assert(cached.groupBy("l_orderkey").count().count() == before)
    } finally cached.unpersist()
  }

  test("histogram selectivity estimates match actual fractions (TableStats analog)") {
    import graft.functions.StatsQueries
    import graft.operators.PredicateOperator
    val li = Tables.load(spark, sfDir, "lineitem")
    val h = StatsQueries.columnHistogram(li, "l_quantity", 10)
    val n = li.count().toDouble
    def actual(c: org.apache.spark.sql.Column): Double = li.where(c).count() / n
    val cases = Seq(
      (PredicateOperator.LessThan, 25.0, actual(col("l_quantity") < 25.0)),
      (PredicateOperator.GreaterThan, 40.0, actual(col("l_quantity") > 40.0)),
      (PredicateOperator.Equals, 10.0, actual(col("l_quantity") === 10.0)))
    for ((op, v, act) <- cases) {
      val est = h.selectivity(op, v)
      assert(math.abs(est - act) < 0.08, s"$op $v: est $est vs actual $act")
    }
  }

  test("string histogram selectivity estimates match actual fractions (StringHistogram analog)") {
    import graft.functions.StatsQueries
    import graft.operators.PredicateOperator
    val c = Tables.load(spark, sfDir, "customer")
    val h = StatsQueries.stringColumnHistogram(c, "c_mktsegment")
    val n = c.count().toDouble
    def actual(cond: org.apache.spark.sql.Column): Double = c.where(cond).count() / n
    val cases = Seq(
      (PredicateOperator.Equals, "MACHINERY", actual(col("c_mktsegment") === "MACHINERY")),
      (PredicateOperator.LessThan, "C", actual(col("c_mktsegment") < "C")),
      (PredicateOperator.GreaterThan, "G", actual(col("c_mktsegment") > "G")))
    for ((op, v, act) <- cases) {
      val est = h.selectivity(op, v)
      assert(math.abs(est - act) < 0.08, s"$op '$v': est $est vs actual $act")
    }
  }

  test("concurrent snapshot reads are consistent (reference P3 analog)") {
    // Spark's immutable-batch model: parallel readers over the same
    // table see identical snapshots — the role the reference's
    // table-level S locks play for its mutable heap files.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val counts = Await.result(
      Future.sequence((1 to 4).map(_ =>
        Future(Tables.load(spark, sfDir, "lineitem").count()))),
      2.minutes).toSet
    assert(counts.size == 1)
  }

  test("plan-shape guards: map-only catalog queries stay exchange-free") {
    // these queries were engineered to be pure map work (narrow
    // projections / Expand / native expressions) — a regression that
    // reintroduces a shuffle should fail loudly, not show up as a
    // silent bench slide
    for (q <- Seq("t_repetition", "t_pii_redact", "q_unpivot", "t_tokens",
        "t_fingerprint", "t_normalize", "t_quality")) {
      val plan = physicalPlan(SparkEntry.queries(q)(spark, sfDir))
      assert(!plan.contains("Exchange"),
        s"$q grew a shuffle:\n$plan")
    }
  }

  test("recursive CTE chain depth equals the one-window optimal rewrite") {
    // the recursion (q_recursive_cte) walks successor pointers level
    // by level; for chain position the window rank IS the depth, so
    // one WindowExec + one aggregate must reproduce the distribution
    // — the naive-vs-optimal pairing of the recursive surface
    import org.apache.spark.sql.expressions.Window
    val recursive = SparkEntry.queries("q_recursive_cte")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val viaWindow = Tables.load(spark, sfDir, "orders")
      .withColumn("depth", row_number().over(w).cast("long"))
      .groupBy("depth").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(recursive == viaWindow, s"$recursive vs $viaWindow")
  }
}
