package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{avg => favg, col, count => fcount, lit}
import graft.functions.Portable

/** The six comparison operators of the reference engine's predicate
  * surface (reference: query/QueryPlan.java:16-23 `PredicateOperator`,
  * query/WhereOperator.java).
  */
sealed abstract class PredicateOperator(val apply: (Column, Column) => Column)
object PredicateOperator {
  case object Equals            extends PredicateOperator(_ === _)
  case object NotEquals         extends PredicateOperator(_ =!= _)
  case object LessThan          extends PredicateOperator(_ < _)
  case object LessThanEquals    extends PredicateOperator(_ <= _)
  case object GreaterThan       extends PredicateOperator(_ > _)
  case object GreaterThanEquals extends PredicateOperator(_ >= _)
}

/** Spark-first re-expression of the reference's fluent `QueryPlan` API
  * (reference: query/QueryPlan.java — where/join/select/groupBy/
  * count/sum/average, executed by `execute` (QueryPlan.java:168) or `executeOptimal` (QueryPlan.java:193)).
  *
  * Instead of hand-building an operator DAG and costing it with System
  * R (reference: QueryPlan.executeOptimal + table/stats/TableStats
  * .java), we declare the plan as a DataFrame and let Catalyst do the
  * same job: access-path selection via pushdown, join ordering via
  * CBO/AQE, and physical join choice (broadcast/shuffle-hash/
  * sort-merge — the analogs of BNLJ/GraceHash/sort-based joins).
  * `execute()` therefore IS `executeOptimal()`.
  *
  * Aggregate doubles go through [[Portable]] decimal so results are
  * engine-portable and order-independent.
  */
final class QueryBuilder private (
    df: DataFrame,
    groupCols: Seq[String],
    aggs: Seq[Column]) {

  def where(column: String, op: PredicateOperator, value: Any): QueryBuilder =
    new QueryBuilder(df.filter(op.apply(col(column), lit(value))), groupCols, aggs)

  def where(predicate: Column): QueryBuilder =
    new QueryBuilder(df.filter(predicate), groupCols, aggs)

  /** Equi-join, reference QueryPlan.join(tableName, leftCol, rightCol). */
  def join(right: DataFrame, leftColumn: String, rightColumn: String): QueryBuilder = {
    val joined =
      if (leftColumn == rightColumn) df.join(right, Seq(leftColumn))
      else df.join(right, col(leftColumn) === right(rightColumn))
    new QueryBuilder(joined, groupCols, aggs)
  }

  def select(columns: Seq[String]): QueryBuilder =
    new QueryBuilder(df.select(columns.map(col): _*), groupCols, aggs)

  /** Table aliasing — reference Transaction.queryAs(table, alias). */
  def as(alias: String): QueryBuilder =
    new QueryBuilder(df.alias(alias), groupCols, aggs)

  /** Deterministic ordered limit (TakeOrderedAndProject at scale). */
  def orderByLimit(k: Int, ordering: Column*): QueryBuilder =
    new QueryBuilder(df.orderBy(ordering: _*).limit(k), groupCols, aggs)

  def groupBy(columns: String*): QueryBuilder =
    new QueryBuilder(df, groupCols ++ columns, aggs)

  /** count(*) — reference QueryPlan.count(). */
  def count(as: String = "countagg"): QueryBuilder =
    new QueryBuilder(df, groupCols, aggs :+ fcount(lit(1)).as(as))

  /** sum(column) — reference QueryPlan.sum(column); exact decimal sum. */
  def sum(column: String, as: String = "sumagg"): QueryBuilder =
    new QueryBuilder(df, groupCols, aggs :+ Portable.dsum(col(column)).as(as))

  /** average(column) — reference QueryPlan.average(column). */
  def average(column: String, as: String = "avgagg"): QueryBuilder =
    new QueryBuilder(df, groupCols, aggs :+ Portable.davg(col(column)).as(as))

  /** Produce the final DataFrame. Catalyst optimizes the whole tree —
    * this is the reference's `executeOptimal`: declarative plans are
    * optimized by default, and [[executeNaive]] exists only as the
    * pedagogical bad-plan baseline.
    */
  def execute(): DataFrame =
    if (aggs.isEmpty) df
    else if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)

  def executeOptimal(): DataFrame = execute()

  /** The reference's pedagogical NAIVE plan (reference:
    * query/QueryPlan.java:168 `execute` — syntactic operator order, no
    * costing — vs :193 `executeOptimal`, asserted apart by
    * QueryPlanCostsTest.java): the SAME logical tree planned with the
    * optimizer's cost-based choices pinned off — joins stay in fluent
    * (left-deep syntactic) order, nothing broadcasts, filters and
    * projections are not pushed into the scans, no AQE/CBO/runtime
    * filters. Same answer, strictly worse plan; CboSpec measures the
    * shuffle-byte gap. Planning is forced while the pins are in effect
    * (and restored after), so the returned frame keeps its naive
    * physical plan.
    */
  def executeNaive(): DataFrame = {
    val out = execute()
    val spark = out.sparkSession
    val pins = Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.parquet.filterPushdown" -> "false",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.optimizer.excludedRules" -> Seq(
        "org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder",
        "org.apache.spark.sql.catalyst.optimizer.ReorderJoin",
        "org.apache.spark.sql.catalyst.optimizer.PushDownPredicates",
        "org.apache.spark.sql.catalyst.optimizer.PushPredicateThroughJoin",
        "org.apache.spark.sql.catalyst.optimizer.ColumnPruning").mkString(","))
    val saved = pins.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    pins.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      out.queryExecution.executedPlan // force planning under the pins
      out
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

object QueryBuilder {
  def apply(base: DataFrame): QueryBuilder = new QueryBuilder(base, Nil, Nil)
}
