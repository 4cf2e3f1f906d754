package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent
  * right row with rightTime <= leftTime for the same key. The
  * feature-backfill primitive of a training-data pipeline (join each
  * example to the latest-known feature state), absent from Spark SQL.
  *
  * Per the extension preference order, this composes built-ins rather
  * than adding a custom SparkPlan: tag both sides, union, and take
  * `last(rightTime, ignoreNulls)` over a (key, time, side) window —
  * one shuffle on the key and one in-partition sort, the same cost
  * shape as a sort-merge join. To carry right-side values, pack them
  * in the time column as a struct ordered by (time, ...).
  */
object AsOfJoin {

  /** Returns `left` plus `asof_<timeCol>` = latest right time at or
    * before the left row's time (null when none precedes).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, timeCol: String): DataFrame = {
    val others = left.columns.toSeq.filterNot(c => c == key || c == timeCol)
    val tType = right.schema(timeCol).dataType
    val l2 = left.select(
      (Seq(col(key), col(timeCol), lit(1).as("_src"),
        lit(null).cast(tType).as("_rt")) ++ others.map(col)): _*)
    val r2 = right.select(
      (Seq(col(key), col(timeCol), lit(0).as("_src"),
        col(timeCol).as("_rt")) ++
        others.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // right rows sort before left rows at equal time => "<=" semantics
    val w = Window.partitionBy(key).orderBy(col(timeCol), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn(s"asof_$timeCol", last(col("_rt"), ignoreNulls = true).over(w))
      .where(col("_src") === 1)
      .select((left.columns.toSeq :+ s"asof_$timeCol").map(col): _*)
  }

  /** NEAREST-direction as-of (pandas `merge_asof direction='nearest'`):
    * `asof_<timeCol>` = the right time minimizing |rightTime −
    * leftTime| for the key, ties to the EARLIER (backward) side; null
    * when the key has no right rows. Same union shape as [[asOf]] with
    * one backward and one forward window — ONE shuffle on the key, two
    * in-partition sorts (the orderings differ only in the tie column).
    */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
      timeCol: String): DataFrame = {
    val others = left.columns.toSeq.filterNot(c => c == key || c == timeCol)
    val tType = right.schema(timeCol).dataType
    val l2 = left.select(
      (Seq(col(key), col(timeCol), lit(1).as("_src"),
        lit(null).cast(tType).as("_rt")) ++ others.map(col)): _*)
    val r2 = right.select(
      (Seq(col(key), col(timeCol), lit(0).as("_src"),
        col(timeCol).as("_rt")) ++
        others.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // backward: right rows sort BEFORE left at equal time ("<=");
    // forward: right rows sort AFTER left at equal time (">=")
    val wb = Window.partitionBy(key).orderBy(col(timeCol), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(key).orderBy(col(timeCol), col("_src").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prev = last(col("_rt"), ignoreNulls = true).over(wb)
    val next = first(col("_rt"), ignoreNulls = true).over(wf)
    l2.unionByName(r2)
      .withColumn("_prev", prev).withColumn("_next", next)
      .where(col("_src") === 1)
      .withColumn(s"asof_$timeCol",
        when(col("_prev").isNull, col("_next"))
          .when(col("_next").isNull, col("_prev"))
          .when(col(timeCol) - col("_prev") <= col("_next") - col(timeCol),
            col("_prev"))
          .otherwise(col("_next")))
      .select((left.columns.toSeq :+ s"asof_$timeCol").map(col): _*)
  }
}
