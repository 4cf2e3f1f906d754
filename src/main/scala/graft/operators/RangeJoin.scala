package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable band (range) join: for each left row, count right rows
  * whose value exceeds the left value — the workload a naive theta
  * join (reference: query/SNLJOperator.java tuple nested loop; Spark:
  * BroadcastNestedLoopJoin) handles in O(|L|·|R|).
  *
  * Strategy (all declarative, shuffle-light):
  *  1. bucket both sides into `nBuckets` equi-width value buckets;
  *  2. per-bucket right-side counts (tiny) → suffix sums give each
  *     left row its strictly-higher-bucket count via broadcast join;
  *  3. only same-bucket pairs are compared exactly (equi-join on
  *     bucket id → co-partitioned shuffle, |L|·|R|/B expected work).
  * At 100 TB this is one small broadcast + one key-partitioned join;
  * the nested loop never materializes.
  */
object RangeJoin {

  /** Returns `left` keyed rows with `n_greater` = count of right rows
    * where rightVal > leftVal. Rows with zero matches are dropped
    * (inner-join semantics).
    */
  def countGreater(
      left: DataFrame, leftKey: String, leftVal: String,
      right: DataFrame, rightVal: String,
      nBuckets: Int = 256): DataFrame = {

    // ONE bounds pass, fetched as two scalars: cross-joining a bounds
    // aggregate into both sides made the plan re-run the min/max scan
    // once per consumer (four identical subtrees); a 2-value driver
    // fetch is the legitimate exception to the no-collect rule, and
    // the literal bounds keep bucket assignment inside codegen.
    val boundsRow = right.agg(
      min(col(rightVal)).cast("double").as("lo"),
      max(col(rightVal)).cast("double").as("hi")).head()
    // empty right side → null bounds → no right row can exceed anything:
    // inner-join semantics mean an empty result, not an NPE
    if (boundsRow.isNullAt(0)) {
      return left.select(col(leftKey), lit(0L).as("n_greater")).where(lit(false))
    }
    val (lo, hi) = (boundsRow.getDouble(0), boundsRow.getDouble(1))

    def bucketOf(v: Column): Column =
      if (hi == lo) lit(0L)
      else least(greatest(
        floor((v - lit(lo)) * nBuckets / lit(hi - lo)), lit(0L)),
        lit(nBuckets - 1L))

    val r = right
      .select(bucketOf(col(rightVal)).as("bucket"), col(rightVal).as("rv"))

    // dense per-bucket counts + strictly-higher suffix sums (B rows)
    val spine = right.sparkSession.range(nBuckets).select(col("id").as("bucket"))
    val perBucket = spine.join(
        r.groupBy("bucket").agg(count(lit(1)).as("cnt")), Seq("bucket"), "left")
      .na.fill(0, Seq("cnt"))
    // constant partition key: the suffix sum runs over exactly
    // nBuckets (=256) rows, so the single partition is intentional —
    // the key only silences WindowExec's single-partition warning
    val wDesc = Window.partitionBy(lit(0)).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val higher = broadcast(perBucket
      .select(col("bucket"), coalesce(sum(col("cnt")).over(wDesc), lit(0L)).as("n_higher")))

    val l = left
      .select(col(leftKey), col(leftVal).as("lv"), bucketOf(col(leftVal)).as("bucket"))
      .join(higher, Seq("bucket"))

    // exact comparison only within the shared bucket
    val same = l.join(r, Seq("bucket"))
      .where(col("rv") > col("lv"))
      .groupBy(leftKey).agg(count(lit(1)).as("n_same"))

    l.join(same, Seq(leftKey), "left").na.fill(0, Seq("n_same"))
      .select(col(leftKey), (col("n_higher") + col("n_same")).as("n_greater"))
      .where(col("n_greater") > 0)
  }
}
