package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed fact-fact joins — the manual
  * counterpart of AQE's skew-join splitting (which GraftSession also
  * enables). Use when one join key dominates (a hot customer, an empty
  * default key): a plain shuffle join sends the whole hot key to one
  * task; salting fans it out over `saltFactor` tasks.
  *
  * Left (large, skewed) rows get a deterministic salt from a
  * non-key column hash; right (smaller) rows are replicated once per
  * salt value. Join key becomes (key, salt) — hot keys now spread
  * across saltFactor partitions. Deterministic: no rand(), so results
  * and retries are stable.
  */
object SkewJoin {

  def saltedEquiJoin(
      left: DataFrame, leftKey: String, saltSource: String,
      right: DataFrame, rightKey: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = left.withColumn("_salt", pmod(hash(col(saltSource)), lit(saltFactor)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
      salted(leftKey) === replicated(rightKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
