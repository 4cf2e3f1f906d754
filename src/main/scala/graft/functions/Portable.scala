package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

/** Helpers whose results are bit-identical between Spark and DuckDB, so
  * the driver's hash-compare oracle is deterministic.
  *
  * Why: a plain `sum(double)` is order-dependent (Spark sums per
  * partition, DuckDB sequentially), so the low mantissa bits differ.
  * Routing money-scale doubles through DECIMAL(18,2) makes the sum
  * exact and order-independent; casting back to double yields the same
  * IEEE value in both engines. Division / min / max / floor / sqrt on
  * identical operands are IEEE-exact, hence portable.
  */
object Portable {
  val Money: DecimalType = DecimalType(18, 2)

  def dec(c: Column): Column = c.cast(Money)

  /** Order-independent exact sum of a 2-decimal double column. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Exact-sum / count average; IEEE division of identical operands. */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** price * (1 - discount) in exact decimal arithmetic. */
  def revenueTerm(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(Money) - dec(discount))

  /** Non-overlapping occurrence count of a literal needle, via the
    * length/replace trick — identical left-to-right replace-all
    * semantics in Spark and DuckDB.
    */
  def occurrences(s: Column, needle: String): Column =
    ((length(s) - length(replace(s, lit(needle), lit("")))) / needle.length)
      .cast(IntegerType)

  /** DuckDB fragments mirroring the native md5-60bit text hashing
    * ([[Md5Hash60Util]], [[WordNGramHashesUtil]]) — shared by every
    * oracle that re-derives shingles/tokens in SQL.
    */
  object textSql {
    /** First 15 hex chars of md5(e) as a 60-bit integer — bit-identical
      * to `Md5Hash60Util.hash60` (powers of 16 ≤ 16^14 are exact doubles).
      */
    def h60(e: String): String =
      s"list_sum(list_transform(range(0,15), i -> (strpos('0123456789abcdef', " +
        s"substr(md5($e), CAST(i+1 AS INT), 1)) - 1) * CAST(power(16, 14-i) AS BIGINT)))"

    /** Tokens split on runs of ASCII space (the native tokenizer). */
    val tokens: String = "list_filter(string_split(text, ' '), x -> x <> '')"

    /** [[tokens]] over LOWERCASED text — the oracle twin of every
      * Spark side that tokenizes `lower(text)` (chunk dedup,
      * repetition metrics). Using the raw-text [[tokens]] there only
      * happens to match on an all-lowercase corpus; mixed-case data
      * would silently diverge.
      */
    val tokensLower: String = "list_filter(string_split(lower(text), ' '), x -> x <> '')"

    /** Sorted distinct 60-bit hashes of word n-grams over a token-list
      * column `tk` — the oracle twin of `Native.wordNGramHashes`
      * (incl. the fewer-than-n-tokens → one-gram edge case).
      */
    def grams(n: Int): String =
      s"""CASE WHEN len(tk) = 0 THEN CAST([] AS BIGINT[])
          ELSE list_sort(list_distinct(list_transform(
            list_transform(range(1, CAST(greatest(len(tk)-$n+2, 2) AS BIGINT)),
              i -> array_to_string(tk[i:least(i+$n-1, len(tk))], ' ')),
            g -> ${h60("g")}))) END"""
  }

  /** SQL fragments mirroring the helpers above (DuckDB dialect = ANSI). */
  object sql {
    def dsum(col: String): String =
      s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
    def davg(col: String): String =
      s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE) / COUNT($col)"
    def revenueSum(price: String, discount: String): String =
      s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"
    def occurrences(expr: String, needle: String): String =
      s"CAST((LENGTH($expr) - LENGTH(REPLACE($expr, '$needle', ''))) / ${needle.length} AS INT)"
  }
}
