package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session A/B for q_recursive_cte's per-level overhead: the
  * recursion cost is depth × per-level job latency, so the knob worth
  * measuring is HOW MANY TASKS each tiny level schedules — the
  * successor-table partition count (the per-level join's left side)
  * and spark.sql.shuffle.partitions during the recursion (every
  * level's frontier exchange). Run:
  * {{{ sbt "runMain graft.tools.RecursiveCteAb /root/testdata/sf0.1" }}}
  * Prints best-of-3 per variant, interleaved to cancel container
  * contention drift.
  */
object RecursiveCteAb {

  private def once(s: SparkSession, nParts: Int, shuffleParts: Int,
      parallelismFirst: Boolean = true): Double = {
    val old = s.conf.get("spark.sql.shuffle.partitions")
    val oldPf = s.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst")
    s.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      parallelismFirst.toString)
    s.sql(
      """SELECT o_custkey, o_orderkey,
                LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key,
                ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders_rc""")
      .repartition(nParts, col("o_orderkey")).localCheckpoint()
      .createOrReplaceTempView("nxt_rc")
    s.conf.set("spark.sql.shuffle.partitions", shuffleParts.toString)
    val t0 = System.nanoTime()
    s.sql(
      """WITH RECURSIVE chain AS (
           SELECT o_custkey, next_key, CAST(1 AS BIGINT) AS depth FROM nxt_rc WHERE rn = 1
           UNION ALL
           SELECT n.o_custkey, n.next_key, c.depth + 1
           FROM chain c JOIN nxt_rc n ON n.o_orderkey = c.next_key)
         SELECT depth, COUNT(*) AS n_customers FROM chain GROUP BY depth""")
      .collect()
    val dt = (System.nanoTime() - t0) / 1e9
    s.conf.set("spark.sql.shuffle.partitions", old)
    s.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", oldPf)
    dt
  }

  /** Full-query variants (successor build + recursion + final agg +
    * hash materialization — exactly what Bench times).
    */
  private def fullOnce(s: SparkSession, narrow: Boolean,
      nxtParts: Option[Int] = None): Double = {
    val t0 = System.nanoTime()
    val nxt0 = s.sql(
      """SELECT o_custkey, o_orderkey,
                LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_key,
                ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
         FROM orders_rc""")
    nxtParts.fold(nxt0.repartition(col("o_orderkey")))(
        n => nxt0.repartition(n, col("o_orderkey")))
      .localCheckpoint()
      .createOrReplaceTempView("nxt_rc")
    val rec =
      """WITH RECURSIVE chain AS (
           SELECT o_custkey, next_key, CAST(1 AS BIGINT) AS depth FROM nxt_rc WHERE rn = 1
           UNION ALL
           SELECT n.o_custkey, n.next_key, c.depth + 1
           FROM chain c JOIN nxt_rc n ON n.o_orderkey = c.next_key)"""
    val out =
      if (narrow) {
        val old = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "4")
        val chain =
          try s.sql(s"$rec SELECT depth FROM chain").localCheckpoint()
          finally s.conf.set("spark.sql.shuffle.partitions", old)
        chain.groupBy("depth").agg(count(lit(1)).as("n_customers"))
      } else
        s.sql(s"$rec SELECT depth, COUNT(*) AS n_customers FROM chain GROUP BY depth")
    out.select(xxhash64(out.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).head()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create("local[32]", 32)
    graft.Tables.load(spark, dir, "orders").createOrReplaceTempView("orders_rc")
    // (nxtParts, shuffleParts, parallelismFirst)
    val variants = Seq((32, 32, true), (4, 4, true), (32, 4, true),
      (32, 32, false), (32, 4, false))
    variants.foreach { case (n, sp, pf) => once(spark, n, sp, pf) } // warmup
    val times = (1 to 3).map { _ =>
      variants.map { case v @ (n, sp, pf) => v -> once(spark, n, sp, pf) }.toMap
    }
    variants.foreach { v =>
      val best = times.map(_(v)).min
      println(f"nxtParts=${v._1}%2d shuffleParts=${v._2}%2d parallelismFirst=${v._3}%5s  best-of-3 = $best%.2f s")
    }
    // whole-query A/B (what Bench measures): old, narrow recursion
    // over session-width nxt, and fully co-partitioned narrow
    val modes: Seq[(String, () => Double)] = Seq(
      "old             " -> (() => fullOnce(spark, narrow = false)),
      "narrowRec       " -> (() => fullOnce(spark, narrow = true)),
      "narrowCoPart    " -> (() => fullOnce(spark, narrow = true, nxtParts = Some(4))))
    modes.foreach(_._2()) // warmup
    val full = (1 to 3).map(_ => modes.map { case (k, f) => k -> f() }.toMap)
    modes.foreach { case (k, _) =>
      println(f"fullQuery $k best-of-3 = ${full.map(_(k)).min}%.2f s") }
    spark.stop()
  }
}
