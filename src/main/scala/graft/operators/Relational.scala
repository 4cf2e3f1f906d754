package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.{QueryDef, Tables}
import graft.functions.Portable
import graft.functions.Portable.{sql => P}

/** Core relational surface — Spark-first re-expression of the reference
  * engine's scan / filter / project / aggregate / join operators
  * (reference: query/SequentialScanOperator.java, WhereOperator.java,
  * SelectOperator.java, GroupByOperator.java, SNLJ/PNLJ/BNLJ/
  * GraceHashOperator.java, QueryPlan.java).
  *
  * Design notes for 100 TB:
  *  - every scan is a declarative parquet read → Catalyst pushes
  *    filters + prunes columns into the scan;
  *  - dimension joins are broadcast (no fact shuffle);
  *  - fact-fact joins shuffle on the join key only (Grace-hash at
  *    cluster scale = shuffle-hash; sort-merge when both sides large);
  *  - aggregates are hash aggregates with map-side partial combine.
  */
object Relational {

  private[operators] val bucketedLock = new Object

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** §2.1 row 1 — sequential scan + projection; column pruning reaches
    * the parquet reader (reference: SequentialScanOperator.java +
    * SelectOperator projection).
    */
  val scanProject: QueryDef = QueryDef(
    "q_scan_project",
    (s, dir) => t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
    Some("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem"))

  /** §2.1 row 2 — WHERE with all six comparators of the reference
    * predicate surface (reference: WhereOperator.java,
    * QueryPlan.PredicateOperator). All conjuncts push to parquet.
    */
  val wherePredicates: QueryDef = QueryDef(
    "q_where_predicates",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_quantity") > 5 && col("l_quantity") <= 45 &&
        col("l_discount") >= 0.02 && col("l_discount") < 0.08 &&
        col("l_returnflag") === "R" && col("l_linestatus") =!= "Z")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_linestatus"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
            FROM lineitem
            WHERE l_quantity > 5 AND l_quantity <= 45 AND l_discount >= 0.02
              AND l_discount < 0.08 AND l_returnflag = 'R' AND l_linestatus <> 'Z'"""))

  /** §2.1 row 3 — range scan on a sort-friendly key: Spark's analog of
    * a clustered B+-tree range scan (reference: IndexScanOperator.java,
    * index/BPlusTree.java sortedScanFrom) is min/max row-group pruning
    * + pushed range predicates.
    */
  val indexRangeScan: QueryDef = QueryDef(
    "q_index_range_scan",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_date")),
    Some("""SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"""))

  /** §2.1 row 18 — point lookup by key (reference: BPlusTree.lookupKey
    * via IndexScanOperator EQUALS). Pushed equality predicate prunes
    * row groups; at cluster scale this touches one file footer.
    */
  val pointLookup: QueryDef = QueryDef(
    "q_point_lookup",
    (s, dir) => t(s, dir, "orders").filter(col("o_orderkey") === 42),
    Some("SELECT * FROM orders WHERE o_orderkey = 42"))

  /** §2.1 row 4 — global aggregates without grouping (reference:
    * SelectOperator.java count/sum/average). Partial aggregation on
    * every partition, one-row merge.
    */
  val aggGlobal: QueryDef = QueryDef(
    "q_agg_global",
    (s, dir) => t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      Portable.dsum(col("l_quantity")).as("sum_qty"),
      Portable.davg(col("l_extendedprice")).as("avg_price"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty")),
    Some(s"""SELECT COUNT(*) AS n_rows, ${P.dsum("l_quantity")} AS sum_qty,
             ${P.davg("l_extendedprice")} AS avg_price,
             MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty FROM lineitem"""))

  /** §2.1 row 5 — grouped aggregation (reference: GroupByOperator.java
    * + SelectOperator aggregates); TPC-H Q1 shape. Flagship query.
    */
  val groupByAgg: QueryDef = QueryDef(
    "q_groupby_agg",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Portable.dsum(col("l_quantity")).as("sum_qty"),
        Portable.dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(Portable.revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        Portable.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order")),
    Some(s"""SELECT l_returnflag, l_linestatus,
             ${P.dsum("l_quantity")} AS sum_qty,
             ${P.dsum("l_extendedprice")} AS sum_base_price,
             ${P.revenueSum("l_extendedprice", "l_discount")} AS sum_disc_price,
             ${P.davg("l_quantity")} AS avg_qty,
             COUNT(*) AS count_order
             FROM lineitem GROUP BY l_returnflag, l_linestatus"""))

  /** §2.1 row 6 — broadcast hash join: the scale-out BNLJ (reference:
    * BNLJOperator.java keeps the small side in memory blocks; Spark
    * broadcasts the dims so the fact side never shuffles).
    */
  val joinBroadcast: QueryDef = QueryDef(
    "q_join_broadcast",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      c.join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    },
    Some("""SELECT c_custkey, n_name, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey"""))

  /** §2.1 row 7 — shuffle-hash join: Grace hash join at cluster scale
    * (reference: GraceHashOperator.java:12 — partition both sides by key
    * hash, build per partition; Spark's shuffle is exactly the Grace
    * partitioning phase).
    */
  val joinShuffleHash: QueryDef = QueryDef(
    "q_join_shuffle_hash",
    // The hint lives on ORDERS (the smaller relation): Spark builds the
    // per-task hash map on the hinted side, and Grace hash builds on the
    // SMALL side — hinting lineitem would build fact-sized maps per task,
    // an OOM risk at scale that AQE cannot undo.
    (s, dir) => t(s, dir, "lineitem")
      .join(t(s, dir, "orders").hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(Portable.revenueTerm(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items")),
    Some(s"""SELECT o_orderpriority,
             ${P.revenueSum("l_extendedprice", "l_discount")} AS revenue,
             COUNT(*) AS n_items
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY o_orderpriority"""))

  /** §2.1 row 8 — sort-merge join: the scale answer where both sides
    * are large (reference analogs: PNLJ/BNLJ large-large,
    * PNLJOperator.java / BNLJOperator.java — quadratic on disk pages;
    * SMJ replaces that with shuffle-sort-merge, linear passes).
    */
  val joinSortMerge: QueryDef = QueryDef(
    "q_join_sort_merge",
    (s, dir) => t(s, dir, "lineitem").hint("merge")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"), Portable.dsum(col("l_quantity")).as("sum_qty")),
    Some(s"""SELECT o_orderstatus, COUNT(*) AS n_items, ${P.dsum("l_quantity")} AS sum_qty
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY o_orderstatus"""))

  /** §2.1 row 9 — theta (non-equi) join: the general SNLJ case
    * (reference: SNLJOperator.java:14). Spark's naive plan is a
    * BroadcastNestedLoopJoin — O(|L|·|R|), which dies at scale — so
    * this re-expresses the range predicate as a bucketed band join
    * ([[RangeJoin.countGreater]]): broadcast bucket statistics +
    * same-bucket equi-join. Same semantics, shuffle-light.
    */
  val joinTheta: QueryDef = QueryDef(
    "q_join_theta",
    (s, dir) => RangeJoin.countGreater(
      t(s, dir, "supplier"), "s_suppkey", "s_acctbal",
      t(s, dir, "customer"), "c_acctbal")
      .withColumnRenamed("n_greater", "n_richer_customers"),
    Some("""SELECT s_suppkey, COUNT(*) AS n_richer_customers
            FROM supplier JOIN customer ON c_acctbal > s_acctbal
            GROUP BY s_suppkey"""))

  /** §2.1 row 10 — multi-way star join, declaratively stated; Catalyst
    * + AQE do access-path selection and join ordering (reference:
    * QueryPlan.executeOptimal System R search + TableStats costing).
    * TPC-H Q5 shape: region→nation→customer→orders→lineitem.
    */
  val multijoinOptimal: QueryDef = QueryDef(
    "q_multijoin_optimal",
    (s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem")
      broadcast(r).join(n, col("r_regionkey") === col("n_regionkey"))
        .join(c, col("n_nationkey") === col("c_nationkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("n_name")
        .agg(
          sum(Portable.revenueTerm(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some(s"""SELECT n_name,
             ${P.revenueSum("l_extendedprice", "l_discount")} AS revenue,
             COUNT(*) AS n_items
             FROM region
             JOIN nation ON r_regionkey = n_regionkey
             JOIN customer ON n_nationkey = c_nationkey
             JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
             WHERE r_name = 'ASIA'
               AND o_orderdate >= TIMESTAMP '1996-01-01'
               AND o_orderdate < TIMESTAMP '1998-01-01'
             GROUP BY n_name"""))

  /** §2.1 row 11 — full pipeline through the reference-shaped fluent
    * API (reference: QueryPlan.java usage in TestDatabaseQueries.java:
    * queryAs/join/where/groupBy/count-sum-average).
    */
  val pipelineFull: QueryDef = QueryDef(
    "q_pipeline_full",
    (s, dir) => QueryBuilder(t(s, dir, "customer"))
      .join(t(s, dir, "orders"), "c_custkey", "o_custkey")
      .where("c_acctbal", PredicateOperator.GreaterThan, 0)
      .where("o_totalprice", PredicateOperator.GreaterThan, 500)
      .groupBy("c_mktsegment")
      .count("n_orders")
      .sum("o_totalprice", "sum_price")
      .average("o_totalprice", "avg_price")
      .execute(),
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
             ${P.dsum("o_totalprice")} AS sum_price,
             ${P.davg("o_totalprice")} AS avg_price
             FROM customer JOIN orders ON c_custkey = o_custkey
             WHERE c_acctbal > 0 AND o_totalprice > 500
             GROUP BY c_mktsegment"""))

  /** §2.1 row 12 — semi/anti join (EXISTS / NOT EXISTS). */
  val semiAnti: QueryDef = QueryDef(
    "q_semi_anti",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit(true).as("has_order"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit(false).as("has_order"))
      semi.unionAll(anti)
    },
    Some("""SELECT c_custkey, TRUE AS has_order FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            UNION ALL
            SELECT c_custkey, FALSE AS has_order FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  /** §2.1 row 13 — distinct: partial-distinct before the shuffle, so
    * only unique tuples move.
    */
  val distinctRows: QueryDef = QueryDef(
    "q_distinct",
    (s, dir) => t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_linenumber").distinct(),
    Some("SELECT DISTINCT l_returnflag, l_linestatus, l_linenumber FROM lineitem"))

  /** §2.1 row 14 — top-k: order-by + limit plans as
    * TakeOrderedAndProject — per-partition heaps, O(k) at the driver,
    * no global sort (the scale analog of BPlusTree.sortedScan + limit).
    */
  val topK: QueryDef = QueryDef(
    "q_topk",
    (s, dir) => t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice"),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""))

  /** RUNTIME BLOOM-FILTER JOIN PRUNING — the third join-reduction
    * tier after broadcast (row 6) and shuffle-hash (row 7): when the
    * dim side is too big to broadcast but its KEY SET fits a bloom
    * filter, fold the filtered dim keys into one kilobyte-scale
    * broadcast bloom ([[graft.functions.BloomAgg]]) and drop
    * non-matching fact rows MAP-SIDE, before they pay the shuffle.
    * The bloom has no false negatives and the exact join removes its
    * false positives, so the output is identical to the plain join —
    * exactly what the oracle asserts (it runs the unpruned SQL).
    * This is Spark's own `runtime.bloomFilter` rewrite made explicit
    * as an operator (and DataFusion/Trino's dynamic-filter pushdown).
    *
    * Scale shape: dim scans once to build the bloom (map-side
    * partial OR-merge, one filter crosses the wire per partition),
    * fact scans once with the probe fused into the scan filter; only
    * bloom survivors enter the shuffle-hash join. At a 10%-selective
    * dim this cuts the fact shuffle ~10×; the bloom stays ~16 KiB
    * regardless of corpus size.
    */
  val joinBloomPrune: QueryDef = QueryDef(
    "q_join_bloom_prune",
    (s, dir) => {
      val p = t(s, dir, "part").where(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_brand"))
      val bloom = broadcast(p.agg(
        graft.functions.Bloom.bloomAgg(col("p_partkey"), 1 << 17, 5).as("bf")))
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          Portable.revenueTerm(col("l_extendedprice"), col("l_discount"))
            .as("rev"))
      li.crossJoin(bloom)
        .where(graft.functions.Bloom.bloomContains(col("bf"), col("l_partkey")))
        .select(col("l_partkey"), col("rev"))
        .join(p.hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          sum(col("rev")).cast("double").as("revenue"))
    },
    Some(s"""SELECT p_brand, COUNT(*) AS n_items,
             ${P.revenueSum("l_extendedprice", "l_discount")} AS revenue
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE p_size <= 5 GROUP BY p_brand"""))

  /** SALTED equi-join — §2.1 row 29's skew mitigation served as a
    * catalog query (previously spec-only): the dim side replicates
    * into `saltFactor` salt copies and every fact row picks ONE salt
    * deterministically, so a hot key's rows spread over `saltFactor`
    * shuffle partitions instead of one straggler task. The output is
    * IDENTICAL to the plain join — each fact row still meets exactly
    * one dim copy — which is what the oracle runs. (AQE's skew split
    * handles the same problem reactively; salting is the
    * plan-deterministic form that also covers aggregate-after-join
    * skew AQE cannot re-split.)
    *
    * Scale shape: dim scans once and explodes ×8 (still dim-sized),
    * fact shuffles once on (key, salt); the hint pins the
    * shuffle-hash path so the salt actually reaches the exchange
    * instead of being folded into a broadcast.
    */
  val joinSalted: QueryDef = QueryDef(
    "q_join_salted",
    (s, dir) => SkewJoin.saltedEquiJoin(
        t(s, dir, "orders"), "o_custkey", "o_orderkey",
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
          .hint("shuffle_hash"),
        "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
          .as("value_cents")),
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
            CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
              AS value_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1"""))

  /** BUCKETED co-located join — the zero-shuffle join tier (§2.1 row
    * 25's bucketed-tables claim served as a catalog query): both
    * sides are written as 8-bucket sorted tables on the join key, so
    * the sort-merge join consumes the bucket layout directly — NO
    * exchange on either side at any scale (the spec asserts the
    * joined plan contains no Exchange). This is the physical design
    * that amortizes one write-time shuffle across every future join
    * on that key — the fact/fact answer when neither side broadcasts
    * and per-query shuffles are the dominant cost at 100 TB.
    * Table names carry the input fingerprint (the content-key
    * lesson), so a regenerated corpus can never serve stale buckets.
    */
  val joinBucketed: QueryDef = QueryDef(
    "q_join_bucketed",
    (s, dir) => {
      val fp = graft.sources.Snapshots.fileFingerprint(s"$dir/lineitem.parquet")
      val suffix = (dir + "_" + fp).replaceAll("[^A-Za-z0-9]", "_")
      // bucket METADATA lives in the session catalog, not the files: a
      // fresh session cannot adopt a previous JVM's warehouse dir (an
      // external re-register would silently lose the bucket spec and
      // with it the zero-exchange property), so a stale location is
      // deleted and rebuilt — content is fingerprint-keyed, so the
      // rebuild is always correct. The lock serializes two suites in
      // one JVM racing the same create.
      def ensure(name: String, df: DataFrame, key: String): DataFrame =
        Relational.bucketedLock.synchronized {
          if (!s.catalog.tableExists(name)) {
            val wh = s.conf.get("spark.sql.warehouse.dir")
              .stripPrefix("file:")
            // GC superseded fingerprints of THIS input dir first: drop
            // the stale catalog entries and sweep their warehouse dirs
            // (gcSiblingRoots' one-fingerprint-segment rule), so a
            // testdata regeneration REPLACES bucketed tables instead of
            // accreting one pair per fingerprint forever
            val cut = name.lastIndexOf('_')
            if (cut > 0) {
              val prefix = name.substring(0, cut + 1)
              // the sweep must only ever hit superseded FINGERPRINT
              // siblings: require the suffix to be exactly the 32-hex
              // md5 shape fileFingerprint produces, and skip temp views
              // (listTables returns them too) — a user temp view whose
              // name happens to share the prefix is not ours to drop
              val fpShape = "[a-f0-9]{32}".r
              s.catalog.listTables().collect()
                .filter(t => t.tableType != "TEMPORARY")
                .map(_.name)
                .filter(tn => tn.startsWith(prefix) && tn != name &&
                  fpShape.matches(tn.substring(prefix.length)))
                .foreach(tn => s.sql(s"DROP TABLE IF EXISTS `$tn`"))
            }
            graft.sources.Snapshots.gcSiblingRoots(s"$wh/$name")
            graft.sources.Snapshots.deleteRecursively(s"$wh/$name")
            df.write.mode("overwrite").bucketBy(8, key).sortBy(key)
              .saveAsTable(name)
          }
          s.table(name)
        }
      val lb = ensure(s"li_bkt_$suffix",
        t(s, dir, "lineitem").select(col("l_orderkey"),
          expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("cents")),
        "l_orderkey")
      val ob = ensure(s"ord_bkt_$suffix",
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        "o_orderkey")
      lb.hint("merge")
        .join(ob, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_cents"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
            CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS revenue_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1"""))

  val defs: Seq[QueryDef] = Seq(
    scanProject, wherePredicates, indexRangeScan, pointLookup, aggGlobal,
    groupByAgg, joinBroadcast, joinShuffleHash, joinSortMerge, joinTheta,
    multijoinOptimal, pipelineFull, semiAnti, distinctRows, topK,
    joinBloomPrune, joinSalted, joinBucketed)
}
