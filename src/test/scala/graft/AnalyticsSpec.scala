package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Similarity}
import graft.functions.{StatsQueries, TextFunctions}

/** Invariant checks for the round-8 analytics/eval operators:
  * conservation laws and cross-formulation equalities the DuckDB hash
  * oracle cannot express (it proves value parity, not internal
  * consistency under perturbation).
  */
class AnalyticsSpec extends SparkSpec {

  test("attribution conserves conversions: each model credits every purchase exactly once") {
    val rows = Events.attribution.fn(spark, sfDir).collect()
    val purchases = Events.loadEvents(spark, sfDir)
      .where(col("event_type") === "purchase").count()
    val byModel = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byModel.keySet == Set("first_touch", "last_touch"))
    assert(byModel.values.forall(_ == purchases),
      s"models must each credit all $purchases purchases: $byModel")
    val channels = rows.map(_.getString(1)).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")), channels.toString)
  }

  test("markov transitions conserve rows: sum of cells == events - active users") {
    val e = Events.loadEvents(spark, sfDir)
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    val cells = Events.markov.fn(spark, sfDir).collect()
    assert(cells.map(_.getLong(2)).sum == nEvents - nUsers)
    assert(cells.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 1000))
    // per-from probabilities floor-sum to within #cells of 1000
    cells.groupBy(_.getString(0)).foreach { case (from, cs) =>
      val p = cs.map(_.getLong(3)).sum
      assert(p > 1000 - cs.length && p <= 1000, s"$from rows sum to $p")
    }
  }

  test("MAD outliers match a brute-force reference per event type") {
    val got = Events.madOutliers.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val cents = Events.loadEvents(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    for ((t, xs) <- cents) {
      def lowerMedian(v: Array[Long]): Long = v((v.length + 1) / 2 - 1)
      val med = lowerMedian(xs)
      val devs = xs.map(x => math.abs(x - med)).sorted
      val mad = lowerMedian(devs)
      val out = devs.count(_ > 3 * mad)
      assert(got(t) == ((xs.length.toLong, med, mad, out.toLong)), s"$t: ${got(t)}")
    }
  }

  test("table checksum is invariant under repartitioning (order-independence)") {
    val h = "cast(conv(substr(md5(concat_ws('|', cast(doc_id as string), md5(text)," +
      " lang, source, cast(n_chars as string))), 1, 15), 16, 10) as bigint)"
    val d = Tables.load(spark, sfDir, "documents")
    def sum(df: org.apache.spark.sql.DataFrame) =
      df.select(expr(h).cast("decimal(38,0)").as("h")).agg(org.apache.spark.sql.functions.sum("h"))
        .head().getDecimal(0)
    assert(sum(d) == sum(d.repartition(7)) && sum(d) == sum(d.orderBy(col("text"))))
  }

  test("table checksum is additive: whole == sum of disjoint slices (incremental audit)") {
    // the property that lets a 100 TB validation checksum only CHANGED
    // partitions: checksum(T) = Σ checksum(slice_i) for any disjoint cover
    val h = "cast(conv(substr(md5(concat_ws('|', cast(doc_id as string), md5(text)," +
      " lang, source, cast(n_chars as string))), 1, 15), 16, 10) as bigint)"
    val d = Tables.load(spark, sfDir, "documents")
    def sum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.select(expr(h).cast("decimal(38,0)").as("h"))
        .agg(org.apache.spark.sql.functions.sum("h")).head().getDecimal(0)
    val whole = sum(d)
    val slices = Seq(
      d.where(col("doc_id") % 3 === 0), d.where(col("doc_id") % 3 === 1),
      d.where(col("doc_id") % 3 === 2))
    val parts = slices.map(sum).reduce(_ add _)
    assert(whole.compareTo(parts) == 0, s"$whole != $parts")
  }

  test("mutual components partition the corpus; mutual edges are symmetric subgraph") {
    val hist = Similarity.mutualComponents.fn(spark, sfDir).collect()
    val n = Tables.load(spark, sfDir, "embeddings").count()
    assert(hist.map(r => r.getLong(1) * r.getLong(0)).sum == n,
      "cluster sizes must sum to the corpus")
    val g = Similarity.knnGraphTable(spark, sfDir)
      .select("g_src", "g_dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = g.filter { case (a, b) => g.contains((b, a)) && a != b }
    assert(mutual.map(_.swap).subsetOf(mutual))
    assert(mutual.nonEmpty, "testdata should produce at least one mutual edge")
  }

  test("classifier lift deciles partition the corpus and capture sums to ~1000") {
    val rows = TextFunctions.classifierLift.fn(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 10L))
    val scored = Tables.load(spark, sfDir, "documents")
      .where(size(filter(split(lower(col("text")), " "), t => t =!= "")) > 0)
    assert(rows.map(_.getLong(1)).sum == scored.count())
    val capture = rows.map(_.getLong(4)).sum
    assert(capture > 1000 - rows.length && capture <= 1000, capture.toString)
  }

  test("quality ensemble: dropped docs carry a reason; dup groups keep exactly the min id") {
    val rows = TextFunctions.qualityEnsemble.fn(spark, sfDir).collect()
    rows.foreach { r =>
      val flags = (1 to 5).map(r.getBoolean)
      assert(r.getBoolean(6) == !flags.exists(identity),
        s"keep must be the negation of any-reason: $r")
    }
    // every md5-duplicate group marks all but its min doc_id dup_nonkeep
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val dupFlag = rows.map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    d.groupBy(_._2).values.filter(_.length > 1).foreach { grp =>
      val ids = grp.map(_._1).sorted
      assert(!dupFlag(ids.head) && ids.tail.forall(dupFlag), s"group $ids")
    }
  }

  test("A/B verdict agrees with the floating-point z-test on the same counts") {
    val r = Events.abTest.fn(spark, sfDir).head()
    val (na, xa, nb, xb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (p1, p2) = (xa.toDouble / na, xb.toDouble / nb)
    val p = (xa + xb).toDouble / (na + nb)
    // degenerate all-or-none corpus: zero pooled variance, z undefined
    val expected = p > 0 && p < 1 && {
      val z2 = math.pow(p1 - p2, 2) / (p * (1 - p) * (1.0 / na + 1.0 / nb))
      z2 >= 3.8416
    }
    assert(r.getBoolean(6) == expected,
      s"exact verdict ${r.getBoolean(6)} vs float expectation $expected")
  }

  test("readability orders sources sanely and stays within per-doc bounds") {
    val rows = StatsQueries.defs // touch object init orders
    val got = TextFunctions.readability.fn(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (avg, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo <= avg && avg <= hi, s"${r.getString(0)}: $lo <= $avg <= $hi")
      // Flesch fixed-point stays in a plausible band: > -200k, < 207k
      assert(hi <= 206835L && lo > -400000L)
    }
    assert(rows.nonEmpty)
  }
}
