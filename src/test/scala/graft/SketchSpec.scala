package graft

import org.apache.spark.sql.functions._
import graft.functions.{QuantileSketch, Sketches}

/** The deterministic mergeable quantile sketch (TypedImperativeAggregate
  * tier): bucket math, accuracy bound, partitioning invariance, SQL
  * registration.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("bucket math: monotone, sign-mirrored, value within 1/128 relative") {
    val xs = Seq(-1e9, -1234.5, -1.0, -0.001, -0.0, 0.0, 1e-300, 0.25, 1.0,
      1.0000001, 7.5, 1234.5, 9.99e8)
    val ids = xs.map(QuantileSketch.bucketOf)
    assert(ids == ids.sorted, s"bucket ids must be monotone in the value: $ids")
    for (x <- xs if x != 0.0 && math.abs(x) > 1e-300) {
      val back = QuantileSketch.valueOf(QuantileSketch.bucketOf(x))
      assert(math.signum(back) == math.signum(x), s"sign lost for $x -> $back")
      val rel = math.abs(back - x) / math.abs(x)
      assert(rel <= 1.0 / 128 + 1e-12, s"$x -> $back rel err $rel")
      assert(math.abs(back) <= math.abs(x), s"bound must be nearest zero: $x -> $back")
    }
  }

  test("quantile estimates within 1/128 relative of the exact percentile") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    val got = li.agg(Sketches.quantileSketch(col("l_extendedprice"), qs).as("p"))
      .head().getSeq[Double](0)
    val exact = li.agg(expr(
      "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("e"))
      .head().getSeq[Double](0)
    got.lazyZip(exact).foreach { (g, e) =>
      // the exact percentile interpolates between neighbors, so allow
      // one bucket width on either side
      assert(math.abs(g - e) / e <= 2.0 / 128, s"sketch $g vs exact $e")
    }
  }

  test("sketch is partitioning-invariant (deterministic merges)") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_extendedprice", "l_returnflag")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(Sketches.quantileSketch(col("l_extendedprice"), Seq(0.1, 0.5, 0.9)).as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val a = run(li.repartition(1))
    val b = run(li.repartition(17, col("l_extendedprice")))
    val c = run(li.orderBy(col("l_extendedprice").desc))
    assert(a == b && b == c, s"partitioning changed the sketch: $a vs $b vs $c")
  }

  test("registered for SQL; null column and empty input handled") {
    Tables.load(spark, sfDir, "lineitem").createOrReplaceTempView("li_sk")
    val viaSql = spark.sql(
      """SELECT graft_quantile_sketch(l_extendedprice, array(0.5)) AS p
         FROM li_sk""").head().getSeq[Double](0)
    assert(viaSql.length == 1 && viaSql.head > 0)
    val empty = spark.sql(
      """SELECT graft_quantile_sketch(l_extendedprice, array(0.5)) AS p
         FROM li_sk WHERE l_extendedprice < -1""").head()
    assert(empty.isNullAt(0), "empty input must aggregate to null")
    val withNulls = Seq(Some(1.0), None, Some(3.0), None, Some(2.0))
      .toDF("x")
      .agg(Sketches.quantileSketch(col("x"), Seq(0.0, 1.0)).as("p"))
      .head().getSeq[Double](0)
    assert(withNulls.head <= 1.0 && withNulls.last >= 2.9, s"nulls must be skipped: $withNulls")
  }

  // ---- FreqSketch (Misra-Gries heavy hitters) ----

  private def freqMap(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(Sketches.freqSketch(col("t"), k).as("sk"))
      .selectExpr("explode(sk) AS e").select("e.term", "e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("freq sketch: exact recovery when k >= distinct items") {
    val df = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(5)("c")).toDF("t")
    val got = freqMap(df.repartition(5), 8)
    assert(got == Map("a" -> 40L, "b" -> 25L, "c" -> 5L), got.toString)
  }

  test("freq sketch guarantees hold under every partitioning, k < distinct") {
    // skewed stream: 2 true heavy hitters + a tail of 50 rare items
    val data = Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      (1 to 50).flatMap(i => Seq.fill(3)(s"tail$i"))
    val n = data.size.toLong
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 8
    for (reps <- Seq(1, 3, 17)) {
      val got = freqMap(data.toDF("t").repartition(reps), k)
      got.foreach { case (t, est) =>
        assert(est <= exact(t), s"overcounted $t: $est > ${exact(t)}")
        assert(exact(t) - est <= n / (k + 1), s"error bound broken for $t")
      }
      exact.foreach { case (t, c) =>
        if (c > n / (k + 1))
          assert(got.contains(t), s"guaranteed heavy hitter $t missing at reps=$reps")
      }
      assert(got.size <= k, s"summary exceeded k: ${got.size}")
    }
  }

  test("freq sketch registered for SQL; nulls skipped; empty input is empty array") {
    Tables.load(spark, sfDir, "documents").createOrReplaceTempView("docs_fs")
    // lang is skewed: 'en' holds ~39% of docs > N/(k+1), so the
    // theorem forces its presence (a UNIFORM column can legitimately
    // yield an empty MG summary — every insert cancels a decrement)
    val viaSql = spark.sql(
      "SELECT graft_freq_sketch(lang, 4) AS sk FROM docs_fs")
      .selectExpr("transform(sk, x -> x.term) AS terms").head().getSeq[String](0)
    assert(viaSql.contains("en") && viaSql.size <= 4, viaSql.toString)
    val withNulls = Seq(Some("x"), None, Some("x"), Some("y"), None).toDF("t")
      .agg(Sketches.freqSketch(col("t"), 4).as("sk"))
      .selectExpr("explode(sk) AS e").select("e.term", "e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(withNulls == Map("x" -> 2L, "y" -> 1L), withNulls.toString)
    val empty = spark.sql(
      "SELECT graft_freq_sketch(lang, 4) FROM docs_fs WHERE lang = 'nope'")
      .head().getSeq[Any](0)
    assert(empty.isEmpty, "empty input must yield an empty summary")
  }

  test("freq sketch survives terms past writeUTF's 64 KB modified-UTF-8 cap") {
    // a single unbroken >64 KB token (base64 blob, crawler URL) used
    // to crash buffer serialization with UTFDataFormatException; the
    // format is now length-prefixed raw UTF-8
    val giant = "x" * 70000
    val terms = (Seq.fill(5)(giant) ++ Seq.fill(3)("small")).toDF("t")
      .repartition(4) // force partial-buffer serialize + merge
      .agg(Sketches.freqSketch(col("t"), 4).as("sk"))
      .selectExpr("explode(sk) AS e").select("e.term", "e.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(terms.keySet.contains(giant), "giant term must survive the shuffle")
    assert(terms(giant) <= 5L && terms(giant) >= 5L - 8 / (4 + 1))
  }

  test("sketch SQL registrations reject wrong arity with a usable error") {
    Tables.load(spark, sfDir, "documents").createOrReplaceTempView("docs_ar")
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_freq_sketch(lang) FROM docs_ar").head())
    assert(e1.getMessage.contains("2 arguments"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_quantile_sketch(n_chars) FROM docs_ar").head())
    assert(e2.getMessage.contains("2 arguments"), e2.getMessage)
  }

  test("vector scatter aggregate equals brute force and is partitioning-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = 4
    val vecs = Seq(
      Array(1L, -2L, 3L, 0L), Array(5L, 5L, -1L, 2L),
      Array(0L, 0L, 0L, 0L), Array(-7L, 4L, 2L, 9L), Array(3L, 3L, 3L, 3L))
    def run(parts: Int): Array[Long] =
      vecs.toDF("q").repartition(parts)
        .agg(graft.functions.Sketches.vectorScatter(col("q"), dim).as("sc"))
        .head().getSeq[Long](0).toArray
    val a = run(1)
    assert(a.toSeq == run(8).toSeq, "merge order must not matter")
    // brute force: g row-major, sums, count
    val g = Array.ofDim[Long](dim * dim); val sums = new Array[Long](dim)
    vecs.foreach { v =>
      for (j <- 0 until dim; k <- 0 until dim) g(j * dim + k) += v(j) * v(k)
      for (j <- 0 until dim) sums(j) += v(j)
    }
    assert(a.toSeq == (g ++ sums ++ Array(vecs.length.toLong)).toSeq)
  }
}
