package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY §2.2 rows 26–27).
  *
  * Portability trick for the DuckDB oracle: embeddings are quantized
  * to integers (floor(x*1000 + 0.5)) so dot products and norms are
  * exact integer arithmetic (order-independent), and the final cosine
  * is a single IEEE divide/sqrt on identical operands in both engines
  * → bit-equal similarity values, deterministic ranking.
  *
  * Scale design: the brute-force path broadcasts only the (small)
  * query set and streams the corpus — one pass, no corpus shuffle.
  * The LSH path uses 24 sign hyperplanes (Charikar 2002) arranged as
  * 3 OR-bands × 8 bits, mirroring the minhash Bands×Rows structure:
  * a candidate pair must agree on all 8 bits of at least one band.
  * Expected within-band pair work is ~N²/256 per band under a uniform
  * sign assumption (vs ~N²/64 for the previous single 6-bit bucket),
  * and — unlike a single wider bucket — recall degrades gracefully:
  * two 0.9-cosine vectors disagreeing on one plane of one band still
  * collide in another band. At 100× data, grow BitsPerBand with
  * log₂ N (smaller buckets) and add bands to hold recall; the shuffle
  * keys stay (band, bucket) pairs, never vectors², so the plan shape
  * is unchanged.
  */
object Similarity {

  /** Quantized integer vector: exact, engine-portable. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000 + 0.5).cast("long"))

  /** Exact integer dot product — native codegen'd expression; the
    * equivalent `aggregate(zip_with(...))` lambda form is interpreted
    * and was the scoring hot path of every ANN query.
    */
  def dotL(a: Column, b: Column): Column =
    graft.functions.Native.dotLong(a, b)

  /** Cosine from integer dot/norms — one IEEE divide, portable.
    *
    * The divisor is guarded with nullif: a zero-norm vector (all
    * |x_i| < 0.0005 quantize to 0) yields NULL, which sorts BELOW
    * every real similarity (Spark desc = nulls last) and fails every
    * `>= τ` predicate — so an unaudited zero vector drops out of
    * rankings instead of becoming the rank-1 neighbor of every query,
    * which is what the unguarded 0/0 = NaN did (NaN orders above all
    * reals in Spark). Production corpora should still filter such
    * vectors with the `s_embedding_audit` zero-vector count BEFORE
    * indexing; the testdata invariant (no zero-norm vectors at any SF)
    * is asserted in AnalyticsSpec, so the guard is dormant on the
    * oracle gate and parity is unaffected.
    */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") /
      sqrt(nullif(na.cast("double") * nb.cast("double"), lit(0.0)))

  private def quantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nrm", dotL(col("q"), col("q")))

  /** Spec-visible twin of [[quantized]]. */
  private[graft] def quantizedOf(e: DataFrame): DataFrame = quantized(e)

  /** §2.2 row 26 — brute-force cosine top-k (k=10) for query vectors
    * vec_id < 5, exact baseline with a SQL oracle.
    */
  val knnBruteForce: QueryDef = QueryDef(
    "s_knn_bruteforce",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val q = broadcast(v.where(col("vec_id") < 5)
        .toDF("q_id", "q_q", "q_nrm"))
      val scored = q.join(v.toDF("n_id", "n_q", "n_nrm"), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
        .select("q_id", "n_id", "sim")
    },
    Some("""WITH v AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
               FROM embeddings),
            n AS (SELECT vec_id, q,
                 CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
            p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                 CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
                 a.nrm AS na, b.nrm AS nb
               FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
            s AS (SELECT q_id, n_id,
                 CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
            SELECT q_id, n_id, sim FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM s)
            WHERE rn <= 10"""))

  // Deterministic random-hyperplane components: plane j, dim i →
  // ((i*(31+2j) + 17j) mod 13) - 6, a small signed integer. Public
  // LSH construction (Charikar 2002), derandomized so both engines /
  // reruns agree; evaluated natively in PlaneSignBitsUtil and mirrored
  // in bandBucketSql below.
  private val BandsV = 3
  private val BitsPerBand = 8

  /** XOR masks of the multi-probe set: self (0), every 1-bit flip,
    * every 2-bit flip — 37 per band. ONE definition feeds the served
    * query ([[knnLshMultiprobe]]), its recall eval
    * ([[annRecallMultiprobe]]), and both DuckDB oracles, so the
    * measured recall can never drift from the path it claims to grade.
    */
  private val MultiprobeFlips: Seq[Long] =
    0L +: ((0 until BitsPerBand).map(i => 1L << i) ++
      (for { i <- 0 until BitsPerBand; j <- (i + 1) until BitsPerBand }
        yield (1L << i) | (1L << j)))

  private def multiprobeCols(bucket: Column): Column =
    explode(array(MultiprobeFlips.map(f => bucket.bitwiseXOR(lit(f))): _*))

  private def multiprobeFlipsSql: String =
    MultiprobeFlips.map(f => s"xor(qb.bucket, $f)").mkString("[", ", ", "]")

  /** Per-band bucket ids: band b packs the sign bits of planes
    * b*BitsPerBand … b*BitsPerBand+BitsPerBand−1 into an 8-bit value.
    * All plane dots run in one native compiled pass
    * ([[graft.functions.Native.planeSignBits]]) — the lambda
    * (zip_with+aggregate) form re-walks the vector per plane through
    * interpreted HOF dispatch, ~5× slower at 24 planes.
    */
  def lshBandBuckets(q: Column): Column = lshBandBuckets(q, BitsPerBand)

  /** Parameterized band width — the kNN-GRAPH scale path (round-15:
    * tools/forget_budget_r15.md measured the fixed 8-bit space going
    * quadratic at the third corpus decade). All CATALOG queries and
    * their DuckDB oracles stay on the 8-bit default; only
    * corpus-sized graph builds pass a wider width.
    */
  def lshBandBuckets(q: Column, bits: Int): Column = {
    val sign = graft.functions.Native.planeSignBits(q, BandsV * bits)
    array((0 until BandsV).map(b =>
      shiftrightunsigned(sign, b * bits)
        .bitwiseAND(lit((1L << bits) - 1))): _*)
  }

  /** Corpus-adaptive bits per band for kNN-graph builds — the band
    * twin of IVF's ⌈√N⌉ cluster law ([[cCountOf]]): with a FIXED band
    * space, bucket occupancy grows linearly in N and candidate PAIRS
    * quadratically (measured: tools/forget_budget_r15.md — the
    * kNN-graph fold at 50k docs). Holding expected occupancy near a
    * target keeps total candidates O(N): bits = ⌈log₂(N / 64)⌉,
    * clamped to [[[BitsPerBand]], 20] (3 bands × 20 ≤ the 64-bit
    * plane-sign budget). The floor keeps EVERY catalog corpus
    * (≤ ~16k vectors) on exactly the 8-bit space the hash oracles
    * unroll, so parity is untouched; the scale path activates only
    * above it. Wider bands trade recall for cost exactly like
    * fewer-probe IVF — the graph stays a valid kNN-graph (candidates
    * are still all-band collisions), just sparser-candidate at huge N,
    * which is the standard LSH scaling (Indyk-Motwani: band width
    * grows with log N).
    */
  private[graft] def graphBitsFor(n: Long): Int = {
    val needed = math.ceil(
      math.log(math.max(1L, n).toDouble / 64.0) / math.log(2.0)).toInt
    math.min(20, math.max(BitsPerBand, needed))
  }

  /** (vec_id, band, bucket) — one row per band, the ANN shuffle key. */
  private def bandedVectors(v: DataFrame): DataFrame =
    v.select(col("vec_id"), posexplode(col("buckets"))).toDF("vec_id", "band", "bucket")

  /** DuckDB rendering of one band's bucket — the same plane arithmetic
    * on the quantized vector list, so the oracle covers the LSH path.
    */
  private def bandBucketSql(qcol: String, band: Int): String =
    (0 until BitsPerBand).map { i =>
      val j = band * BitsPerBand + i
      val dot = s"list_sum(list_transform(list_zip($qcol, range(0, 64)), " +
        s"s -> s[1] * ((((s[2] * ${31 + 2 * j}) + ${17 * j}) % 13) - 6)))"
      s"(CASE WHEN $dot >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  private def allBandsSql(qcol: String): String =
    (0 until BandsV).map(b => s"(${bandBucketSql(qcol, b)})").mkString("[", ", ", "]")

  private val quantizedSql =
    """v AS (SELECT vec_id,
       list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
       FROM embeddings)"""

  private val bandedSql =
    s"""n AS (SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       bb AS (SELECT vec_id, unnest(range(0, $BandsV)) AS band,
         unnest(${allBandsSql("q")}) AS bucket FROM n)"""

  /** §2.2 row 27 — LSH-banded ANN: candidates collide on all bits of
    * ≥1 band, cosine rerank, top-5 per query. Oracle reproduces the
    * band arithmetic in DuckDB list lambdas.
    */
  val knnLsh: QueryDef = QueryDef(
    "s_knn_lsh",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
        .withColumn("buckets", lshBandBuckets(col("q")))
      val bv = bandedVectors(v)
      val cand = bv.toDF("q_id", "band", "bucket").where(col("q_id") < 5)
        .join(bv.toDF("n_id", "band", "bucket"), Seq("band", "bucket"))
        .where(col("n_id") =!= col("q_id"))
        .select("q_id", "n_id").distinct()
      val scored = cand
        .join(v.select(col("vec_id").as("q_id"), col("q").as("q_q"), col("nrm").as("q_nrm")), Seq("q_id"))
        .join(v.select(col("vec_id").as("n_id"), col("q").as("n_q"), col("nrm").as("n_nrm")), Seq("n_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some(s"""WITH $quantizedSql, $bandedSql,
         cand AS (SELECT DISTINCT qb.vec_id AS q_id, nb.vec_id AS n_id
             FROM bb qb JOIN bb nb ON qb.band = nb.band AND qb.bucket = nb.bucket
             WHERE qb.vec_id < 5 AND nb.vec_id <> qb.vec_id),
         p AS (SELECT c.q_id, c.n_id,
              CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
              a.nrm AS na, b.nrm AS nb
            FROM cand c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.n_id),
         s AS (SELECT q_id, n_id,
              CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
         SELECT q_id, n_id, sim FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM s)
         WHERE rn <= 5"""))

  /** ANN RECALL evaluation — recall@5 of the banded-LSH serving path
    * against the exact brute-force ground truth, per query: the
    * standard accuracy audit run before trusting any approximate
    * index (purity and the confusion matrix grade the EMBEDDINGS;
    * this grades the INDEX). Both sides are deterministic (exact
    * integer cosine, tie-broken top-k), so the recall fractions are
    * oracle-exact — no sampling noise to wave at.
    *
    * Scale shape: ground truth is the brute pass over a bounded QUERY
    * SAMPLE (the broadcast shape of `s_knn_bruteforce` — an eval never
    * needs truth for the whole corpus); the LSH side is the serving
    * path under test; the comparison joins two ≤ sample×5 frames.
    */
  val annRecall: QueryDef = QueryDef(
    "s_knn_recall",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
        .withColumn("buckets", lshBandBuckets(col("q")))
        .localCheckpoint()
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      def top5(cand: DataFrame) = cand
        .join(v.select(col("vec_id").as("q_id"), col("q").as("q_q"),
          col("nrm").as("q_nrm")), Seq("q_id"))
        .join(v.select(col("vec_id").as("n_id"), col("q").as("n_q"),
          col("nrm").as("n_nrm")), Seq("n_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id")
      val bruteCand = v.where(col("vec_id") < 5).select(col("vec_id").as("q_id"))
        .crossJoin(v.select(col("vec_id").as("n_id")))
        .where(col("q_id") =!= col("n_id"))
      val bv = bandedVectors(v)
      val lshCand = bv.toDF("q_id", "band", "bucket").where(col("q_id") < 5)
        .join(bv.toDF("n_id", "band", "bucket"), Seq("band", "bucket"))
        .where(col("n_id") =!= col("q_id"))
        .select("q_id", "n_id").distinct()
      top5(bruteCand)
        .join(top5(lshCand).withColumn("hit", lit(1L)),
          Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_x1000", expr("(n_hit * 1000) div n_true"))
    },
    Some(s"""WITH $quantizedSql, $bandedSql,
         bfp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             a.nrm AS na, b.nrm AS nb
           FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         bfs AS (SELECT q_id, n_id,
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM bfp),
         bft AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
             FROM bfs) x WHERE rn <= 5),
         lc AS (SELECT DISTINCT qb.vec_id AS q_id, nb.vec_id AS n_id
             FROM bb qb JOIN bb nb ON qb.band = nb.band AND qb.bucket = nb.bucket
             WHERE qb.vec_id < 5 AND nb.vec_id <> qb.vec_id),
         lp AS (SELECT c.q_id, c.n_id,
             CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             a.nrm AS na, b.nrm AS nb
           FROM lc c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.n_id),
         ls AS (SELECT q_id, n_id,
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM lp),
         lst AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
             FROM ls) x WHERE rn <= 5),
         j AS (SELECT b.q_id, COUNT(*) AS n_true,
             CAST(SUM(CASE WHEN l.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
           FROM bft b LEFT JOIN lst l ON b.q_id = l.q_id AND b.n_id = l.n_id
           GROUP BY 1)
         SELECT q_id, n_true, n_hit,
           CAST((n_hit * 1000) // n_true AS BIGINT) AS recall_x1000 FROM j"""))

  /** Multi-probe LSH RECALL eval — recall@5 of the MULTI-PROBE LSH
    * serving path (`s_knn_lsh_multiprobe`: own bucket + every 1- and
    * 2-bit-flip neighbor per band, [[MultiprobeFlips]]) against exact
    * brute-force truth, the same harness as [[annRecall]]. Round-14
    * verdict item 4: the
    * single-probe tier measures ~0.08 recall@5 — its 3×8-bit bands
    * are tuned for near-dup detection (d_dedup_embedding), not top-k
    * retrieval — so the SERVED top-k path is the multi-probe form and
    * this query is the ladder row that proves (or indicts) it each
    * round. Probing grows the query fan-out 9× (tiny side); the
    * corpus index is untouched — recall bought without reshuffling
    * the corpus.
    */
  val annRecallMultiprobe: QueryDef = QueryDef(
    "s_knn_lsh_multiprobe_recall",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
        .withColumn("buckets", lshBandBuckets(col("q")))
        .localCheckpoint()
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      def top5(cand: DataFrame) = cand
        .join(v.select(col("vec_id").as("q_id"), col("q").as("q_q"),
          col("nrm").as("q_nrm")), Seq("q_id"))
        .join(v.select(col("vec_id").as("n_id"), col("q").as("n_q"),
          col("nrm").as("n_nrm")), Seq("n_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id")
      val bruteCand = v.where(col("vec_id") < 5).select(col("vec_id").as("q_id"))
        .crossJoin(v.select(col("vec_id").as("n_id")))
        .where(col("q_id") =!= col("n_id"))
      val bv = bandedVectors(v)
      val probes = bv.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("band"),
          multiprobeCols(col("bucket")).as("bucket"))
      val mpCand = probes
        .join(bv.toDF("n_id", "band", "bucket"), Seq("band", "bucket"))
        .where(col("n_id") =!= col("q_id"))
        .select("q_id", "n_id").distinct()
      top5(bruteCand)
        .join(top5(mpCand).withColumn("hit", lit(1L)),
          Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_x1000", expr("(n_hit * 1000) div n_true"))
    },
    Some {
      s"""WITH $quantizedSql, $bandedSql,
         bfp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             a.nrm AS na, b.nrm AS nb
           FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         bfs AS (SELECT q_id, n_id,
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM bfp),
         bft AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
             FROM bfs) x WHERE rn <= 5),
         probes AS (SELECT qb.vec_id AS q_id, qb.band,
             unnest($multiprobeFlipsSql) AS bucket
           FROM bb qb WHERE qb.vec_id < 5),
         lc AS (SELECT DISTINCT p.q_id, nb.vec_id AS n_id
             FROM probes p JOIN bb nb ON p.band = nb.band AND p.bucket = nb.bucket
             WHERE nb.vec_id <> p.q_id),
         lp AS (SELECT c.q_id, c.n_id,
             CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             a.nrm AS na, b.nrm AS nb
           FROM lc c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.n_id),
         ls AS (SELECT q_id, n_id,
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM lp),
         lst AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
             FROM ls) x WHERE rn <= 5),
         j AS (SELECT b.q_id, COUNT(*) AS n_true,
             CAST(SUM(CASE WHEN l.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
           FROM bft b LEFT JOIN lst l ON b.q_id = l.q_id AND b.n_id = l.n_id
           GROUP BY 1)
         SELECT q_id, n_true, n_hit,
           CAST((n_hit * 1000) // n_true AS BIGINT) AS recall_x1000 FROM j"""
    })

  /** MATRYOSHKA truncated-dimension eval — the storage-tiering
    * decision artifact for MRL-style embeddings (Kusupati et al. 2022):
    * serve ANN from the first 16 of 64 dimensions (4× less vector I/O,
    * 4× more vectors per broadcast/cache byte) and measure what it
    * costs: per query, recall@5 of truncated-cosine top-5 against
    * full-dimension truth. The same eval harness as `s_knn_recall`
    * with the candidate generator swapped for a dimension-sliced exact
    * scorer — so the recall number isolates the TRUNCATION loss, not
    * bucketing loss.
    *
    * Scale shape: both sides are bounded-query-sample brute passes
    * (broadcast of ≤5 query rows, one corpus scan each); the compare
    * joins two ≤ sample×5 frames. At 100 TB the truncated side is the
    * point: a 16-dim serving tier reads 1/4 the bytes of every list.
    */
  val truncatedRecall: QueryDef = QueryDef(
    "s_knn_truncated_recall",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val vf = quantized(e)
      val vt = e.select(col("vec_id"),
          quantize(slice(col("embedding"), 1, 16)).as("q"))
        .withColumn("nrm", dotL(col("q"), col("q")))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      def top5(v: DataFrame): DataFrame = {
        val q = broadcast(v.where(col("vec_id") < 5).toDF("q_id", "q_q", "q_nrm"))
        q.join(v.toDF("n_id", "n_q", "n_nrm"), col("n_id") =!= col("q_id"))
          .select(col("q_id"), col("n_id"),
            cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
          .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
          .select("q_id", "n_id")
      }
      top5(vf)
        .join(top5(vt).withColumn("hit", lit(1L)), Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_x1000", expr("(n_hit * 1000) div n_true"))
    },
    Some(s"""WITH $quantizedSql,
         n AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
         vt AS (SELECT vec_id,
             list_transform(embedding[1:16], x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
           FROM embeddings),
         nt AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM vt),
         fp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             a.nrm AS na, b.nrm AS nb
           FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         ft AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
               CAST(dot AS DOUBLE) / SQRT(NULLIF(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE), 0)) DESC NULLS LAST, n_id) AS rn
             FROM fp) x WHERE rn <= 5),
         tp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             a.nrm AS na, b.nrm AS nb
           FROM nt a JOIN nt b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         tt AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
               CAST(dot AS DOUBLE) / SQRT(NULLIF(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE), 0)) DESC NULLS LAST, n_id) AS rn
             FROM tp) x WHERE rn <= 5)
         SELECT f.q_id, COUNT(*) AS n_true,
           CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST((CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
             // COUNT(*) AS BIGINT) AS recall_x1000
         FROM ft f LEFT JOIN tt t ON f.q_id = t.q_id AND f.n_id = t.n_id
         GROUP BY 1"""))

  /** §2.2 row 25 — embedding-cosine near-duplicate detection: banded
    * LSH buckets → within-bucket pairs (any band) → top-20 most
    * similar pairs. Oracle shares the band arithmetic with the ANN
    * oracle.
    */
  /** Banded-LSH candidate pairs (a < b) colliding in ≥1 of the
    * [[BandsV]] 8-bit sign bands. Public so the scale-law test can
    * check the ~BandsV·C(N,2)/2^BitsPerBand expected count.
    */
  def lshCandidatePairs(embeddings: DataFrame): DataFrame =
    lshCandidatePairs(embeddings, BitsPerBand)

  def lshCandidatePairs(embeddings: DataFrame, bits: Int): DataFrame = {
    val bv = bandedVectors(quantized(embeddings)
      .withColumn("buckets", lshBandBuckets(col("q"), bits)))
    bv.toDF("a", "band", "bucket")
      .join(bv.toDF("b", "band", "bucket"), Seq("band", "bucket"))
      .where(col("a") < col("b")).select("a", "b").distinct()
  }

  val embeddingNearDup: QueryDef = QueryDef(
    "d_dedup_embedding",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val v = quantized(e)
      val cand = lshCandidatePairs(e)
      cand
        .join(v.select(col("vec_id").as("a"), col("q").as("q_a"), col("nrm").as("n_a")), Seq("a"))
        .join(v.select(col("vec_id").as("b"), col("q").as("q_b"), col("nrm").as("n_b")), Seq("b"))
        .select(col("a"), col("b"),
          cosine(dotL(col("q_a"), col("q_b")), col("n_a"), col("n_b")).as("sim"))
        .orderBy(col("sim").desc, col("a"), col("b"))
        .limit(20)
    },
    Some(s"""WITH $quantizedSql, $bandedSql,
         cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
             FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket
             WHERE l.vec_id < r.vec_id),
         p AS (SELECT c.a, c.b,
              CAST(list_sum(list_transform(list_zip(x.q, y.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
              x.nrm AS na, y.nrm AS nb
            FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b)
         SELECT a, b, CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim
         FROM p ORDER BY sim DESC, a, b LIMIT 20"""))

  /** §2.2 row 27d — all-pairs kNN JOIN: the top-k neighbor list for
    * EVERY vector (not just a query set) — the shape behind corpus-
    * wide diversity sampling and near-dup graph construction. Banded
    * LSH candidates (symmetrized) → exact cosine → per-vector top-3
    * via window, which plans as a two-phase WindowGroupLimit: each
    * partition keeps ≤k rows per vector BEFORE the shuffle, so the
    * exchange carries O(N·k), not the candidate set. ANN semantics:
    * vectors colliding in no band have no row — recall is tuned by
    * bands/bits, never by widening to N².
    */
  val knnJoin: QueryDef = QueryDef(
    "s_knn_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val v = quantized(e)
      val cand = lshCandidatePairs(e)
      val sym = cand.unionAll(cand.select(col("b").as("a"), col("a").as("b")))
      val scored = sym
        .join(v.select(col("vec_id").as("a"), col("q").as("q_a"), col("nrm").as("n_a")), Seq("a"))
        .join(v.select(col("vec_id").as("b"), col("q").as("q_b"), col("nrm").as("n_b")), Seq("b"))
        .select(col("a").as("q_id"), col("b").as("n_id"),
          cosine(dotL(col("q_a"), col("q_b")), col("n_a"), col("n_b")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
        .select("q_id", "n_id", "sim")
    },
    Some(s"""WITH $quantizedSql, $bandedSql,
         cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
             FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket
             WHERE l.vec_id <> r.vec_id),
         p AS (SELECT c.a AS q_id, c.b AS n_id,
              CAST(list_sum(list_transform(list_zip(x.q, y.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
              x.nrm AS na, y.nrm AS nb
            FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b),
         sc AS (SELECT q_id, n_id,
              CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
         SELECT q_id, n_id, sim FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM sc)
         WHERE rn <= 3"""))

  // ---- §2.2 row 27g: graph ANN — persisted kNN graph, hop + beam ----

  private val GraphK = 3     // graph out-degree
  private val BeamEf = 10    // beam pool width
  private val BeamRounds = 3 // bounded expansion rounds (oracle-unrolled)
  private val BeamMaxRounds = 10 // converge-mode cap (oracle-unrolled too)

  /** Score (lk, rk) id pairs by exact integer cosine against the
    * quantized corpus `v`.
    */
  private def scorePairs(v: DataFrame, pairs: DataFrame,
      lk: String, rk: String): DataFrame = pairs
    .join(v.select(col("vec_id").as(lk), col("q").as("q_l"), col("nrm").as("n_l")), Seq(lk))
    .join(v.select(col("vec_id").as(rk), col("q").as("q_r"), col("nrm").as("n_r")), Seq(rk))
    .select(col(lk), col(rk),
      cosine(dotL(col("q_l"), col("q_r")), col("n_l"), col("n_r")).as("sim"))

  /** Full kNN-graph build over an embeddings frame: LSH candidate
    * pairs symmetrized, exact-cosine scored, top-[[GraphK]] out-edges
    * per source — (g_src, g_dst, g_sim). Storing the edge score makes
    * [[graphAppendIncremental]] possible without re-scoring old edges.
    */
  private[graft] def buildGraph(embeddings: DataFrame): DataFrame =
    buildGraph(embeddings, BitsPerBand)

  private[graft] def buildGraph(embeddings: DataFrame, bits: Int): DataFrame = {
    val v = quantized(embeddings).localCheckpoint()
    val cand = lshCandidatePairs(embeddings, bits)
    val sym = cand.unionAll(cand.select(col("b").as("a"), col("a").as("b")))
    val wG = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
    scorePairs(v, sym, "a", "b")
      .withColumn("rn", row_number().over(wG)).where(col("rn") <= GraphK)
      .select(col("a").as("g_src"), col("b").as("g_dst"), col("sim").as("g_sim"))
  }

  /** INCREMENTAL graph maintenance under appends — the index twin of
    * `d_dedup_incremental`: fold a batch of NEW vectors into an
    * existing kNN graph withOUT rebuilding it. Only pairs with ≥ 1 new
    * side are banded and scored (new-new and new-old — old-old pairs
    * cannot have changed); sources that gained a candidate re-rank
    * their stored top-[[GraphK]] edges MERGED with the new edges, and
    * every other source's adjacency carries over untouched. Exactly
    * equivalent to a full rebuild: top-K(top-K(A) ∪ B) = top-K(A ∪ B)
    * — a displaced edge can only be displaced by a NEW candidate, and
    * a dropped old candidate could never re-enter. Hash-proven by
    * `s_knn_graph_incremental`, whose DuckDB oracle builds the graph
    * from the FULL corpus.
    *
    * Scale shape: cost is O(new-batch candidates + affected
    * adjacency), never O(corpus²); the affected set is bounded by the
    * new batch's collision fan-out.
    */
  def graphAppendIncremental(all: DataFrame, oldGraph: DataFrame,
      newIds: DataFrame, bandedIndex: Option[DataFrame] = None): DataFrame = {
    val v = quantized(all).localCheckpoint()
    // band rows are PER-VECTOR and append-only, so at scale the banded
    // index is a persisted artifact maintained batch-by-batch
    // ([[graphIngestBatch]]'s bands table — the Dedup band-index
    // pattern): folding a batch then bands ONLY the batch. The
    // recompute below is the self-contained fallback.
    val banded = bandedIndex.getOrElse(
      bandedVectors(v.withColumn("buckets", lshBandBuckets(col("q")))))
    val nb = banded.join(newIds.select(col("vec_id")), Seq("vec_id"), "left_semi")
    val candNew = nb.toDF("a", "band", "bucket")
      .join(banded.toDF("b", "band", "bucket"), Seq("band", "bucket"))
      .where(col("a") =!= col("b")).select("a", "b")
    val newPairs = candNew
      .unionAll(candNew.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val newEdges = scorePairs(v, newPairs, "a", "b").localCheckpoint()
    val affected = newEdges.select("a").distinct()
    val carried = oldGraph
      .join(affected, oldGraph("g_src") === affected("a"), "left_anti")
    val merged = oldGraph
      .join(affected, oldGraph("g_src") === affected("a"), "left_semi")
      .select(col("g_src").as("a"), col("g_dst").as("b"), col("g_sim").as("sim"))
      .unionAll(newEdges)
    val wG = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
    carried.unionByName(
      merged.withColumn("rn", row_number().over(wG)).where(col("rn") <= GraphK)
        .select(col("a").as("g_src"), col("b").as("g_dst"), col("sim").as("g_sim")))
  }

  /** EXACTLY-ONCE streaming maintenance of a persisted kNN graph —
    * the index twin of `Snapshots.ingestWithRollup`'s MV maintenance:
    * each micro-batch of vectors (1) appends to the versioned vector
    * table exactly-once, (2) folds into the current graph via
    * [[graphAppendIncremental]] (full [[buildGraph]] on bootstrap),
    * and (3) commits the updated graph as a new version carrying the
    * SAME (streamId, batchId) tag — so a replayed batch no-ops on
    * both tables and the graph is never more than one batch behind
    * the vectors. Readers (the hop/beam serving queries) pin a graph
    * version and are never torn.
    */
  def graphIngestBatch(batch: DataFrame, vecTable: String, graphTable: String,
      streamId: String, batchId: Long): Int = {
    import graft.sources.Snapshots
    val s = batch.sparkSession
    val vecV = Snapshots.ingestBatch(batch, vecTable, streamId, batchId)
    // the per-vector banded index appends exactly-once alongside the
    // vectors, so a fold never re-bands the corpus — each batch bands
    // only itself and the candidate join reads the accumulated index
    val bandsT = graphTable + "_bands"
    val bandsV = Snapshots.ingestBatch(
      bandedVectors(quantized(batch).withColumn("buckets", lshBandBuckets(col("q")))),
      bandsT, streamId, batchId)
    if (Snapshots.batchCommitted(graphTable, streamId, batchId))
      return Snapshots.committedVersion(graphTable, streamId, batchId)
        .getOrElse(Snapshots.currentVersion(graphTable))
    val all = Snapshots.readVersion(s, vecTable, vecV)
    val graph =
      if (Snapshots.currentVersion(graphTable) == 0) buildGraph(all)
      else graphAppendIncremental(all,
        Snapshots.read(s, graphTable), batch.select("vec_id"),
        bandedIndex = Some(Snapshots.readVersion(s, bandsT, bandsV)))
    Snapshots.commitBatchOverwrite(graph, graphTable, streamId, batchId)
  }

  /** Continuous form of [[graphIngestBatch]]: run a vector stream into
    * the versioned table with the graph maintained per micro-batch.
    */
  def graphIngestStream(stream: DataFrame, vecTable: String,
      graphTable: String, streamId: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graphIngestBatch(batch, vecTable, graphTable, streamId, batchId)
        ()
      }

  private val GraphThroughPrefix = "graph_through "

  private def graphBandsOf(vecs: DataFrame): DataFrame =
    graphBandsOf(vecs, BitsPerBand)

  private def graphBandsOf(vecs: DataFrame, bits: Int): DataFrame =
    bandedVectors(quantized(vecs).withColumn("buckets", lshBandBuckets(col("q"), bits)))

  /** Band width PINNED per bands-sidecar root (the frozen-quantizer
    * contract, band edition): the accumulated sidecar must be ONE
    * consistent band space across every fold, so the width derives
    * from the corpus ONCE at first build ([[graphBitsFor]]) and
    * persists at `<bandsT>/meta/graph.bits`; every later fold reads
    * the pin. Create-exclusive write, first-writer-wins under racing
    * bootstraps (both race the same corpus version's count; the
    * re-read settles either way).
    */
  private def pinnedGraphBits(bandsT: String, corpusCount: => Long): Int = {
    import java.nio.file.{Files, Paths}
    val f = Paths.get(bandsT, "meta", "graph.bits")
    if (!Files.exists(f)) {
      val b = graphBitsFor(corpusCount)
      Files.createDirectories(f.getParent)
      try Files.write(f, b.toString.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => }
    }
    new String(Files.readAllBytes(f), "UTF-8").trim.toInt
  }

  private def graphBandsNet(df: DataFrame): DataFrame =
    df.groupBy("vec_id", "band", "bucket")
      .agg(sum(col("sgn")).as("net")).where(col("net") > 0)
      .select("vec_id", "band", "bucket")

  private def graphNet(df: DataFrame): DataFrame =
    df.groupBy("g_src", "g_dst", "g_sim")
      .agg(sum(col("sgn")).as("net")).where(col("net") > 0)
      .select("g_src", "g_dst", "g_sim")

  /** DELETE-AWARE maintenance of the persisted kNN graph (and its
    * banded-vector sidecar) over a VERSIONED base table — the missing
    * direction next to [[graphAppendIncremental]]: a deleted vector
    * invalidates every adjacency list it appears in, and the
    * replacement edge (the old rank-K+1 candidate) is NOT in the
    * stored top-K — so affected sources are re-ranked from their LIVE
    * band-collision candidate set, which is exactly what a full
    * rebuild computes for them. One pass per base version:
    *
    *  1. the band sidecar folds signed per-vector rows (departed −1,
    *     inserted +1) — O(changed vectors);
    *  2. the recompute set = sources with an edge to a deleted vector
    *     ∪ sources colliding with an inserted vector ∪ the inserted
    *     vectors themselves, intersected with the live corpus —
    *     bounded by the change set's collision fan-out;
    *  3. those sources' CURRENT net adjacency (and every deleted
    *     source's) appends negated; their freshly re-ranked top-K
    *     (exact cosine over live band candidates) appends positive.
    *
    * Serving ([[serveKnnGraph]]) nets by (src, dst, sim) — sims are
    * exact-integer-derived, so an unchanged edge recomputed later is
    * bit-identical and nets correctly. Equivalence to a rebuild on the
    * live corpus: an untouched source has no inserted collider (its
    * candidate set only SHRANK by non-top-K members) and no deleted
    * top-K edge, so its stored adjacency already equals the rebuild's;
    * everything else is recomputed outright. Hash-proven by
    * `q_forget_capstone`, whose oracle builds the graph from the live
    * corpus. The one corpus-sized touch is the vector fetch for
    * scoring (a pruned point-join at scale); candidate generation and
    * adjacency rewrites stay O(changes).
    */
  def knnGraphMaintain(s: SparkSession, baseTable: String,
      bandsT: String, graphT: String,
      project: DataFrame => DataFrame = identity): Unit = {
    import graft.sources.Snapshots
    val curV = Snapshots.currentVersion(baseTable)
    require(curV > 0, s"base table $baseTable has no committed version")
    // corpus-adaptive band width, pinned to this root at first build
    // (8 bits at every catalog sf — wider only at corpus scale, where
    // the fixed space's quadratic candidate growth was measured:
    // tools/forget_budget_r15.md)
    val bits = pinnedGraphBits(bandsT,
      project(Snapshots.readVersion(s, baseTable, curV)).count())
    // TWO head-CAS folds (Snapshots.foldThrough), each table under its
    // own watermark: the band sidecar first, then the adjacency — the
    // graph delta reads the NET bands, which the completed first fold
    // (ours or a racing winner's) guarantees reflect ≥ curV. A racing
    // walk at a NEWER base version can advance the bands past curV
    // between the two folds; the adjacency still converges, because
    // any source whose candidate set differs between the two band
    // states collides with (or lost an edge to) that newer span's
    // change set, and the newer walk's own graph fold recomputes
    // exactly those sources from truly-live bands (asserted by the
    // composed-race specs in ForgetSpec).
    Snapshots.foldThrough(bandsT, GraphThroughPrefix, curV,
        recomputeWhen = lastV => !Snapshots.versionAvailable(baseTable, lastV))(
      graphBandsOf(project(Snapshots.readVersion(s, baseTable, curV)), bits)
        .withColumn("sgn", lit(1L))) { lastV =>
      val (ins0, del0) = Snapshots.changesBetween(s, baseTable, lastV, curV)
      graphBandsOf(project(ins0), bits).withColumn("sgn", lit(1L))
        .unionByName(graphBandsOf(project(del0), bits).withColumn("sgn", lit(-1L)))
    }
    Snapshots.foldThrough(graphT, GraphThroughPrefix, curV,
        recomputeWhen = lastV => !Snapshots.versionAvailable(baseTable, lastV))(
      buildGraph(project(Snapshots.readVersion(s, baseTable, curV)), bits)
        .withColumn("sgn", lit(1L))) { lastV =>
      val (ins0, del0) = Snapshots.changesBetween(s, baseTable, lastV, curV)
      val ins = project(ins0).localCheckpoint()
      val del = project(del0).localCheckpoint()
      val insBands = graphBandsOf(ins, bits).localCheckpoint()
      val liveBands = graphBandsNet(Snapshots.read(s, bandsT)).localCheckpoint()
      val deleted = del.select("vec_id").distinct()
      val inserted = ins.select("vec_id").distinct()
      val oldGraph = graphNet(Snapshots.read(s, graphT)).localCheckpoint()
      val affectedByDel = oldGraph
        .join(deleted, oldGraph("g_dst") === deleted("vec_id"), "left_semi")
        .select(col("g_src").as("vec_id"))
      val collideWithIns = liveBands.toDF("vec_id", "band", "bucket")
        .join(insBands.toDF("i_id", "band", "bucket"), Seq("band", "bucket"))
        .where(col("vec_id") =!= col("i_id")).select("vec_id")
      val liveIds = liveBands.select("vec_id").distinct()
      val recompute = affectedByDel.unionByName(collideWithIns)
        .unionByName(inserted).distinct()
        .join(liveIds, Seq("vec_id"), "left_semi")
        .localCheckpoint()
      // fresh top-K for the recompute set from LIVE band candidates
      val rb = liveBands.join(recompute, Seq("vec_id"), "left_semi")
      val cand = rb.toDF("a", "band", "bucket")
        .join(liveBands.toDF("b", "band", "bucket"), Seq("band", "bucket"))
        .where(col("a") =!= col("b")).select("a", "b").distinct()
      val vLive = quantized(project(Snapshots.readVersion(s, baseTable, curV)))
        .localCheckpoint()
      val wG = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
      val freshAdj = scorePairs(vLive, cand, "a", "b")
        .withColumn("rn", row_number().over(wG)).where(col("rn") <= GraphK)
        .select(col("a").as("g_src"), col("b").as("g_dst"), col("sim").as("g_sim"))
      val dropSrcs = recompute.unionByName(deleted).distinct()
      val negRows = oldGraph
        .join(dropSrcs, oldGraph("g_src") === dropSrcs("vec_id"), "left_semi")
        .withColumn("sgn", lit(-1L))
      negRows.unionByName(freshAdj.withColumn("sgn", lit(1L)))
    }
    // size-ratio compaction policy (serving invariant; sgn re-carried)
    Snapshots.maybeCompactNet(s, bandsT, GraphThroughPrefix)(df =>
      graphBandsNet(df).withColumn("sgn", lit(1L)))
    Snapshots.maybeCompactNet(s, graphT, GraphThroughPrefix)(df =>
      graphNet(df).withColumn("sgn", lit(1L)))
    ()
  }

  /** Net view of the tombstone-maintained kNN graph: the adjacency of
    * the live corpus under [[knnGraphMaintain]]'s fold — equals
    * [[buildGraph]] of the live base.
    */
  def serveKnnGraph(s: SparkSession, graphT: String): DataFrame =
    graft.sources.Snapshots.serveNetted(s, graphT)(graphNet)(
      _.select("g_src", "g_dst", "g_sim"))

  /** DuckDB CTE chain rebuilding the kNN-graph adjacency from a
    * restricted embeddings corpus — the live-corpus oracle of
    * [[knnGraphMaintain]] (CTE names prefixed `g` so the chain composes
    * with the IVF chain in one statement). `fromLiveVecs` is the FROM
    * clause supplying the live (vec_id, embedding) rows — a filtered
    * `embeddings` read, or a CTE carrying updated vectors; emits
    * `ggraph(g_src, g_dst)`.
    */
  private[graft] def graphLiveSqlCtes(fromLiveVecs: String): String =
    s"""gv AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
         $fromLiveVecs),
       gn AS (SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM gv),
       gbb AS (SELECT vec_id, unnest(range(0, $BandsV)) AS band,
         unnest(${allBandsSql("q")}) AS bucket FROM gn),
       gcand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
           FROM gbb l JOIN gbb r ON l.band = r.band AND l.bucket = r.bucket
           WHERE l.vec_id <> r.vec_id),
       ggsc AS (SELECT c.a, c.b,
            CAST(list_sum(list_transform(list_zip(x.q, y.q), s -> s[1]*s[2])) AS DOUBLE)
              / SQRT(CAST(x.nrm AS DOUBLE) * CAST(y.nrm AS DOUBLE)) AS sim
          FROM gcand c JOIN gn x ON x.vec_id = c.a JOIN gn y ON y.vec_id = c.b),
       ggraph AS (SELECT a AS g_src, b AS g_dst FROM (
           SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
           FROM ggsc) x WHERE rn <= $GraphK)"""

  /** DuckDB CTE chain re-deriving the FROZEN-quantizer IVF lists the
    * way [[ivfListsMaintain]] serves them after DML: the quantizer
    * (seed + one Lloyd round) trains on the FULL ORIGINAL corpus as of
    * the bootstrap fold; the lists assign only the LIVE rows under it.
    * `fromLiveVecs` is the FROM clause supplying the live
    * (vec_id, embedding) rows — a filtered `embeddings` read, or a CTE
    * carrying updated vectors. Emits `ia2(vec_id, nrm, cid)`. CTE
    * names prefixed `i`.
    */
  private[graft] def ivfLiveListsSqlCtes(fromLiveVecs: String): String = {
    val sqd = "list_sum(list_transform(list_zip(iv2.q, ic0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
    val met = "CAST(list_sum(list_transform(list_zip(inl.q, ic1.cs), " +
      "s -> (ic1.cn*s[1]-s[2])*(ic1.cn*s[1]-s[2]))) AS DOUBLE) / (ic1.cn*ic1.cn)"
    s"""iv AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
         FROM embeddings),
       iv2 AS (SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM iv),
       ivpc AS (SELECT CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS c FROM iv),
       ic0 AS (SELECT vec_id AS cid, q AS cq FROM iv WHERE vec_id < (SELECT c FROM ivpc)),
       ia1 AS (SELECT vec_id, q, cid FROM (
           SELECT iv2.vec_id, iv2.q, ic0.cid,
             ROW_NUMBER() OVER (PARTITION BY iv2.vec_id ORDER BY $sqd, ic0.cid) AS rn
           FROM iv2, ic0) x WHERE rn = 1),
       iex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM ia1),
       ic1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM iex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM ia1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       ilv AS (SELECT vec_id,
         list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
         $fromLiveVecs),
       inl AS (SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM ilv),
       ia2 AS (SELECT vec_id, nrm, cid FROM (
           SELECT inl.vec_id, inl.nrm, ic1.cid,
             ROW_NUMBER() OVER (PARTITION BY inl.vec_id ORDER BY $met, ic1.cid) AS rn
           FROM inl, ic1) x WHERE rn = 1)"""
  }

  /** The PERSISTED per-vector band index of an embeddings input —
    * (vec_id, band, bucket), committed once per input fingerprint like
    * the graph. Serving queries join their (tiny) query-side band rows
    * against this scan to seed candidate pools, so query time does NO
    * corpus banding and no corpus self-join: the one remaining corpus
    * touch is the exact-rerank vector lookup.
    */
  def knnBandsTable(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.sources.Snapshots
    val table = graft.Roots.scratch + "/knnbands/" + dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Snapshots.fileFingerprint(s"$dir/embeddings.parquet")
    val ver = Snapshots.ensureIndex(table, fp) { out =>
      Snapshots.writeStaged(
        bandedVectors(quantized(Tables.load(s, dir, "embeddings"))
          .withColumn("buckets", lshBandBuckets(col("q"))))
          .repartition(col("band"), col("bucket")), out)
    }
    s.read.parquet(Snapshots.versionDirs(table, ver): _*)
  }

  /** Seed pairs for a query set served from the PERSISTED band index:
    * band the (tiny) query side in-plan and join it against the index
    * scan — the same collision set the corpus self-join produces,
    * without touching the corpus at query time.
    */
  private def servedSeeds(s: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame): DataFrame = {
    val qb = bandedVectors(quantized(queries)
      .withColumn("buckets", lshBandBuckets(col("q"))))
    qb.toDF("q_id", "band", "bucket")
      .join(knnBandsTable(s, dir).toDF("n_id", "band", "bucket"),
        Seq("band", "bucket"))
      .where(col("n_id") =!= col("q_id"))
      .select("q_id", "n_id").distinct()
  }

  /** The PERSISTED kNN graph over an embeddings input
    * ([[buildGraph]]), committed once per input fingerprint through
    * [[graft.sources.Snapshots.ensureIndex]] (claim-elected single
    * builder, atomic tagged commit, content-keyed so regenerated data
    * rebuilds). Both the one-hop expansion (`s_knn_graph`) and the
    * beam search (`s_knn_beam`) SERVE hops from this table — the graph
    * is scanned from parquet, not rebuilt per query. Edges land
    * repartitioned by g_src: at scale every hop is an equi-join on the
    * edge partitioning key.
    */
  def knnGraphTable(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.sources.Snapshots
    val table = graft.Roots.scratch + "/knngraph/" + dir.replaceAll("[^A-Za-z0-9]", "_")
    val fp = Snapshots.fileFingerprint(s"$dir/embeddings.parquet")
    // corpus-adaptive band width (8 at every catalog sf — see
    // graphBitsFor); in the content key so a corpus crossing the
    // threshold rebuilds instead of serving the narrower space
    val bits = graphBitsFor(embeddingsCountCached(s, dir, fp))
    val ver = Snapshots.ensureIndex(table, s"${fp}_b$bits") { out =>
      Snapshots.writeStaged(buildGraph(Tables.load(s, dir, "embeddings"), bits)
        .repartition(col("g_src")), out)
    }
    s.read.parquet(Snapshots.versionDirs(table, ver): _*)
  }

  /** §2.2 row 27g — GRAPH-expanded ANN (the HNSW family's core move):
    * the persisted kNN graph ([[knnGraphTable]] — built once, served
    * from parquet like the IVF lists) becomes a serving structure. A
    * query's LSH band collisions seed the pool, ONE hop through the
    * graph adds the seeds' own top neighbors — neighbors-of-neighbors
    * are likely neighbors, so the hop recovers exactly the near-misses
    * banding drops — and the expanded pool is exact-reranked. The
    * ITERATED version with a frontier + visited set is `s_knn_beam`.
    *
    * Scale shape: the graph carries O(N·k) edges keyed by source; the
    * hop join shuffles seed-sized frames (queries × candidates), never
    * the corpus; the rerank pool is ≤ seeds · (1 + k).
    */
  val knnGraph: QueryDef = QueryDef(
    "s_knn_graph",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val v = quantized(e).localCheckpoint()
      val graph = knnGraphTable(s, dir)
      // seeds from the persisted band index — no corpus banding or
      // self-join at query time
      val seeds = servedSeeds(s, dir, e.where(col("vec_id") < 5))
      val hop = seeds.join(graph, col("n_id") === col("g_src"))
        .select(col("q_id"), col("g_dst").as("n_id"))
      val expanded = seeds.unionAll(hop)
        .where(col("n_id") =!= col("q_id")).distinct()
      val scored = scorePairs(v, expanded, "q_id", "n_id")
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some(graphServeOracle))

  /** Shared oracle of the one-hop graph serve: the graph is built from
    * the FULL corpus in SQL, so it covers both `s_knn_graph` (serving
    * the persisted full build) and `s_knn_graph_incremental` (serving
    * a graph folded incrementally — hash equality IS the proof that
    * incremental maintenance ≡ full rebuild). A def, not a val: the
    * QueryDefs above and below both capture it at object init.
    */
  /** The graph-rebuild CTE chain every graph-serving oracle opens
    * with: quantized corpus → banded candidates → exact-cosine scores
    * → top-[[GraphK]] adjacency as `graph(g_src, g_dst)`. A def for
    * the same init-order reason as [[graphServeOracle]].
    */
  private def graphSqlCtes: String =
    s"""$quantizedSql, $bandedSql,
         cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
             FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket
             WHERE l.vec_id <> r.vec_id),
         gsc AS (SELECT c.a, c.b,
              CAST(list_sum(list_transform(list_zip(x.q, y.q), s -> s[1]*s[2])) AS DOUBLE)
                / SQRT(CAST(x.nrm AS DOUBLE) * CAST(y.nrm AS DOUBLE)) AS sim
            FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b),
         graph AS (SELECT a AS g_src, b AS g_dst FROM (
             SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
             FROM gsc) x WHERE rn <= $GraphK)"""

  private def graphServeOracle: String =
    s"""WITH $graphSqlCtes,
         seeds AS (SELECT a AS q_id, b AS n_id FROM cand WHERE a < 5),
         hop AS (SELECT s.q_id, g.g_dst AS n_id
             FROM seeds s JOIN graph g ON s.n_id = g.g_src),
         ex AS (SELECT DISTINCT q_id, n_id FROM (
             SELECT q_id, n_id FROM seeds UNION ALL SELECT q_id, n_id FROM hop) u
           WHERE n_id <> q_id),
         p AS (SELECT e2.q_id, e2.n_id,
              CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
              a.nrm AS na, b.nrm AS nb
            FROM ex e2 JOIN n a ON a.vec_id = e2.q_id JOIN n b ON b.vec_id = e2.n_id),
         sc AS (SELECT q_id, n_id,
              CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
         SELECT q_id, n_id, sim FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM sc)
         WHERE rn <= 5"""

  /** §2.2 row 27g, INCREMENTAL MAINTENANCE — the serving proof of
    * [[graphAppendIncremental]]: the graph is built on 90% of the
    * corpus, the remaining batch folds in incrementally (only
    * new-sided pairs scored, only affected adjacency re-ranked), and
    * the SAME one-hop expansion as `s_knn_graph` serves from the
    * folded graph. The oracle builds its graph from the FULL corpus —
    * hash equality proves incremental ≡ full rebuild, the
    * `d_dedup_incremental` argument applied to the vector index.
    */
  val knnGraphIncremental: QueryDef = QueryDef(
    "s_knn_graph_incremental",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val v = quantized(e).localCheckpoint()
      val oldE = e.where(col("vec_id") % 10 =!= 9)
      val newIds = e.where(col("vec_id") % 10 === 9).select("vec_id")
      val graph = graphAppendIncremental(e, buildGraph(oldE), newIds)
        .localCheckpoint()
      val cand = lshCandidatePairs(e)
      val sym = cand.unionAll(cand.select(col("b").as("a"), col("a").as("b")))
      val seeds = sym.where(col("a") < 5)
        .select(col("a").as("q_id"), col("b").as("n_id"))
      val hop = seeds.join(graph, col("n_id") === col("g_src"))
        .select(col("q_id"), col("g_dst").as("n_id"))
      val expanded = seeds.unionAll(hop)
        .where(col("n_id") =!= col("q_id")).distinct()
      val scored = scorePairs(v, expanded, "q_id", "n_id")
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some(graphServeOracle))

  /** §2.2 row 27g, FULL BEAM SEARCH — the iterated expansion real
    * graph-ANN serving (HNSW/NSG family) runs, completing
    * `s_knn_graph`'s single hop: keep a per-query pool of the best
    * [[BeamEf]] candidates; each round, EXPAND the pool entries not
    * yet expanded (the frontier) by joining them against the persisted
    * kNN graph ([[knnGraphTable]] — scanned from parquet, shared with
    * the one-hop query), exact-score only the never-seen candidates
    * (the visited set), and re-rank the pool. Rounds are BOUNDED at
    * [[BeamRounds]] so the DuckDB oracle can unroll them exactly; a
    * round whose frontier is empty adds nothing in either engine, so
    * early convergence stays hash-identical.
    *
    * Scale shape: per round, the frontier is ≤ queries × BeamEf rows
    * (tiny — the graph-side join broadcast-shapes it), the graph scan
    * is pruned to frontier sources by the join, and scoring touches
    * only NEW candidates (≤ frontier × GraphK). The corpus is never
    * re-scanned after the seed round; pool and visited state stay
    * driver-free as checkpointed (q_id, n_id) frames.
    */
  /** The shared beam loop of [[knnBeam]] and [[beamUntilConverged]]:
    * `fixedRounds = Some(r)` unrolls exactly r rounds with NO
    * emptiness probes (the oracle-matched catalog shape — a round
    * whose frontier is empty adds nothing in either engine); `None`
    * iterates until every query's frontier is empty, capped at
    * `maxRounds` (the production serving shape — DuckDB cannot unroll
    * a data-dependent round count, so this mode has a recall/
    * termination PipelineSpec contract instead of an oracle).
    */
  private def beamSearch(s: SparkSession, dir: String,
      fixedRounds: Option[Int], maxRounds: Int = 10): DataFrame =
    beamSearchCounted(s, dir, fixedRounds, maxRounds)._1

  /** [[beamSearch]] also reporting the number of EXPANSION rounds
    * actually performed — the measured convergence depth that anchors
    * `s_knn_beam_converged`'s statically-unrolled oracle.
    */
  private[graft] def beamSearchCounted(s: SparkSession, dir: String,
      fixedRounds: Option[Int], maxRounds: Int = 10): (DataFrame, Int) = {
    val e = Tables.load(s, dir, "embeddings")
    val v = quantized(e).localCheckpoint()
    // NOT checkpointed: each round's hop re-reads the (tiny, pruned)
    // edge scan, keeping the persisted-graph lineage visible in the
    // final plan — asserted in PipelineSpec
    val graph = knnGraphTable(s, dir)
    // seeds from the persisted band index — no corpus banding or
    // self-join at query time
    val seeds = servedSeeds(s, dir, e.where(col("vec_id") < 5))
    val byQ = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    // every beam-state frame (pool, frontier, visited, new
    // candidates) is ≤ queries × BeamEf(×GraphK) rows, yet each
    // round's checkpoints would schedule session-width exchanges —
    // the same per-level latency tax the recursive CTE pays. Run the
    // loop NARROW and restore the session width for the final plan
    // (the q_recursive_cte A/B measured this trade; the frontier is
    // query-sized at ANY corpus scale, so narrow is always right
    // here — unlike the corpus-sized structures, which are all
    // behind the persisted graph/index scans)
    val oldWidth = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    var scored: DataFrame = null
    var expanded: DataFrame = null
    var expansions = 0
    try {
      // EVERY eager job after the narrow set() runs inside the try —
      // a failure here must not leave the session narrowed
      scored = scorePairs(v, seeds, "q_id", "n_id").localCheckpoint()
      val cap = fixedRounds.getOrElse(maxRounds)
      var r = 0
      var converged = false
      while (r < cap && !converged) {
        r += 1
        val pool = scored.withColumn("rn", row_number().over(byQ))
          .where(col("rn") <= BeamEf).select("q_id", "n_id")
        // the visited set stays LAZY — a union of already-
        // checkpointed frontiers — so each round materializes two
        // frames (frontier, scored), not three. Round 1 has no
        // visited set at all: the anti-join (and the former eager
        // empty-frame checkpoint job) is skipped outright (r16).
        val frontier = (if (expanded == null) pool
          else pool.join(expanded, Seq("q_id", "n_id"), "left_anti"))
          .localCheckpoint()
        // TERMINATION (converge mode): each round either expands ≥ 1
        // never-expanded pool entry (the visited set grows strictly,
        // bounded by queries × corpus) or the frontier is empty and
        // the pool is provably stable — checked on the checkpointed
        // frontier, one cheap metadata-sized action per round
        if (fixedRounds.isEmpty && frontier.isEmpty) converged = true
        else {
          expansions += 1
          expanded =
            if (expanded == null) frontier else expanded.unionAll(frontier)
          val hop = frontier.join(graph, col("n_id") === col("g_src"))
            .select(col("q_id"), col("g_dst").as("n_id"))
            .where(col("n_id") =!= col("q_id")).distinct()
          val fresh = hop.join(scored.select("q_id", "n_id"),
            Seq("q_id", "n_id"), "left_anti")
          val next = scored.unionAll(scorePairs(v, fresh, "q_id", "n_id"))
          // per-round checkpoints bound the iterated plan; the LAST
          // fixed round stays lineage-visible so the served graph scan
          // shows in the final plan (asserted in PipelineSpec)
          scored = if (fixedRounds.contains(r)) next else next.localCheckpoint()
        }
      }
    } finally s.conf.set("spark.sql.shuffle.partitions", oldWidth)
    (scored.withColumn("rn", row_number().over(byQ)).where(col("rn") <= 5)
      .select("q_id", "n_id", "sim"), expansions)
  }

  /** Convergence-run beam search — what production graph-ANN serving
    * actually iterates: rounds continue until the pool is STABLE (no
    * query has an unexpanded pool entry), capped at `maxRounds` as the
    * operational backstop. Recall is ≥ the bounded catalog twin's
    * (`s_knn_beam`) by pool monotonicity — extra rounds only ever add
    * candidates — and both properties are asserted in PipelineSpec.
    * ORACLED since round 8 (`s_knn_beam_converged`): the converged
    * result equals a fixed-[[BeamMaxRounds]] run in EVERY case — if
    * convergence ends at r < cap, rounds r+1..cap have empty frontiers
    * and no-op identically in both engines; if it hits the cap, both
    * engines perform exactly cap expansions — so DuckDB statically
    * unrolls the cap and the hash matches at any SF (measured depth:
    * 6/5/3 expansion rounds at sf0.001/0.01/0.1, tools/BeamConvergence).
    */
  def beamUntilConverged(s: SparkSession, dir: String,
      maxRounds: Int = BeamMaxRounds): DataFrame =
    beamSearch(s, dir, None, maxRounds)

  val knnBeam: QueryDef = QueryDef(
    "s_knn_beam",
    (s, dir) => beamSearch(s, dir, Some(BeamRounds)),
    Some(beamOracleSql(BeamRounds)))

  /** Catalog twin of [[beamUntilConverged]] — the data-dependent
    * convergence loop under the full hash oracle via the cap-unrolled
    * equivalence above.
    */
  val knnBeamConverged: QueryDef = QueryDef(
    "s_knn_beam_converged",
    (s, dir) => beamUntilConverged(s, dir),
    Some(beamOracleSql(BeamMaxRounds)))

  /** Statically-unrolled DuckDB twin of the beam loop at `rounds`
    * fixed expansion rounds (shared by `s_knn_beam` at [[BeamRounds]]
    * and `s_knn_beam_converged` at [[BeamMaxRounds]]).
    */
  private def beamOracleSql(rounds: Int): String = {
      def score(pairs: String) =
        s"""SELECT d.q_id, d.n_id,
            CAST(list_sum(list_transform(list_zip(a.q, b.q), z -> z[1]*z[2])) AS DOUBLE)
              / SQRT(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS sim
            FROM $pairs d JOIN n a ON a.vec_id = d.q_id JOIN n b ON b.vec_id = d.n_id"""
      // every per-round CTE is MATERIALIZED: the f-chain references
      // f_1..f_{r-1} per round (O(rounds²) references), and DuckDB's
      // default inlining would re-evaluate those subtrees — at the
      // 10-round converge unroll that exhausts file handles on the
      // repeatedly re-opened parquet scan
      def round(r: Int): String = {
        val prev = s"sc${r - 1}"
        val expandedSoFar =
          (1 until r).map(i => s"SELECT q_id, n_id FROM f$i").mkString(" UNION ALL ")
        val fDef =
          if (r == 1) "f1 AS MATERIALIZED (SELECT q_id, n_id FROM p0)"
          else s"f$r AS MATERIALIZED (SELECT q_id, n_id FROM p${r - 1} EXCEPT ($expandedSoFar))"
        s"""p${r - 1} AS MATERIALIZED (SELECT q_id, n_id FROM (
              SELECT q_id, n_id,
                ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
              FROM $prev) x WHERE rn <= $BeamEf),
            $fDef,
            nw$r AS MATERIALIZED (SELECT q_id, n_id FROM (
                SELECT DISTINCT f.q_id, g.g_dst AS n_id
                FROM f$r f JOIN graph g ON f.n_id = g.g_src
                WHERE g.g_dst <> f.q_id) h
              EXCEPT SELECT q_id, n_id FROM $prev),
            sc$r AS MATERIALIZED (SELECT * FROM $prev UNION ALL ${score(s"nw$r")})"""
      }
      s"""WITH $quantizedSql, $bandedSql,
       cand AS MATERIALIZED (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
           FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket
           WHERE l.vec_id <> r.vec_id),
       gsc AS (SELECT c.a, c.b,
            CAST(list_sum(list_transform(list_zip(x.q, y.q), s -> s[1]*s[2])) AS DOUBLE)
              / SQRT(CAST(x.nrm AS DOUBLE) * CAST(y.nrm AS DOUBLE)) AS sim
          FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b),
       graph AS MATERIALIZED (SELECT a AS g_src, b AS g_dst FROM (
           SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
           FROM gsc) x WHERE rn <= $GraphK),
       seeds AS (SELECT DISTINCT a AS q_id, b AS n_id FROM cand
           WHERE a < 5 AND b <> a),
       sc0 AS MATERIALIZED (${score("seeds")}),
       ${(1 to rounds).map(round).mkString(",\n")}
       SELECT q_id, n_id, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
         FROM sc$rounds) WHERE rn <= 5"""
  }

  /** §2.2 row 27c — multi-probe LSH ANN: queries probe their own
    * bucket AND every 1- and 2-bit-flip neighbor in each band
    * (1 + 8 + 28 = 37 probes per band; widened from 1-bit in round 15
    * — the measured 1-bit recall@5 was 0.44, under the 0.5 serving
    * bar, and 2-bit probing is the standard next rung: Lv et al.
    * 2007, multi-probe LSH). The near-miss case banding alone drops —
    * a high-cosine neighbor disagreeing on a plane or two per band —
    * is recovered at the cost of expanding only the (tiny) query side
    * 37×; the corpus index is untouched and still shuffles once by
    * (band, bucket). This is how recall scales WITHOUT adding bands:
    * probes grow the query fan-out (cheap), bands grow the corpus
    * index (expensive). [[annRecallMultiprobe]] measures this path's
    * recall every round.
    */
  val knnLshMultiprobe: QueryDef = QueryDef(
    "s_knn_lsh_multiprobe",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
        .withColumn("buckets", lshBandBuckets(col("q")))
      val bv = bandedVectors(v)
      val probes = bv.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("band"),
          multiprobeCols(col("bucket")).as("bucket"))
      val cand = probes
        .join(bv.toDF("n_id", "band", "bucket"), Seq("band", "bucket"))
        .where(col("n_id") =!= col("q_id"))
        .select("q_id", "n_id").distinct()
      val scored = cand
        .join(v.select(col("vec_id").as("q_id"), col("q").as("q_q"), col("nrm").as("q_nrm")), Seq("q_id"))
        .join(v.select(col("vec_id").as("n_id"), col("q").as("n_q"), col("nrm").as("n_nrm")), Seq("n_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some {
      s"""WITH $quantizedSql, $bandedSql,
       probes AS (SELECT qb.vec_id AS q_id, qb.band,
           unnest($multiprobeFlipsSql) AS bucket
         FROM bb qb WHERE qb.vec_id < 5),
       cand AS (SELECT DISTINCT p.q_id, nb.vec_id AS n_id
           FROM probes p JOIN bb nb ON p.band = nb.band AND p.bucket = nb.bucket
           WHERE nb.vec_id <> p.q_id),
       p AS (SELECT c.q_id, c.n_id,
            CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
            a.nrm AS na, b.nrm AS nb
          FROM cand c JOIN n a ON a.vec_id = c.q_id JOIN n b ON b.vec_id = c.n_id),
       sc AS (SELECT q_id, n_id,
            CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
       SELECT q_id, n_id, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM sc)
       WHERE rn <= 5"""
    })

  // ---- §2.2 row 27b: IVF ANN (second scale path next to banded LSH) ----

  /** Coarse-quantizer cluster count: C = ⌈√N⌉ of the indexed corpus —
    * the standard IVF setting (and the same growth law
    * `d_dedup_semantic` uses): lists stay ≈√N-sized as the corpus
    * grows, so a probe reads NProbe·√N vectors instead of a fixed
    * NProbe/16 FRACTION of the corpus (which a constant C decays to).
    * Deterministic from the data, so the DuckDB oracles compute the
    * identical C from COUNT(*) (`ivpcSql`).
    */
  private[graft] def cCountOf(n: Long): Int =
    math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt

  /** Corpus row count keyed by the embeddings FILE FINGERPRINT — the
    * count feeds C into the IVF/IVF+PQ content keys on EVERY serve, so
    * uncached it costs one Spark job per serve (round-9 IvfAb: 0.15 s
    * of the ~1.0 s warm s_knn_ivf, the round-8 serve regression).
    * Keying the cache by fingerprint keeps it regeneration-safe: new
    * data → new fingerprint → recount; a stale count can never key an
    * index the oracle would derive a different C for.
    */
  private val corpusCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def embeddingsCountCached(s: SparkSession, dir: String, fp: String): Long =
    corpusCountCache.computeIfAbsent(fp,
      _ => Tables.load(s, dir, "embeddings").count())

  /** DuckDB twin of [[cCountOf]] over the quantized CTE `v`. */
  private val ivpcSql =
    "ivpc AS (SELECT CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS c FROM v)"

  private val NProbe = 2

  /** §2.2 row 27b — IVF ANN: deterministic seed centroids (the first
    * ⌈√N⌉ vectors) + ONE Lloyd step in exact integer arithmetic,
    * corpus partitioned into inverted lists by nearest centroid,
    * queries probe the NProbe nearest lists and rerank by exact
    * cosine.
    *
    * Portability: assignment 1 is integer L2 (exact); the Lloyd
    * update keeps centroids as (component-sum vector, count) — never
    * dividing — and assignment 2 compares Σ(n·x − s)² / n², whose
    * numerator is an exact ≤2^53 integer, so the IEEE divide is
    * bit-identical in DuckDB. Ties always break by centroid id.
    *
    * Scale: centroids are a broadcast of C rows; the corpus is
    * touched in full passes only (assign ×2), shuffles only C×dims
    * partial sums for the update, and the probe join shuffles by
    * centroid id — queries read NProbe/C of the corpus. At 100 TB,
    * grow C with √N, run more Lloyd rounds offline, and persist the
    * inverted lists partitioned by cid so probes prune at the scan.
    */
  /** Build-or-serve the persisted IVF index over `dir`'s embeddings:
    * (broadcast centroids, lists table, lists version). The index is
    * physical design, built AT MOST ONCE per input fingerprint and
    * SERVED from disk: inverted lists land as parquet partitioned by
    * centroid id, so a probe reads only its cid= directories
    * (partition pruning at the scan — the IVF analog of the z-order
    * secondary path). Builds go through Snapshots.ensureIndex: a
    * claim-elected single builder, an ATOMIC tagged commit (no torn
    * index is ever visible), and a content key that rebuilds when the
    * input data is regenerated. Shared by [[knnIvf]], [[ivfTopK]] (the
    * hybrid-retrieval vector side), and the IVF+PQ serving path.
    */
  private[graft] def ivfIndex(s: SparkSession, dir: String): (DataFrame, String, Int) = {
    import graft.sources.Snapshots
    val base = graft.Roots.scratch + "/ivf/" + dir.replaceAll("[^A-Za-z0-9]", "_")
    val (listsT, centsT) = (s"$base/lists", s"$base/centroids")
    // the content key carries the cluster count next to the input
    // fingerprint (the bloomSkipIndex convention): an index built
    // under a different C — data regenerated at another size, or the
    // growth law itself revised — can never be served against an
    // oracle that derives a different C from the same data
    val fpBase = Snapshots.fileFingerprint(s"$dir/embeddings.parquet")
    val c = cCountOf(embeddingsCountCached(s, dir, fpBase))
    val fp = fpBase + s"-c$c"
    val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
    val centsV = Snapshots.ensureIndex(centsT, fp) { out =>
      val v = quantized(Tables.load(s, dir, "embeddings")).localCheckpoint()
      val seeds = broadcast(v.where(col("vec_id") < c)
        .select(col("vec_id").as("cid"), col("q").as("cq")))
      // assignment 1: nearest seed by exact integer squared L2
      val a1 = v.repartition(col("vec_id")).crossJoin(seeds)
        .select(col("vec_id"), col("q"), col("nrm"), col("cid"),
          graft.functions.Native.sqDistScaled(col("q"), col("cq"), lit(1L))
            .cast("double").as("m"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") === 1)
        .select("vec_id", "q", "nrm", "cid")
      // Lloyd update, exact integers: component sums + member count
      val sums = a1.select(col("cid"), posexplode(col("q"))).toDF("cid", "dim", "v")
        .groupBy("cid", "dim").agg(sum(col("v")).as("sv"))
        .groupBy("cid").agg(transform(
          array_sort(collect_list(struct(col("dim"), col("sv")))),
          x => x.getField("sv")).as("cs"))
      Snapshots.writeStaged(
        sums.join(a1.groupBy("cid").agg(count(lit(1)).as("cn")), "cid"), out)
    }
    val cents = broadcast(s.read.parquet(Snapshots.versionDirs(centsT, centsV): _*))
    val listsV = Snapshots.ensureIndex(listsT, fp) { out =>
      // assignment 2: inverted lists under the committed centroids
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val a2 = v.repartition(col("vec_id")).crossJoin(cents)
        .select(col("vec_id"), col("q"), col("nrm"), col("cid"),
          (graft.functions.Native.sqDistScaled(col("q"), col("cs"), col("cn"))
            .cast("double") / (col("cn") * col("cn")).cast("double")).as("m"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") === 1)
        .select("vec_id", "q", "nrm", "cid")
      graft.sources.Sources.writePartitioned(a2, out, "cid")
    }
    (cents, listsT, listsV)
  }

  /** The exact-integer centroid metric both assignment and probing
    * rank by: Σ(cn·x − cs)² / cn² — numerator exact ≤2^53, IEEE divide
    * bit-identical in DuckDB.
    */
  private def ivfMetric: Column =
    graft.functions.Native.sqDistScaled(col("q"), col("cs"), col("cn"))
      .cast("double") / (col("cn") * col("cn")).cast("double")

  val knnIvf: QueryDef = QueryDef(
    "s_knn_ivf",
    (s, dir) => {
      import graft.sources.Snapshots
      val (cents, listsT, listsV) = ivfIndex(s, dir)
      val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
      def metric: Column = ivfMetric
      // queries probe the NProbe nearest lists …
      val queries = quantized(Tables.load(s, dir, "embeddings"))
        .where(col("vec_id") < 5)
      val probes = queries.crossJoin(cents)
        .select(col("vec_id"), col("q"), col("nrm"), col("cid"), metric.as("m"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") <= NProbe)
        .select(col("vec_id").as("q_id"), col("q").as("q_q"),
          col("nrm").as("q_nrm"), col("cid"))
      // … fetched as literal cids (≤ queries × NProbe values, bounded
      // by C — a legitimate driver fetch) so the list scan PRUNES to
      // exactly the probed partitions instead of reading the corpus
      val probeCids = probes.select("cid").distinct().collect().map(_.getLong(0))
      val lists = s.read.parquet(Snapshots.versionDirs(listsT, listsV): _*)
        .where(col("cid").isin(probeCids: _*))
        .select(col("vec_id").as("n_id"), col("q").as("n_q"),
          col("nrm").as("n_nrm"), col("cid").cast("long").as("cid"))
      val scored = broadcast(probes).join(lists, Seq("cid"))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some(s"""WITH $ivfServeCtes
       SELECT q_id, n_id, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM sc)
       WHERE rn <= 5"""))

  /** The full IVF-serving CTE chain (quantize → seed/Lloyd centroids →
    * inverted lists → probe → score as `sc(q_id, n_id, sim)`) — shared
    * by the `s_knn_ivf` oracle and the routed `s_knn_routed` oracle's
    * large-corpus branch. A def for init-order.
    */
  private def ivfServeCtes: String = {
    val sqd = "list_sum(list_transform(list_zip(n.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
    val met = "CAST(list_sum(list_transform(list_zip(n.q, c1.cs), " +
      "s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
    s"""$quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       $ivpcSql,
       c0 AS (SELECT vec_id AS cid, q AS cq FROM v WHERE vec_id < (SELECT c FROM ivpc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM n, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       a2 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1) x WHERE rn = 1),
       pr AS (SELECT vec_id AS q_id, q AS q_q, nrm AS q_nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1 WHERE n.vec_id < 5) x WHERE rn <= $NProbe),
       p AS (SELECT pr.q_id, a2.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(pr.q_q, a2.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             pr.q_nrm AS na, a2.nrm AS nb
           FROM pr JOIN a2 ON pr.cid = a2.cid AND a2.vec_id <> pr.q_id),
       sc AS (SELECT q_id, n_id,
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)"""
  }

  /** IVF nprobe TUNING SWEEP — the recall/cost curve an operator reads
    * before fixing the serving nprobe: for nprobe ∈ {1, 2, 4}, each
    * query's candidate count (cost: how much of the corpus the probe
    * actually scanned) and recall@5 against exact brute-force truth.
    * This is the artifact that justifies the production NProbe choice
    * with data instead of folklore; every number is deterministic
    * (exact integer metrics, tie-broken ranks), so the whole curve is
    * oracle-checked.
    *
    * Scale shape: ONE probe ranking at the max nprobe, reused by every
    * sweep point (filter on rank, not re-rank); lists are read once
    * with literal-cid partition pruning; truth is the bounded
    * query-sample brute pass; everything downstream joins ≤ sample×5
    * frames. The sweep costs one probe pass + |sweep| cheap rerank
    * passes over the SAME pruned candidate frame.
    */
  val ivfSweep: QueryDef = QueryDef(
    "s_knn_ivf_sweep",
    (s, dir) => {
      import graft.sources.Snapshots
      val (cents, listsT, listsV) = ivfIndex(s, dir)
      val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
      val v = quantized(Tables.load(s, dir, "embeddings")).localCheckpoint()
      val queries = v.where(col("vec_id") < 5)
      val probes = queries.crossJoin(cents)
        .select(col("vec_id"), col("q"), col("nrm"), col("cid"), ivfMetric.as("m"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") <= 4)
        .select(col("vec_id").as("q_id"), col("q").as("q_q"),
          col("nrm").as("q_nrm"), col("cid"), col("rn").cast("long").as("prn"))
        .localCheckpoint()
      val probeCids = probes.select("cid").distinct().collect().map(_.getLong(0))
      val lists = s.read.parquet(Snapshots.versionDirs(listsT, listsV): _*)
        .where(col("cid").isin(probeCids: _*))
        .select(col("vec_id").as("n_id"), col("q").as("n_q"),
          col("nrm").as("n_nrm"), col("cid").cast("long").as("cid"))
      val w5 = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val truth = queries.select(col("vec_id").as("q_id"), col("q").as("q_q"),
          col("nrm").as("q_nrm"))
        .crossJoin(v.select(col("vec_id").as("n_id"), col("q").as("n_q"),
          col("nrm").as("n_nrm")))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(w5)).where(col("rn") <= 5)
        .select("q_id", "n_id").localCheckpoint()
      Seq(1L, 2L, 4L).map { np =>
        val cand = broadcast(probes.where(col("prn") <= np))
          .join(lists, Seq("cid"))
          .where(col("n_id") =!= col("q_id"))
        val nCand = cand.groupBy("q_id").agg(count(lit(1)).as("n_cand"))
        val top = cand.select(col("q_id"), col("n_id"),
            cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
          .withColumn("rn", row_number().over(w5)).where(col("rn") <= 5)
          .select("q_id", "n_id")
        truth.join(top.withColumn("hit", lit(1L)), Seq("q_id", "n_id"), "left")
          .groupBy("q_id")
          .agg(count(lit(1)).as("n_true"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .join(nCand, Seq("q_id"), "left")
          .select(lit(np).as("nprobe"), col("q_id"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"), col("n_hit"),
            expr("(n_hit * 1000) div n_true").as("recall_x1000"))
      }.reduce(_ unionAll _)
    },
    Some {
      val sqd = "list_sum(list_transform(list_zip(n.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
      val met = "CAST(list_sum(list_transform(list_zip(n.q, c1.cs), " +
        "s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
      def block(np: Int): String =
        s"""cand$np AS (SELECT pr.q_id, a2.vec_id AS n_id, pr.q_q, pr.q_nrm,
               a2.q AS n_q, a2.nrm AS n_nrm
             FROM pra pr JOIN a2 ON pr.cid = a2.cid AND a2.vec_id <> pr.q_id
             WHERE pr.prn <= $np),
           nc$np AS (SELECT q_id, COUNT(*) AS n_cand FROM cand$np GROUP BY 1),
           top$np AS (SELECT q_id, n_id FROM (
               SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                 CAST(list_sum(list_transform(list_zip(q_q, n_q), s -> s[1]*s[2])) AS DOUBLE)
                   / SQRT(CAST(q_nrm AS DOUBLE) * CAST(n_nrm AS DOUBLE)) DESC, n_id) AS rn
               FROM cand$np) x WHERE rn <= 5),
           j$np AS (SELECT b.q_id, COUNT(*) AS n_true,
               CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
             FROM bft b LEFT JOIN top$np t ON b.q_id = t.q_id AND b.n_id = t.n_id
             GROUP BY 1),
           r$np AS (SELECT CAST($np AS BIGINT) AS nprobe, j.q_id,
               CAST(COALESCE(nc.n_cand, 0) AS BIGINT) AS n_cand, j.n_hit,
               CAST((j.n_hit * 1000) // j.n_true AS BIGINT) AS recall_x1000
             FROM j$np j LEFT JOIN nc$np nc ON j.q_id = nc.q_id)"""
      s"""WITH $quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       $ivpcSql,
       c0 AS (SELECT vec_id AS cid, q AS cq FROM v WHERE vec_id < (SELECT c FROM ivpc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM n, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       a2 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1) x WHERE rn = 1),
       pra AS (SELECT vec_id AS q_id, q AS q_q, nrm AS q_nrm, cid,
           CAST(rn AS BIGINT) AS prn FROM (
           SELECT n.vec_id, n.q, n.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1 WHERE n.vec_id < 5) x WHERE rn <= 4),
       bfp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
           a.nrm AS na, b.nrm AS nb
         FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
       bft AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) DESC, n_id) AS rn
           FROM bfp) x WHERE rn <= 5),
       ${Seq(1, 2, 4).map(block).mkString(",\n")}
       SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r4"""
    })

  /** IVF-SERVED top-k for ID-addressed seed queries — the vector side
    * of hybrid retrieval ([[graft.functions.TextFunctions.hybridRrf]]):
    * each (query_id, seed vec_id) probes the NProbe nearest persisted
    * inverted lists and reranks by exact cosine, top-k per query.
    * Returns (query_id, n_id, rn). Identical serving shape to
    * [[knnIvf]] — pinned index version, literal-cid partition pruning
    * at the lists scan, broadcast probe frame — so at 100 TB a hybrid
    * query reads NProbe/C of the corpus on its vector side and O(term
    * postings) on its lexical side, never a full scan on either.
    */
  def ivfTopK(s: SparkSession, dir: String,
      seeds: Seq[(Int, Long)], k: Int): DataFrame = {
    import graft.sources.Snapshots
    val (cents, listsT, listsV) = ivfIndex(s, dir)
    val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
    val queries = quantized(Tables.load(s, dir, "embeddings"))
      .where(col("vec_id").isin(seeds.map(_._2): _*))
    val sdf = broadcast(s.createDataFrame(seeds).toDF("query_id", "vec_id"))
    val probes = queries.crossJoin(cents)
      .select(col("vec_id"), col("q"), col("nrm"), col("cid"), ivfMetric.as("m"))
      .withColumn("rn", row_number().over(byDist)).where(col("rn") <= NProbe)
      .join(sdf, "vec_id")
      .select(col("query_id"), col("vec_id").as("seed_id"),
        col("q").as("q_q"), col("nrm").as("q_nrm"), col("cid"))
    val probeCids = probes.select("cid").distinct().collect().map(_.getLong(0))
    val lists = s.read.parquet(Snapshots.versionDirs(listsT, listsV): _*)
      .where(col("cid").isin(probeCids: _*))
      .select(col("vec_id").as("n_id"), col("q").as("n_q"),
        col("nrm").as("n_nrm"), col("cid").cast("long").as("cid"))
    val scored = broadcast(probes).join(lists, Seq("cid"))
      .where(col("n_id") =!= col("seed_id"))
      .select(col("query_id"), col("n_id"),
        cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("query_id"), col("n_id"), col("rn"))
  }

  /** DuckDB CTE block reproducing [[ivfTopK]] bit-for-bit, for oracles
    * that embed the IVF-served vector side inside a larger query. The
    * caller must define a `sd(query_id, seed_id)` CTE first; this
    * block then defines `v` (quantized embeddings) through `ivtop`
    * (query_id, n_id, rn ≤ k). All intermediate CTEs are iv-prefixed
    * so they compose next to lexical-retrieval CTEs without clashes.
    */
  private[graft] def ivfTopKSql(k: Int): String = {
    val sqd = "list_sum(list_transform(list_zip(n.q, ivc0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
    val met = "CAST(list_sum(list_transform(list_zip(n.q, ivc1.cs), " +
      "s -> (ivc1.cn*s[1]-s[2])*(ivc1.cn*s[1]-s[2]))) AS DOUBLE) / (ivc1.cn*ivc1.cn)"
    s"""$quantizedSql,
     n AS (SELECT vec_id, q,
         CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
     $ivpcSql,
     ivc0 AS (SELECT vec_id AS cid, q AS cq FROM v WHERE vec_id < (SELECT c FROM ivpc)),
     iva1 AS (SELECT vec_id, q, nrm, cid FROM (
         SELECT n.vec_id, n.q, n.nrm, ivc0.cid,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $sqd, ivc0.cid) AS rn
         FROM n, ivc0) x WHERE rn = 1),
     ivex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM iva1),
     ivc1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
         FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ivex GROUP BY cid, dim) s
         JOIN (SELECT cid, COUNT(*) AS cn FROM iva1 GROUP BY cid) c USING (cid)
         GROUP BY s.cid),
     iva2 AS (SELECT vec_id, q, nrm, cid FROM (
         SELECT n.vec_id, n.q, n.nrm, ivc1.cid,
           ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, ivc1.cid) AS rn
         FROM n, ivc1) x WHERE rn = 1),
     ivpr AS (SELECT sd.query_id, x.vec_id AS seed_id, x.q AS q_q,
           x.nrm AS q_nrm, x.cid
         FROM (SELECT n.vec_id, n.q, n.nrm, ivc1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, ivc1.cid) AS rn
           FROM n, ivc1) x
         JOIN sd ON sd.seed_id = x.vec_id WHERE x.rn <= $NProbe),
     ivp AS (SELECT ivpr.query_id, iva2.vec_id AS n_id,
           CAST(list_sum(list_transform(list_zip(ivpr.q_q, iva2.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
           ivpr.q_nrm AS na, iva2.nrm AS nb
         FROM ivpr JOIN iva2 ON ivpr.cid = iva2.cid AND iva2.vec_id <> ivpr.seed_id),
     ivsc AS (SELECT query_id, n_id,
           CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM ivp),
     ivtop AS (SELECT query_id, n_id, rn FROM (
         SELECT query_id, n_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, n_id) AS rn
         FROM ivsc) r WHERE rn <= $k)"""
  }

  /** EMBEDDING-QUALITY EVAL — kNN label agreement, the standard quick
    * diagnostic of an embedding space (neighbors should share labels):
    * for every vector with at least one LSH-band candidate, take its
    * top-1 exact-cosine neighbor and score per-label PURITY = the
    * fraction of vectors whose nearest candidate carries the same
    * label. A purity collapse after an embedding-model change is the
    * canary a 100 TB re-embedding pipeline checks BEFORE committing
    * the corpus. Scale shape = `s_knn_join`'s: banded candidates (one
    * (band, bucket) shuffle), exact scoring on pairs only, per-vector
    * top-1 as a WindowGroupLimit, then a label join and a LABEL-sized
    * aggregate — output rows = |labels|.
    */
  val knnPurity: QueryDef = QueryDef(
    "s_knn_purity",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val v = quantized(e).localCheckpoint()
      val cand = lshCandidatePairs(e)
      val sym = cand.unionAll(cand.select(col("b").as("a"), col("a").as("b")))
      val w = Window.partitionBy("a").orderBy(col("sim").desc, col("b"))
      val top1 = scorePairs(v, sym, "a", "b")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      val lab = e.select(col("vec_id"), col("label"))
      top1
        .join(lab.select(col("vec_id").as("a"), col("label").as("la")), Seq("a"))
        .join(lab.select(col("vec_id").as("b"), col("label").as("lb")), Seq("b"))
        .groupBy(col("la").as("label"))
        .agg(count(lit(1)).cast("long").as("n_vectors"),
          sum(when(col("la") === col("lb"), 1L).otherwise(0L)).cast("long").as("n_same"))
        .withColumn("purity",
          col("n_same").cast("double") / col("n_vectors").cast("double"))
    },
    Some(s"""WITH $quantizedSql, $bandedSql,
       cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
           FROM bb l JOIN bb r ON l.band = r.band AND l.bucket = r.bucket
           WHERE l.vec_id < r.vec_id),
       sym AS (SELECT a, b FROM cand UNION ALL SELECT b AS a, a AS b FROM cand),
       sc AS (SELECT s.a, s.b,
           CAST(list_sum(list_transform(list_zip(x.q, y.q), z -> z[1]*z[2])) AS DOUBLE)
             / SQRT(CAST(x.nrm AS DOUBLE) * CAST(y.nrm AS DOUBLE)) AS sim
         FROM sym s JOIN n x ON x.vec_id = s.a JOIN n y ON y.vec_id = s.b),
       t1 AS (SELECT a, b FROM (
           SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b) AS rn
           FROM sc) x WHERE rn = 1),
       lb AS (SELECT vec_id, label FROM embeddings)
       SELECT la.label AS label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         CAST(SUM(CASE WHEN la.label = ln.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same,
         CAST(SUM(CASE WHEN la.label = ln.label THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS purity
       FROM t1 JOIN lb la ON la.vec_id = t1.a JOIN lb ln ON ln.vec_id = t1.b
       GROUP BY 1"""))

  /** METADATA-FILTERED ANN — the production vector-store feature next
    * to plain top-k: each seed's neighbors are restricted to
    * same-label vectors ("similar items in the same category"),
    * served from the SAME persisted partition-pruned IVF lists as
    * `s_knn_ivf`. This is the POST-FILTER strategy: probe the NProbe
    * nearest lists, join the (tiny, pruned) candidate set against the
    * label sidecar, filter, exact-rerank — right when the filter is
    * unselective (most candidates survive). A highly-selective filter
    * instead wants label-partitioned lists (PRE-filter: the label
    * becomes part of the partition key, the `writePartitioned` layout
    * machinery unchanged) — the standard pre/post-filter design
    * choice every vector store exposes; this query pins the post
    * side's semantics. The DuckDB oracle reproduces the probed,
    * filtered candidate set bit-for-bit.
    */
  val knnFiltered: QueryDef = QueryDef(
    "s_knn_filtered",
    (s, dir) => {
      import graft.sources.Snapshots
      val (cents, listsT, listsV) = ivfIndex(s, dir)
      val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
      val lab = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("label"))
      val queries = quantized(Tables.load(s, dir, "embeddings"))
        .where(col("vec_id") < 5)
      val probes = queries.crossJoin(cents)
        .select(col("vec_id"), col("q"), col("nrm"), col("cid"), ivfMetric.as("m"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") <= NProbe)
        .join(lab, "vec_id") // the seed's label rides with its probe
        .select(col("vec_id").as("q_id"), col("q").as("q_q"),
          col("nrm").as("q_nrm"), col("cid"), col("label").as("q_label"))
      val probeCids = probes.select("cid").distinct().collect().map(_.getLong(0))
      val lists = s.read.parquet(Snapshots.versionDirs(listsT, listsV): _*)
        .where(col("cid").isin(probeCids: _*))
        .select(col("vec_id").as("n_id"), col("q").as("n_q"),
          col("nrm").as("n_nrm"), col("cid").cast("long").as("cid"))
        .join(lab.select(col("vec_id").as("n_id"), col("label").as("n_label")), "n_id")
      val scored = broadcast(probes).join(lists, Seq("cid"))
        .where(col("n_id") =!= col("q_id") && col("n_label") === col("q_label"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some {
      val sqd = "list_sum(list_transform(list_zip(n.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
      val met = "CAST(list_sum(list_transform(list_zip(n.q, c1.cs), " +
        "s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
      s"""WITH $quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       $ivpcSql,
       lb AS (SELECT vec_id, label FROM embeddings),
       c0 AS (SELECT vec_id AS cid, q AS cq FROM v WHERE vec_id < (SELECT c FROM ivpc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM n, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       a2 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1) x WHERE rn = 1),
       pr AS (SELECT vec_id AS q_id, q AS q_q, nrm AS q_nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1 WHERE n.vec_id < 5) x WHERE rn <= $NProbe),
       p AS (SELECT pr.q_id, a2.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(pr.q_q, a2.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             pr.q_nrm AS na, a2.nrm AS nb
           FROM pr JOIN a2 ON pr.cid = a2.cid AND a2.vec_id <> pr.q_id
           JOIN lb la ON la.vec_id = pr.q_id
           JOIN lb ln ON ln.vec_id = a2.vec_id AND ln.label = la.label),
       sc AS (SELECT q_id, n_id,
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
       SELECT q_id, n_id, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM sc)
       WHERE rn <= 5"""
    })

  private val IvfThroughPrefix = "ivf_through "

  /** DELETE-AWARE maintenance of IVF inverted lists under a FROZEN
    * coarse quantizer — the ANN-side twin of the search family's
    * tombstone maintenance: quantizers are frozen artifacts between
    * offline re-trains (the `s_knn_ivfpq` serving contract), so a
    * vector's list row (vec_id, q, nrm, cid) is DETERMINED by the
    * frozen centroids — a departed vector's row folds in as sgn = −1
    * and cancels its bootstrap row EXACTLY, an inserted one assigns
    * against the same centroids with sgn = +1. One maintenance pass =
    * one change-feed read ([[graft.sources.Snapshots.changesBetween]],
    * only the dirs that entered/left the base manifest) + one O(changed
    * vectors) append; [[serveIvfLists]] nets at read, so the served
    * lists equal a fresh assignment of the LIVE corpus under the
    * frozen quantizer — never a rebuild, never a re-train.
    */
  def ivfListsMaintain(s: SparkSession, baseTable: String,
      centsT: String, listsT: String,
      project: DataFrame => DataFrame = identity): Unit = {
    // `project` adapts a WIDER base table (e.g. a documents table
    // carrying a nullable embedding column — the registry/forget
    // composition) to the (vec_id, embedding) shape this maintenance
    // consumes; the default is the plain embeddings-table identity
    import graft.sources.Snapshots
    val curV = Snapshots.currentVersion(baseTable)
    require(curV > 0, s"base table $baseTable has no committed version")
    // head-CAS fold (Snapshots.foldThrough): two concurrent registry
    // walks cannot double-append the same span's assignments. The
    // quantizer train runs INSIDE the bootstrap thunk, so a fold that
    // loses its bootstrap race (the winner already trained + assigned)
    // never re-trains on retry — the watermark re-read no-ops it.
    Snapshots.foldThrough(listsT, IvfThroughPrefix, curV,
        recomputeWhen = lastV => !Snapshots.versionAvailable(baseTable, lastV))({
      val base = project(Snapshots.readVersion(s, baseTable, curV))
      // train ONLY if no quantizer exists yet: a vacuum-triggered
      // recompute (and a lost bootstrap race) re-ASSIGNS the live
      // corpus under the existing FROZEN artifact — re-training here
      // would silently break the frozen-quantizer serving contract
      val cents =
        if (Snapshots.currentVersion(centsT) > 0) Snapshots.read(s, centsT)
        else {
          val c = ivfTrain(base, cCountOf(base.count()), 1)
          // the frozen quantizer, carrying its train-time drift baseline
          // (one extra assign pass) for the ivfRetrainIfDrifted trigger
          Snapshots.commitOverwriteTagged(c, centsT,
            Seq(IvfDriftBasePrefix + driftMean(quantized(base), c)))
          c
        }
      ivfAssign(quantized(base), cents).drop("m").withColumn("sgn", lit(1))
    }) { lastV =>
      val cents = Snapshots.read(s, centsT)
      val (ins0, del0) = Snapshots.changesBetween(s, baseTable, lastV, curV)
      val (ins, del) = (project(ins0), project(del0))
      ivfAssign(quantized(ins), cents).drop("m")
        .withColumn("sgn", lit(1))
        .unionByName(ivfAssign(quantized(del), cents).drop("m")
          .withColumn("sgn", lit(-1)))
    }
    // size-ratio compaction policy (serving invariant; sgn re-carried)
    Snapshots.maybeCompactNet(s, listsT, IvfThroughPrefix)(df =>
      ivfNet(df).select(col("vec_id"), col("q"), col("nrm"), col("cid"))
        .withColumn("sgn", lit(1)))
    ()
  }

  // ---- drift diagnostic + re-train trigger (round 8) ----

  private val IvfDriftBasePrefix = "ivf_drift0 "

  /** Per-vector INTEGER drift to the assigned centroid under a frozen
    * quantizer: argmin by the usual [[ivfMetric]] (double ratio, cid
    * tie-break — identical to [[ivfAssign]]), then the chosen
    * centroid's exact numerator floor-divided by cn² — so the scalar
    * is deterministic exact-integer arithmetic end to end (the
    * `graft_sqdist_scaled` machinery), reproducible in DuckDB with
    * `//` floor division.
    */
  private def driftAssigned(v: DataFrame, cents: DataFrame): DataFrame = {
    val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
    // hash(vec_id) established pre-expansion — see [[ivfAssign]] (r15)
    v.repartition(col("vec_id")).crossJoin(broadcast(cents))
      .withColumn("num",
        graft.functions.Native.sqDistScaled(col("q"), col("cs"), col("cn")))
      .withColumn("m",
        col("num").cast("double") / (col("cn") * col("cn")).cast("double"))
      .withColumn("rn", row_number().over(byDist)).where(col("rn") === 1)
      .select(col("vec_id"), expr("num DIV (cn * cn)").as("numi"))
  }

  /** (n_vecs, drift_sum, drift_mean) of `v` under `cents` — the
    * trendable drift aggregate, all BIGINT.
    */
  private def driftStats(v: DataFrame, cents: DataFrame): DataFrame =
    driftAssigned(v, cents)
      .agg(count(lit(1)).as("n_vecs"),
        coalesce(sum(col("numi")), lit(0L)).as("drift_sum"))
      .select(col("n_vecs"), col("drift_sum"),
        coalesce(expr("drift_sum DIV nullif(n_vecs, 0)"), lit(0L))
          .as("drift_mean"))

  private def driftMean(v: DataFrame, cents: DataFrame): Long =
    driftStats(v, cents).head().getAs[Long]("drift_mean")

  /** Mean integer drift of `baseTable`'s LIVE corpus to its assigned
    * centroid under `centsT`'s frozen quantizer — the diagnostic to
    * trend across maintenance cycles: a rising value means the vector
    * distribution is walking away from the quantizer and probe reads
    * are degrading toward scans of overgrown lists.
    */
  def ivfDriftOf(s: SparkSession, baseTable: String, centsT: String): Long = {
    import graft.sources.Snapshots
    driftMean(quantized(Snapshots.read(s, baseTable)),
      Snapshots.read(s, centsT))
  }

  /** Drift-triggered RE-TRAIN — the escape hatch of the frozen-
    * quantizer contract: [[ivfListsMaintain]] keeps lists exact under
    * DML but silently lets recall/probe-cost degrade as the
    * distribution shifts. The trigger compares the live corpus's
    * [[ivfDriftOf]] against the baseline recorded (as a manifest tag)
    * when the quantizer was trained; past `ratio` × baseline it
    * re-trains with [[ivfBuild]] on the live corpus, commits the new
    * quantizer with ITS baseline drift, and rebuilds the lists as one
    * clean version at the current base watermark — after which
    * maintenance folds resume against the new frozen artifact.
    * Documented threshold: ratio = 1.5 (drift is a squared-distance
    * mean, so 1.5× ≈ the average vector sitting 22% farther from its
    * centroid than at train time).
    */
  def ivfRetrainIfDrifted(s: SparkSession, baseTable: String,
      centsT: String, listsT: String, ratio: Double = 1.5,
      rounds: Int = 1): Boolean = {
    import graft.sources.Snapshots
    val curV = Snapshots.currentVersion(baseTable)
    require(curV > 0, s"base table $baseTable has no committed version")
    val live = quantized(Snapshots.readVersion(s, baseTable, curV))
    val drift = driftMean(live, Snapshots.read(s, centsT))
    val base0 = Snapshots
      .versionTags(centsT, Snapshots.currentVersion(centsT))
      .collectFirst { case t if t.startsWith(IvfDriftBasePrefix) =>
        t.drop(IvfDriftBasePrefix.length).toLong }
    val fire = base0.exists(b => drift > ratio * b)
    if (fire) {
      val baseDf = Snapshots.readVersion(s, baseTable, curV)
      val newCents = ivfTrain(baseDf, cCountOf(baseDf.count()), rounds)
      Snapshots.commitOverwriteTagged(newCents, centsT,
        Seq(IvfDriftBasePrefix + driftMean(live, newCents)))
      Snapshots.commitOverwriteTagged(
        ivfAssign(live, newCents).drop("m").withColumn("sgn", lit(1)),
        listsT, Seq(IvfThroughPrefix + curV))
      ()
    }
    fire
  }

  /** Net view of tombstone-folded IVF lists: identical assignment rows
    * cancel by summed sign — the lists equal assigning the live corpus
    * under the frozen quantizer.
    */
  def serveIvfLists(s: SparkSession, listsT: String): DataFrame =
    graft.sources.Snapshots.serveNetted(s, listsT)(df =>
      ivfNet(df).select("vec_id", "q", "nrm", "cid"))(
      _.select("vec_id", "q", "nrm", "cid"))

  private def ivfNet(df: DataFrame): DataFrame =
    df.groupBy("vec_id", "q", "nrm", "cid")
      .agg(sum(col("sgn")).as("net")).where(col("net") > 0)

  /** Major compaction of the tombstone-folded IVF lists (the
    * [[graft.sources.Snapshots.compactNet]] convention): nets
    * cancelled assignments into one clean version, sgn re-carried so
    * later DML folds keep appending against the compacted base.
    */
  def ivfListsCompact(s: SparkSession, listsT: String): Int =
    graft.sources.Snapshots.compactNet(s, listsT, IvfThroughPrefix)(df =>
      ivfNet(df).select(col("vec_id"), col("q"), col("nrm"), col("cid"))
        .withColumn("sgn", lit(1)))

  /** Catalog twin: IVF ANN over a corpus that suffered real DML — the
    * `t_search_dml` scenario on the vector side: bootstrap 90% of the
    * embeddings into a snapshot table (training the quantizer on it),
    * DELETE the vec_id % 7 slice, APPEND the held-out 10%, fold both
    * through [[ivfListsMaintain]], then probe/rerank the netted lists.
    * The oracle trains the quantizer on the SAME bootstrap slice and
    * assigns the LIVE corpus under it — hash equality proves
    * tombstone-maintained lists ≡ fresh assignment after DML.
    */
  val knnIvfDml: QueryDef = QueryDef(
    "s_knn_ivf_dml",
    (s, dir) => {
      import graft.sources.Snapshots
      val root = graft.Roots.scratch + "/ivfdml/" + dir.replaceAll("[^A-Za-z0-9]", "_")
      Snapshots.deleteRecursively(root)
      val (baseT, centsT, listsT) = (s"$root/vecs", s"$root/cents", s"$root/lists")
      val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
      Snapshots.commitOverwrite(e.where(pmod(col("vec_id"), lit(10)) =!= 0), baseT)
      ivfListsMaintain(s, baseT, centsT, listsT)
      Snapshots.deleteWhere(s, baseT, pmod(col("vec_id"), lit(7)) === 0)
      Snapshots.commitAppend(e.where(pmod(col("vec_id"), lit(10)) === 0), baseT)
      ivfListsMaintain(s, baseT, centsT, listsT)
      val cents = broadcast(Snapshots.read(s, centsT))
      val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
      val queries = quantized(Snapshots.read(s, baseT)).where(col("vec_id") < 5)
      val probes = queries.crossJoin(cents)
        .select(col("vec_id"), col("q"), col("nrm"), col("cid"), ivfMetric.as("m"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") <= NProbe)
        .select(col("vec_id").as("q_id"), col("q").as("q_q"),
          col("nrm").as("q_nrm"), col("cid"))
      val lists = serveIvfLists(s, listsT)
        .select(col("vec_id").as("n_id"), col("q").as("n_q"),
          col("nrm").as("n_nrm"), col("cid"))
      val scored = broadcast(probes).join(lists, Seq("cid"))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some {
      val live = "(vec_id % 10 <> 0 AND vec_id % 7 <> 0) OR vec_id % 10 = 0"
      val sqd = "list_sum(list_transform(list_zip(vb.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
      def met(src: String) =
        s"CAST(list_sum(list_transform(list_zip($src.q, c1.cs), " +
          s"s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
      s"""WITH $quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       vb AS (SELECT * FROM n WHERE vec_id % 10 <> 0),
       vl AS (SELECT * FROM n WHERE $live),
       pc AS (SELECT CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS c FROM vb),
       c0 AS (SELECT vec_id AS cid, q AS cq FROM vb WHERE vec_id < (SELECT c FROM pc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT vb.vec_id, vb.q, vb.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY vb.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM vb, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       a2 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT vl.vec_id, vl.q, vl.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY vl.vec_id ORDER BY ${met("vl")}, c1.cid) AS rn
           FROM vl, c1) x WHERE rn = 1),
       pr AS (SELECT vec_id AS q_id, q AS q_q, nrm AS q_nrm, cid FROM (
           SELECT vl.vec_id, vl.q, vl.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY vl.vec_id ORDER BY ${met("vl")}, c1.cid) AS rn
           FROM vl, c1 WHERE vl.vec_id < 5) x WHERE rn <= $NProbe),
       p AS (SELECT pr.q_id, a2.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(pr.q_q, a2.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             pr.q_nrm AS na, a2.nrm AS nb
           FROM pr JOIN a2 ON pr.cid = a2.cid AND a2.vec_id <> pr.q_id),
       sc AS (SELECT q_id, n_id,
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
       SELECT q_id, n_id, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM sc)
       WHERE rn <= 5"""
    })

  /** Catalog twin of the drift DIAGNOSTIC ([[ivfDriftOf]]): the
    * `s_knn_ivf_dml` scenario (train on the 90% bootstrap, then real
    * delete + append under the frozen quantizer), reporting the exact-
    * integer drift aggregate of BOTH phases — the trend a production
    * maintenance loop would alarm on (and [[ivfRetrainIfDrifted]]
    * re-trains on past 1.5× baseline). The oracle retrains the same
    * seed+1-Lloyd quantizer and reproduces every integer: per-vector
    * floor-divided numerators, their sum, and the floor-divided mean.
    */
  val knnIvfDrift: QueryDef = QueryDef(
    "s_knn_ivf_drift",
    (s, dir) => {
      import graft.sources.Snapshots
      val root = graft.Roots.scratch + "/ivfdrift/" + dir.replaceAll("[^A-Za-z0-9]", "_")
      Snapshots.deleteRecursively(root)
      val (baseT, centsT, listsT) = (s"$root/vecs", s"$root/cents", s"$root/lists")
      val e = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
      Snapshots.commitOverwrite(e.where(pmod(col("vec_id"), lit(10)) =!= 0), baseT)
      ivfListsMaintain(s, baseT, centsT, listsT)
      Snapshots.deleteWhere(s, baseT, pmod(col("vec_id"), lit(7)) === 0)
      Snapshots.commitAppend(e.where(pmod(col("vec_id"), lit(10)) === 0), baseT)
      ivfListsMaintain(s, baseT, centsT, listsT)
      val cents = Snapshots.read(s, centsT)
      val boot = quantized(e.where(pmod(col("vec_id"), lit(10)) =!= 0))
      val live = quantized(Snapshots.read(s, baseT))
      driftStats(boot, cents).withColumn("phase", lit("bootstrap"))
        .unionByName(driftStats(live, cents).withColumn("phase", lit("live")))
        .select("phase", "n_vecs", "drift_sum", "drift_mean")
    },
    Some {
      val live = "(vec_id % 10 <> 0 AND vec_id % 7 <> 0) OR vec_id % 10 = 0"
      val sqd = "list_sum(list_transform(list_zip(vb.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
      def met(src: String) =
        s"CAST(list_sum(list_transform(list_zip($src.q, c1.cs), " +
          s"s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
      def numi(src: String) =
        s"CAST(list_sum(list_transform(list_zip($src.q, c1.cs), " +
          s"s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS BIGINT) // (c1.cn*c1.cn)"
      def driftOf(src: String, phase: String) =
        s"""SELECT '$phase' AS phase, COUNT(*) AS n_vecs,
            CAST(SUM(numi) AS BIGINT) AS drift_sum,
            CAST(SUM(numi) AS BIGINT) // COUNT(*) AS drift_mean
          FROM (SELECT vec_id, numi FROM (
            SELECT $src.vec_id, ${numi(src)} AS numi,
              ROW_NUMBER() OVER (PARTITION BY $src.vec_id
                ORDER BY ${met(src)}, c1.cid) AS rn
            FROM $src, c1) x WHERE rn = 1)"""
      s"""WITH $quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       vb AS (SELECT * FROM n WHERE vec_id % 10 <> 0),
       vl AS (SELECT * FROM n WHERE $live),
       pc AS (SELECT CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS c FROM vb),
       c0 AS (SELECT vec_id AS cid, q AS cq FROM vb WHERE vec_id < (SELECT c FROM pc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT vb.vec_id, vb.q, vb.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY vb.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM vb, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid)
       ${driftOf("vb", "bootstrap")}
       UNION ALL
       ${driftOf("vl", "live")}"""
    })

  // ---- §2.2 row 27e: product-quantization ANN (compressed codes) ----

  private val PqM = 8      // subspaces
  private val PqSub = 8    // dims per subspace (D = 64)
  private val PqK = 8      // centroids per subspace codebook
  private val PqShort = 64 // ADC shortlist per query before exact rerank

  /** §2.2 row 27e — product quantization (Jégou et al., PAMI 2011),
    * the memory-side scale path next to IVF's I/O-side one: vectors
    * compress to M = 8 subspace codes (one byte each — 32× smaller
    * than the raw floats), queries score the WHOLE corpus through an
    * asymmetric-distance (ADC) lookup join against those codes, and
    * only a `PqShort` shortlist per query is reranked with exact
    * cosine.
    *
    * All PQ arithmetic is exact integers over the quantized vectors
    * (subspace squared-L2 partial distances, code argmin with id
    * tie-break, ADC sums), so the full pipeline reproduces bit-for-bit
    * in DuckDB. Codebooks here are deterministic seed slices (the
    * first PqK vectors); production training runs the [[ivfBuild]]
    * Lloyd machinery per subspace offline — same exact-integer update.
    *
    * Scale shape: codebooks are an M×K broadcast (64 rows); encoding
    * is one corpus pass; serving joins the queries' tiny ADC tables
    * (broadcast, queries×M×K rows) against the code table — the
    * shuffle carries (n_id, m, code) triples, never vectors — and the
    * exact rerank touches PqShort vectors per query. At 100 TB the
    * code table IS the resident index (M bytes/vector); combine with
    * IVF lists (probe, then ADC within the probed lists) when even
    * codes exceed memory.
    */
  val knnPq: QueryDef = QueryDef(
    "s_knn_pq",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings")).localCheckpoint()
      val sv = v.select(col("vec_id"), col("nrm"),
          explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("q"))
        .withColumn("sq", expr(s"slice(q, m * $PqSub + 1, $PqSub)"))
        .drop("q")
      val cb = broadcast(sv.where(col("vec_id") < PqK)
        .select(col("vec_id").as("k"), col("m").as("cb_m"), col("sq").as("cq")))
      val pdist = sv.join(cb, col("m") === col("cb_m"))
        .select(col("vec_id"), col("m"), col("k"),
          graft.functions.Native.sqDistScaled(col("sq"), col("cq"), lit(1L)).as("pd"))
      val byD = Window.partitionBy("vec_id", "m").orderBy(col("pd"), col("k"))
      val codes = pdist.withColumn("rn", row_number().over(byD)).where(col("rn") === 1)
        .select(col("vec_id").as("n_id"), col("m").as("c_m"), col("k").as("code"))
      // per-query ADC lookup tables: partial distance to every
      // (subspace, centroid) — queries × M × K rows, broadcast
      val adc = pdist.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("m"), col("k"), col("pd"))
      val approx = broadcast(adc)
        .join(codes, col("m") === col("c_m") && col("k") === col("code"))
        .where(col("n_id") =!= col("q_id"))
        .groupBy("q_id", "n_id").agg(sum(col("pd")).as("approx"))
      val bySh = Window.partitionBy("q_id").orderBy(col("approx"), col("n_id"))
      val short = approx.withColumn("rn", row_number().over(bySh))
        .where(col("rn") <= PqShort).select("q_id", "n_id")
      val qv = broadcast(v.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("q").as("q_q"), col("nrm").as("q_nrm")))
      val nv = v.select(col("vec_id").as("n_id"), col("q").as("n_q"), col("nrm").as("n_nrm"))
      val scored = short.join(qv, "q_id").join(nv, "n_id")
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some(s"""WITH $quantizedSql,
         n AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
         sv AS (SELECT vec_id, nrm, m,
             q[CAST(m*$PqSub+1 AS BIGINT) : CAST(m*$PqSub+$PqSub AS BIGINT)] AS sq
           FROM (SELECT vec_id, q, nrm, unnest(range(0, $PqM)) AS m FROM n) t),
         cb AS (SELECT vec_id AS k, m, sq AS cq FROM sv WHERE vec_id < $PqK),
         pdist AS (SELECT sv.vec_id, sv.m, cb.k,
             CAST(list_sum(list_transform(list_zip(sv.sq, cb.cq),
               z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS pd
           FROM sv JOIN cb ON sv.m = cb.m),
         codes AS (SELECT vec_id AS n_id, m, k AS code FROM (
             SELECT vec_id, m, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY pd, k) AS rn
             FROM pdist) x WHERE rn = 1),
         adc AS (SELECT vec_id AS q_id, m, k, pd FROM pdist WHERE vec_id < 5),
         approx AS (SELECT a.q_id, c.n_id, CAST(SUM(a.pd) AS BIGINT) AS approx
           FROM adc a JOIN codes c ON a.m = c.m AND a.k = c.code
           WHERE c.n_id <> a.q_id GROUP BY a.q_id, c.n_id),
         short AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY approx, n_id) AS rn
             FROM approx) x WHERE rn <= $PqShort),
         sc AS (SELECT s.q_id, s.n_id,
             CAST(list_sum(list_transform(list_zip(qn.q, nn.q), z -> z[1]*z[2])) AS DOUBLE)
               / SQRT(CAST(qn.nrm AS DOUBLE) * CAST(nn.nrm AS DOUBLE)) AS sim
           FROM short s JOIN n qn ON qn.vec_id = s.q_id
                        JOIN n nn ON nn.vec_id = s.n_id)
         SELECT q_id, n_id, sim FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
           FROM sc) WHERE rn <= 5"""))

  /** PQ CODEBOOK-UTILIZATION audit — [[ivfBalance]]'s sibling for the
    * memory tier: per subspace, how many of the K codes the corpus
    * actually uses (dead codes = wasted codebook capacity and a
    * too-large K), the min/max code mass, and the max/mean straggler
    * factor ×1000 over USED codes. A subspace where one code absorbs
    * most vectors quantizes poorly (high ADC distortion there) — the
    * read that decides re-training a subspace codebook before recall
    * quietly degrades. The oracle re-derives the full encode chain
    * (seed codebooks → partial distances → argmin codes) and must
    * land on identical usage — encode determinism checked for free.
    *
    * Scale shape: encoding is the one corpus-sized pass (M broadcast
    * codebook joins); usage groups on (m, code) ≤ M·K = 64 cells
    * map-side; the report is M = 8 rows.
    */
  val pqCodeBalance: QueryDef = QueryDef(
    "s_pq_code_balance",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val sv = v.select(col("vec_id"),
          explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("q"))
        .withColumn("sq", expr(s"slice(q, m * $PqSub + 1, $PqSub)")).drop("q")
      val cb = broadcast(sv.where(col("vec_id") < PqK)
        .select(col("vec_id").as("k"), col("m").as("cb_m"), col("sq").as("cq")))
      val pdist = sv.join(cb, col("m") === col("cb_m"))
        .select(col("vec_id"), col("m"), col("k"),
          graft.functions.Native.sqDistScaled(col("sq"), col("cq"), lit(1L)).as("pd"))
      val byD = Window.partitionBy("vec_id", "m").orderBy(col("pd"), col("k"))
      val usage = pdist.withColumn("rn", row_number().over(byD))
        .where(col("rn") === 1)
        .groupBy("m", "k").agg(count(lit(1)).as("n"))
      usage.groupBy(col("m").cast("long").as("subspace"))
        .agg(count(lit(1)).as("codes_used"), sum(col("n")).as("n_vecs"),
          min(col("n")).as("min_code_mass"), max(col("n")).as("max_code_mass"))
        .select(col("subspace"), col("codes_used"),
          (lit(PqK.toLong) - col("codes_used")).as("codes_dead"),
          col("n_vecs"), col("min_code_mass"), col("max_code_mass"),
          expr("(max_code_mass * codes_used * 1000) div n_vecs")
            .as("skew_x1000"))
    },
    Some(s"""WITH $quantizedSql,
         sv AS (SELECT vec_id, m,
             q[CAST(m*$PqSub+1 AS BIGINT) : CAST(m*$PqSub+$PqSub AS BIGINT)] AS sq
           FROM (SELECT vec_id, q, unnest(range(0, $PqM)) AS m FROM v) t),
         cb AS (SELECT vec_id AS k, m, sq AS cq FROM sv WHERE vec_id < $PqK),
         pdist AS (SELECT sv.vec_id, sv.m, cb.k,
             CAST(list_sum(list_transform(list_zip(sv.sq, cb.cq),
               z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS pd
           FROM sv JOIN cb ON sv.m = cb.m),
         codes AS (SELECT vec_id, m, k FROM (
             SELECT vec_id, m, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY pd, k) AS rn
             FROM pdist) x WHERE rn = 1),
         usage AS (SELECT m, k, COUNT(*) AS n FROM codes GROUP BY 1, 2)
         SELECT CAST(m AS BIGINT) AS subspace, COUNT(*) AS codes_used,
           $PqK - COUNT(*) AS codes_dead, CAST(SUM(n) AS BIGINT) AS n_vecs,
           MIN(n) AS min_code_mass, MAX(n) AS max_code_mass,
           (MAX(n) * COUNT(*) * 1000) // CAST(SUM(n) AS BIGINT) AS skew_x1000
         FROM usage GROUP BY 1"""))

  // ---- §2.2 row 27f: IVF+PQ combined serving ----

  /** §2.2 row 27f — IVF+PQ, the index shape production vector stores
    * actually run: the coarse quantizer (one exact-integer Lloyd
    * round, as [[knnIvf]]) prunes the corpus to NProbe inverted
    * lists, and WITHIN the probed lists candidates are scored through
    * the PQ code table (ADC lookup join, as [[knnPq]]) before the
    * exact rerank of a 64-wide shortlist. I/O pruning × memory
    * compression: a query reads NProbe/C of the corpus and scores it
    * at one byte per subspace — at 100 TB this is "fetch 2 of 4096
    * lists, scan their codes, rerank 64 vectors". Every stage is
    * exact integer arithmetic until the final cosine, so the FULL
    * composite pipeline hash-reproduces in DuckDB.
    */
  /** The in-query trainer twin of `s_knn_ivfpq` — the full pipeline
    * (coarse Lloyd round, PQ encode, probe, ADC, rerank) in one query,
    * exactly what the DuckDB oracle reproduces. Kept for the
    * served-vs-trained equality and A/B tests; the catalog query
    * serves the same artifacts from their persisted pinned versions.
    */
  private[graft] def ivfPqInQuery(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
      val e = Tables.load(s, dir, "embeddings")
      val v = quantized(e).localCheckpoint()
      // coarse quantizer + inverted lists (seeds -> 1 Lloyd round)
      val cents = ivfTrain(e, cCountOf(e.count()), 1)
      val lists = ivfAssign(v, cents)
        .select(col("vec_id").as("n_id"), col("cid")).localCheckpoint()
      // PQ codebooks, corpus codes, query ADC tables (seed codebooks)
      val sv = subVectors(v)
      val cb = broadcast(sv.where(col("vec_id") < PqK)
        .select(col("m").as("cb_m"), col("vec_id").as("k"), col("sq").as("cq")))
      val pdist = sv.join(cb, col("m") === col("cb_m"))
        .select(col("vec_id"), col("m"), col("k"),
          graft.functions.Native.sqDistScaled(col("sq"), col("cq"), lit(1L)).as("pd"))
      val byD = Window.partitionBy("vec_id", "m").orderBy(col("pd"), col("k"))
      val codes = pdist.withColumn("rn", row_number().over(byD)).where(col("rn") === 1)
        .select(col("vec_id").as("n_id"), col("m").as("c_m"), col("k").as("code"))
      // queries probe the NProbe nearest lists
      val byDist = Window.partitionBy("vec_id").orderBy(col("mm"), col("cid"))
      val probes = v.where(col("vec_id") < 5).crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          (graft.functions.Native.sqDistScaled(col("q"), col("cs"), col("cn"))
            .cast("double") / (col("cn") * col("cn")).cast("double")).as("mm"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") <= NProbe)
        .select(col("vec_id").as("q_id"), col("cid"))
      val adc = pdist.where(col("vec_id") < 5)
        .select(col("vec_id").as("a_q"), col("m").as("a_m"), col("k").as("a_k"),
          col("pd"))
      // ADC only over candidates inside the probed lists
      val cand = broadcast(probes).join(lists, Seq("cid"))
        .where(col("n_id") =!= col("q_id")).select("q_id", "n_id")
      val approx = cand.join(codes, Seq("n_id"))
        .join(broadcast(adc),
          col("q_id") === col("a_q") && col("c_m") === col("a_m") &&
            col("code") === col("a_k"))
        .groupBy("q_id", "n_id").agg(sum(col("pd")).as("approx"))
      val bySh = Window.partitionBy("q_id").orderBy(col("approx"), col("n_id"))
      val short = approx.withColumn("rn", row_number().over(bySh))
        .where(col("rn") <= PqShort).select("q_id", "n_id")
      val qv = broadcast(v.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("q").as("q_q"), col("nrm").as("q_nrm")))
      val nv = v.select(col("vec_id").as("n_id"), col("q").as("n_q"), col("nrm").as("n_nrm"))
      val scored = short.join(qv, "q_id").join(nv, "n_id")
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
  }

  /** §2.2 row 27f, SERVED: the quantizers train OFFLINE (at most once
    * per input fingerprint, claim-elected + atomically committed via
    * [[graft.sources.Snapshots.ensureIndex]]) and the query serves
    * from the pinned versions — coarse centroids and PQ codebooks as
    * tiny broadcasts, and the corpus CODES as one parquet table
    * PARTITIONED BY cid (the inverted lists and the code table are the
    * same structure: cid → (n_id, m, code)). A probe collects its
    * NProbe cids as scan literals, so the code scan PRUNES to the
    * probed partitions; the ADC join then carries (n_id, m, code)
    * triples only. Training is deterministic exact-integer arithmetic,
    * so the served result is bit-identical to the in-query trainer
    * ([[ivfPqInQuery]], equality-tested) and the full-pipeline DuckDB
    * oracle still covers it.
    */
  /** The persisted-artifact IVF+PQ serving path of `s_knn_ivfpq`,
    * top-`k` — shared with the recall eval (`s_knn_ivfpq_recall`).
    */
  private def ivfPqServe(s: SparkSession, dir: String, k: Int): DataFrame = {
      import graft.sources.Snapshots
      val base = graft.Roots.scratch + "/ivfpq/" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val (centsT, cbT, codesT) = (s"$base/cents", s"$base/codebooks", s"$base/codes")
      val e = Tables.load(s, dir, "embeddings")
      // C rides in the content key (see ivfIndex) — cents and the
      // cid-keyed codes both depend on it
      val fpBase = Snapshots.fileFingerprint(s"$dir/embeddings.parquet")
      val c = cCountOf(embeddingsCountCached(s, dir, fpBase))
      val fp = fpBase + s"-c$c"
      // ---- offline: coarse quantizer, PQ codebooks, cid-keyed codes
      val centsV = Snapshots.ensureIndex(centsT, fp) { out =>
        val cents = ivfTrain(e, c, 1)
        Snapshots.writeStaged(cents, out)
      }
      val cents = broadcast(s.read.parquet(Snapshots.versionDirs(centsT, centsV): _*))
      val cbV = Snapshots.ensureIndex(cbT, fp) { out =>
        Snapshots.writeStaged(subVectors(quantized(e)).where(col("vec_id") < PqK)
          .select(col("m").as("cb_m"), col("vec_id").as("k"), col("sq").as("cq")),
          out)
      }
      val cb = broadcast(s.read.parquet(Snapshots.versionDirs(cbT, cbV): _*))
      val codesV = Snapshots.ensureIndex(codesT, fp) { out =>
        graft.sources.Sources.writePartitioned(pqEncode(e, cents, cb), out, "cid")
      }
      // ---- serving: probe, prune the code scan, ADC, exact rerank
      val v = quantized(e).localCheckpoint()
      val byDist = Window.partitionBy("vec_id").orderBy(col("mm"), col("cid"))
      val probes = v.where(col("vec_id") < 5).crossJoin(cents)
        .select(col("vec_id"), col("cid"),
          (graft.functions.Native.sqDistScaled(col("q"), col("cs"), col("cn"))
            .cast("double") / (col("cn") * col("cn")).cast("double")).as("mm"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") <= NProbe)
        .select(col("vec_id").as("q_id"), col("cid"))
      // probed cids as scan literals (bounded by C): the code-table
      // scan prunes to exactly the probed partitions
      val probeCids = probes.select("cid").distinct().collect().map(_.getLong(0))
      val codes = readPartitionedDirs(s, codesT, codesV)
        .where(col("cid").isin(probeCids: _*))
        .select(col("n_id"), col("c_m"), col("code"), col("cid").cast("long").as("cid"))
      // query-side ADC tables from the persisted codebooks
      val adc = subVectors(v.where(col("vec_id") < 5)).join(cb, col("m") === col("cb_m"))
        .select(col("vec_id").as("a_q"), col("m").as("a_m"), col("k").as("a_k"),
          graft.functions.Native.sqDistScaled(col("sq"), col("cq"), lit(1L)).as("pd"))
      val approx = codes.join(broadcast(probes), Seq("cid"))
        .where(col("n_id") =!= col("q_id"))
        .join(broadcast(adc),
          col("q_id") === col("a_q") && col("c_m") === col("a_m") &&
            col("code") === col("a_k"))
        .groupBy("q_id", "n_id").agg(sum(col("pd")).as("approx"))
      val bySh = Window.partitionBy("q_id").orderBy(col("approx"), col("n_id"))
      val short = approx.withColumn("rn", row_number().over(bySh))
        .where(col("rn") <= PqShort).select("q_id", "n_id")
      val qv = broadcast(v.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("q").as("q_q"), col("nrm").as("q_nrm")))
      val nv = v.select(col("vec_id").as("n_id"), col("q").as("n_q"), col("nrm").as("n_nrm"))
      val scored = short.join(qv, "q_id").join(nv, "n_id")
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
        .select("q_id", "n_id", "sim")
  }

  /** The IVF+PQ pipeline CTE chain through `sc(q_id, n_id, sim)` —
    * shared by the `s_knn_ivfpq` serve oracle and its recall eval.
    */
  private def ivfPqCtes: String = {
      val sqd = "list_sum(list_transform(list_zip(n.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
      val met = "CAST(list_sum(list_transform(list_zip(n.q, c1.cs), " +
        "s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
      s"""$quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       $ivpcSql,
       c0 AS (SELECT vec_id AS cid, q AS cq FROM v WHERE vec_id < (SELECT c FROM ivpc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM n, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       a2 AS (SELECT vec_id, cid FROM (
           SELECT n.vec_id, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1) x WHERE rn = 1),
       sv AS (SELECT vec_id, m,
           q[CAST(m*$PqSub+1 AS BIGINT) : CAST(m*$PqSub+$PqSub AS BIGINT)] AS sq
         FROM (SELECT vec_id, q, unnest(range(0, $PqM)) AS m FROM n) t),
       cb AS (SELECT vec_id AS k, m, sq AS cq FROM sv WHERE vec_id < $PqK),
       pdist AS (SELECT sv.vec_id, sv.m, cb.k,
           CAST(list_sum(list_transform(list_zip(sv.sq, cb.cq),
             z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS pd
         FROM sv JOIN cb ON sv.m = cb.m),
       codes AS (SELECT vec_id AS n_id, m, k AS code FROM (
           SELECT vec_id, m, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY pd, k) AS rn
           FROM pdist) x WHERE rn = 1),
       adc AS (SELECT vec_id AS q_id, m, k, pd FROM pdist WHERE vec_id < 5),
       pr AS (SELECT vec_id AS q_id, cid FROM (
           SELECT n.vec_id, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1 WHERE n.vec_id < 5) x WHERE rn <= $NProbe),
       cand AS (SELECT pr.q_id, a2.vec_id AS n_id
           FROM pr JOIN a2 ON pr.cid = a2.cid AND a2.vec_id <> pr.q_id),
       ax AS (SELECT cd.q_id, cd.n_id, CAST(SUM(a.pd) AS BIGINT) AS approx
           FROM cand cd
             JOIN codes c ON c.n_id = cd.n_id
             JOIN adc a ON a.q_id = cd.q_id AND a.m = c.m AND a.k = c.code
           GROUP BY cd.q_id, cd.n_id),
       short AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY approx, n_id) AS rn
           FROM ax) x WHERE rn <= $PqShort),
       sc AS (SELECT s.q_id, s.n_id,
           CAST(list_sum(list_transform(list_zip(qn.q, nn.q), z -> z[1]*z[2])) AS DOUBLE)
             / SQRT(CAST(qn.nrm AS DOUBLE) * CAST(nn.nrm AS DOUBLE)) AS sim
         FROM short s JOIN n qn ON qn.vec_id = s.q_id
                      JOIN n nn ON nn.vec_id = s.n_id)"""
  }

  val knnIvfPq: QueryDef = QueryDef(
    "s_knn_ivfpq",
    (s, dir) => ivfPqServe(s, dir, 5),
    Some(s"""WITH $ivfPqCtes
       SELECT q_id, n_id, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
         FROM sc) WHERE rn <= 5"""))

  /** IVF+PQ recall@10 eval — the last unmeasured ladder tier: recall
    * of the probe-pruned + ADC-shortlisted + exact-rescored top-10
    * against brute truth. Unlike the flat PQ rung, this tier ALSO
    * pays probe loss (candidates outside the NProbe lists are
    * unreachable), so its recall reads against both s_knn_pq_recall
    * (same codes, no probe gate) and the ivf_sweep curve (same probe
    * gate, exact scoring). Deterministic end to end; row-27q harness.
    */
  val knnIvfPqRecall: QueryDef = QueryDef(
    "s_knn_ivfpq_recall",
    (s, dir) => {
      val pq10 = ivfPqServe(s, dir, 10).select("q_id", "n_id")
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val q = broadcast(v.where(col("vec_id") < 5).toDF("q_id", "q_q", "q_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val truth = q.join(v.toDF("n_id", "n_q", "n_nrm"), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
        .select("q_id", "n_id")
      truth.join(pq10.withColumn("hit", lit(1L)), Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_x1000", expr("(n_hit * 1000) div n_true"))
    },
    Some(s"""WITH $ivfPqCtes,
       pt AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id, ROW_NUMBER() OVER (
             PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
           FROM sc) x WHERE rn <= 10),
       bfp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           CAST(list_sum(list_transform(list_zip(a.q, b.q), z -> z[1]*z[2])) AS BIGINT) AS dot,
           a.nrm AS na, b.nrm AS nb
         FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
       bft AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) DESC, n_id) AS rn
           FROM bfp) x WHERE rn <= 10)
       SELECT b.q_id, COUNT(*) AS n_true,
         CAST(SUM(CASE WHEN p.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         CAST((CAST(SUM(CASE WHEN p.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
           // COUNT(*) AS BIGINT) AS recall_x1000
       FROM bft b LEFT JOIN pt p ON b.q_id = p.q_id AND b.n_id = p.n_id
       GROUP BY 1"""))

  // ---- offline PQ codebook training (Lloyd per subspace) ----

  /** Subspace view of the quantized corpus: (vec_id, m, sq). */
  private def subVectors(v: DataFrame): DataFrame =
    v.select(col("vec_id"), explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("q"))
      .withColumn("sq", expr(s"slice(q, m * $PqSub + 1, $PqSub)"))
      .drop("q")

  /** Exact centroid metric for (cs, cn)-form centroids. */
  private def pqMetric: Column =
    graft.functions.Native.sqDistScaled(col("sq"), col("cs"), col("cn"))
      .cast("double") / (col("cn") * col("cn")).cast("double")

  /** Offline PQ codebook training: per subspace, deterministic seeds
    * (the first PqK vectors' slices) + `rounds` Lloyd iterations in
    * exact integer arithmetic — [[ivfBuild]]'s update run for all M
    * subspaces AT ONCE (the m column just joins the grouping key, so
    * training M codebooks costs the same two shuffles per round as
    * one). Returns ((m, k, cs, cn) centroids, per-round Σ min-dist²
    * objective — non-increasing, asserted in PipelineSpec).
    */
  def pqBuild(embeddings: DataFrame, rounds: Int): (DataFrame, Seq[Double]) = {
    val sv = subVectors(quantized(embeddings)).localCheckpoint()
    val byD = Window.partitionBy("vec_id", "m").orderBy(col("pd"), col("k"))
    var cents = sv.where(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").as("k"), col("sq").as("cs"), lit(1L).as("cn"))
      .localCheckpoint()
    def assign() = sv.repartition(col("vec_id"), col("m"))
      .join(broadcast(cents), Seq("m"))
      .withColumn("pd", pqMetric)
      .withColumn("rn", row_number().over(byD)).where(col("rn") === 1)
      .select("m", "k", "vec_id", "sq", "pd")
    val objectives = Seq.newBuilder[Double]
    for (_ <- 1 to rounds) {
      val a = assign().localCheckpoint()
      objectives += a.agg(coalesce(sum(col("pd")), lit(0.0))).head().getDouble(0)
      val sums = a.select(col("m"), col("k"), posexplode(col("sq"))).toDF("m", "k", "dim", "v")
        .groupBy("m", "k", "dim").agg(sum(col("v")).as("sv"))
        .groupBy("m", "k").agg(transform(
          array_sort(collect_list(struct(col("dim"), col("sv")))),
          x => x.getField("sv")).as("cs"))
      cents = sums.join(a.groupBy("m", "k").agg(count(lit(1)).as("cn")), Seq("m", "k"))
        .localCheckpoint()
    }
    objectives += assign().agg(coalesce(sum(col("pd")), lit(0.0)))
      .head().getDouble(0)
    (cents, objectives.result())
  }

  /** [[pqBuild]] minus the objective telemetry — the production
    * trainer (r15, the [[ivfTrain]] convention): every catalog call
    * site discards the objective sequence, which cost two aggregation
    * jobs per round plus one full extra assign pass. Assignment and
    * update are the same code → bit-identical codebooks (asserted in
    * RandomizedSpec's ivfTrain twin test pattern via PipelineSpec's
    * objective suite still exercising [[pqBuild]]).
    */
  def pqTrain(embeddings: DataFrame, rounds: Int): DataFrame = {
    val sv = subVectors(quantized(embeddings)).localCheckpoint()
    val byD = Window.partitionBy("vec_id", "m").orderBy(col("pd"), col("k"))
    var cents = sv.where(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").as("k"), col("sq").as("cs"), lit(1L).as("cn"))
      .localCheckpoint()
    def assign() = sv.repartition(col("vec_id"), col("m"))
      .join(broadcast(cents), Seq("m"))
      .withColumn("pd", pqMetric)
      .withColumn("rn", row_number().over(byD)).where(col("rn") === 1)
      .select("m", "k", "vec_id", "sq", "pd")
    for (_ <- 1 to rounds) {
      val a = assign().localCheckpoint()
      val sums = a.select(col("m"), col("k"), posexplode(col("sq"))).toDF("m", "k", "dim", "v")
        .groupBy("m", "k", "dim").agg(sum(col("v")).as("sv"))
        .groupBy("m", "k").agg(transform(
          array_sort(collect_list(struct(col("dim"), col("sv")))),
          x => x.getField("sv")).as("cs"))
      cents = sums.join(a.groupBy("m", "k").agg(count(lit(1)).as("cn")), Seq("m", "k"))
        .localCheckpoint()
    }
    cents
  }

  /** Read a cid-partitioned index table committed as one or more
    * partitioned dirs (the full build plus incremental appends): Spark
    * cannot put multiple partitioned roots under one scan without a
    * shared basePath, so each dir partition-discovers independently
    * and the frames union — a probe's cid filter pushes into EVERY
    * branch, so partition pruning survives appends.
    */
  def readPartitionedDirs(s: org.apache.spark.sql.SparkSession,
      table: String, version: Int): DataFrame =
    graft.sources.Snapshots.versionDirs(table, version)
      .map(d => s.read.parquet(d)).reduce(_.unionByName(_))

  /** Encode vectors for IVF+PQ serving under FROZEN quantizers:
    * coarse-assign each vector to its inverted list and PQ-encode its
    * subspaces — (n_id, c_m, code, cid), the cid-partitioned
    * code-table row. Encoding is PER-VECTOR independent, so the same
    * function serves the offline full build and per-batch incremental
    * ingest ([[ivfPqIngestBatch]]) — new data never re-encodes old.
    */
  def pqEncode(embeddings: DataFrame, cents: DataFrame, cb: DataFrame): DataFrame = {
    val v = quantized(embeddings).localCheckpoint()
    val lists = ivfAssign(v, cents).select(col("vec_id"), col("cid"))
    val sv = subVectors(v)
    // hash(vec_id, m) established pre-expansion — see [[ivfAssign]] (r15)
    val pdistC = sv.repartition(col("vec_id"), col("m"))
      .join(broadcast(cb), col("m") === col("cb_m"))
      .select(col("vec_id"), col("m"), col("k"),
        graft.functions.Native.sqDistScaled(col("sq"), col("cq"), lit(1L)).as("pd"))
    val byD = Window.partitionBy("vec_id", "m").orderBy(col("pd"), col("k"))
    val codes = pdistC.withColumn("rn", row_number().over(byD)).where(col("rn") === 1)
      .select(col("vec_id").as("n_id"), col("m").as("c_m"), col("k").as("code"))
    codes.join(lists, codes("n_id") === lists("vec_id"))
      .select("n_id", "c_m", "code", "cid")
  }

  /** Seed PQ codebooks of a corpus — (cb_m, k, cq), the frozen
    * quantizer shape [[pqEncode]] consumes.
    */
  def pqSeedCodebooks(embeddings: DataFrame): DataFrame =
    subVectors(quantized(embeddings)).where(col("vec_id") < PqK)
      .select(col("m").as("cb_m"), col("vec_id").as("k"), col("sq").as("cq"))

  /** EXACTLY-ONCE incremental maintenance of the IVF+PQ code table:
    * quantizers are FROZEN artifacts of the trained index version, and
    * PQ codes are per-vector, so a batch of new vectors needs only ITS
    * OWN codes — encoded against the pinned centroids/codebooks and
    * APPENDED as a cid-partitioned dir (the pruned serving scan picks
    * the new rows up at its next version pin). No re-rank, no rebuild,
    * no old-data touch: the cheapest possible index maintenance, and
    * exactly what production vector stores do between re-trains.
    */
  def ivfPqIngestBatch(batch: DataFrame, cents: DataFrame, cb: DataFrame,
      codesTable: String, streamId: String, batchId: Long): Int =
    graft.sources.Snapshots.ingestBatchStaged(codesTable, streamId, batchId) {
      out =>
        graft.sources.Sources.writePartitioned(
          pqEncode(batch, cents, cb), out, "cid")
    }

  /** PQ search under arbitrary (m, k, cs, cn) codebooks (the serving
    * path of [[knnPq]] generalized to trained codebooks): encode the
    * corpus, ADC-score via the code join, exact-rerank a shortlist.
    */
  def pqSearch(embeddings: DataFrame, cents: DataFrame, nQueries: Int,
      shortlist: Int, k: Int): DataFrame = {
    val v = quantized(embeddings).localCheckpoint()
    val sv = subVectors(v)
    val byD = Window.partitionBy("vec_id", "m").orderBy(col("pd"), col("k"))
    // partial distances quantize onto a 2^20 grid: the per-(m,k)
    // metric is one exact IEEE divide (bit-identical across engines),
    // and flooring it to a long makes the ADC SUM exact and
    // order-independent — float summation order would otherwise leak
    // into the shortlist
    val pdist = sv.join(broadcast(cents), Seq("m"))
      .select(col("vec_id"), col("m"), col("k"),
        floor(pqMetric * lit(1L << 20)).cast("long").as("pd"))
    val codes = pdist.withColumn("rn", row_number().over(byD)).where(col("rn") === 1)
      .select(col("vec_id").as("n_id"), col("m").as("c_m"), col("k").as("code"))
    val adc = pdist.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("m"), col("k"), col("pd"))
    val approx = broadcast(adc)
      .join(codes, col("m") === col("c_m") && col("k") === col("code"))
      .where(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id").agg(sum(col("pd")).as("approx"))
    val bySh = Window.partitionBy("q_id").orderBy(col("approx"), col("n_id"))
    val short = approx.withColumn("rn", row_number().over(bySh))
      .where(col("rn") <= shortlist).select("q_id", "n_id")
    val qv = broadcast(v.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("q").as("q_q"), col("nrm").as("q_nrm")))
    val nv = v.select(col("vec_id").as("n_id"), col("q").as("n_q"), col("nrm").as("n_nrm"))
    val scored = short.join(qv, "q_id").join(nv, "n_id")
      .select(col("q_id"), col("n_id"),
        cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("q_id", "n_id", "sim")
  }

  // ---- offline IVF index build (multi-round Lloyd) ----

  /** Nearest-centroid assignment under the exact (Σ(n·x−s)²)/n²
    * metric; centroids are broadcast (C rows). Returns one row per
    * vector with its centroid id and distance.
    */
  def ivfAssign(v: DataFrame, centroids: DataFrame): DataFrame = {
    val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
    // r15: establish the per-vector partitioning BEFORE the broadcast
    // expansion. The argmin window needs hash(vec_id); placed after the
    // C-way crossJoin that exchange carried corpus × C expanded rows
    // (each with the 64-long q array), while here it carries the corpus
    // once and the broadcast join + window sort stay local — C× fewer
    // shuffle bytes on every assign pass (Lloyd rounds, DML folds,
    // drift scans), same exchange count, identical rows out.
    v.repartition(col("vec_id"))
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("q"), col("nrm"), col("cid"),
        (graft.functions.Native.sqDistScaled(col("q"), col("cs"), col("cn"))
          .cast("double") / (col("cn") * col("cn")).cast("double")).as("m"))
      .withColumn("rn", row_number().over(byDist)).where(col("rn") === 1)
      .select("vec_id", "q", "nrm", "cid", "m")
  }

  /** Lloyd update in exact integers: per-centroid component sums +
    * member counts (empty clusters drop, standard Lloyd practice).
    */
  def ivfUpdate(assigned: DataFrame): DataFrame = {
    val sums = assigned.select(col("cid"), posexplode(col("q"))).toDF("cid", "dim", "v")
      .groupBy("cid", "dim").agg(sum(col("v")).as("sv"))
      .groupBy("cid").agg(transform(
        array_sort(collect_list(struct(col("dim"), col("sv")))),
        x => x.getField("sv")).as("cs"))
    sums.join(assigned.groupBy("cid").agg(count(lit(1)).as("cn")), "cid")
  }

  /** Offline IVF build: deterministic seeds (first `c` vectors, each
    * a (Σ=q, n=1) centroid) + `rounds` Lloyd iterations, returning
    * the centroid table and the per-round clustering objective
    * Σ min-dist² — non-increasing by the classic Lloyd argument,
    * asserted in PipelineSpec. Each round is two shuffles (assign
    * argmin + C×dims partial sums); lineage is cut per round. At
    * 100 TB this runs as a periodic batch job whose output feeds the
    * `s_knn_ivf`-shaped serving query.
    */
  def ivfBuild(embeddings: DataFrame, c: Int, rounds: Int): (DataFrame, Seq[Double]) = {
    val v = quantized(embeddings).localCheckpoint()
    var centroids = v.where(col("vec_id") < c)
      .select(col("vec_id").as("cid"), col("q").as("cs"), lit(1L).as("cn"))
      .localCheckpoint()
    val objectives = Seq.newBuilder[Double]
    for (_ <- 1 to rounds) {
      val assigned = ivfAssign(v, centroids).localCheckpoint()
      // coalesce: an EMPTY corpus sums to NULL, and the objective of
      // nothing is 0, not a getDouble crash (day-one empty pipeline)
      objectives += assigned.agg(coalesce(sum(col("m")), lit(0.0)))
        .head().getDouble(0)
      centroids = ivfUpdate(assigned).localCheckpoint()
    }
    objectives += ivfAssign(v, centroids)
      .agg(coalesce(sum(col("m")), lit(0.0))).head().getDouble(0)
    (centroids, objectives.result())
  }

  /** [[ivfBuild]] minus the clustering-objective telemetry — the
    * production trainer (r15): every catalog call site discards the
    * objective sequence, yet computing it cost two aggregation jobs
    * per round PLUS one full extra assign pass over the corpus at the
    * end. Assignment and update are the same code, so the returned
    * centroid table is bit-identical to `ivfBuild(…)._1`; PipelineSpec
    * keeps using [[ivfBuild]] where the non-increasing objective is
    * the thing under test, and asserts this twin's equality.
    */
  def ivfTrain(embeddings: DataFrame, c: Int, rounds: Int): DataFrame = {
    val v = quantized(embeddings).localCheckpoint()
    var centroids = v.where(col("vec_id") < c)
      .select(col("vec_id").as("cid"), col("q").as("cs"), lit(1L).as("cn"))
      .localCheckpoint()
    for (_ <- 1 to rounds)
      centroids = ivfUpdate(ivfAssign(v, centroids).localCheckpoint())
        .localCheckpoint()
    centroids
  }

  /** §2.2 row 27e, TRAINED twin — the full trained-PQ pipeline under
    * the oracle: one per-subspace Lloyd round over deterministic seeds
    * (all M codebooks in the same two shuffles — [[pqBuild]]), then
    * [[pqSearch]]'s encode / ADC / rerank. Portability anatomy:
    * centroids stay undivided (Σ-vector, count) integers; the
    * per-(subspace, centroid) metric is ONE exact IEEE divide
    * (bit-identical in DuckDB); and partial distances floor onto a
    * 2^20 grid so the ADC sum is exact integer addition — float
    * summation order never leaks into the shortlist.
    */
  /** Shared oracle of the trained-PQ pipeline — covers BOTH the
    * in-query trainer (`s_knn_pq_trained`) and the persisted-index
    * serving twin (`s_knn_pq_served`): training is deterministic
    * exact-integer arithmetic, so serving the committed artifacts is
    * bit-identical to training in the query.
    */
  /** The trained-PQ CTE chain through `sc(q_id, n_id, sim)` — shared
    * by [[pqTrainedOracle]] (top-5 serve) and the recall eval
    * (`s_knn_pq_recall`, top-10 vs brute truth).
    */
  private val pqTrainedCtes: String = {
      val sqd0 = "list_sum(list_transform(list_zip(sv.sq, cb0.cs), " +
        "z -> (z[1]-z[2])*(z[1]-z[2])))"
      val met1 = "CAST(list_sum(list_transform(list_zip(sv.sq, c.cs), " +
        "z -> (c.cn*z[1]-z[2])*(c.cn*z[1]-z[2]))) AS DOUBLE) / (c.cn*c.cn)"
      s"""$quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       sv AS (SELECT vec_id, m,
           q[CAST(m*$PqSub+1 AS BIGINT) : CAST(m*$PqSub+$PqSub AS BIGINT)] AS sq
         FROM (SELECT vec_id, q, unnest(range(0, $PqM)) AS m FROM n) t),
       cb0 AS (SELECT m, vec_id AS k, sq AS cs FROM sv WHERE vec_id < $PqK),
       p0 AS (SELECT vec_id, m, k, sq FROM (
           SELECT sv.vec_id, sv.m, cb0.k, sv.sq,
             ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.m
               ORDER BY $sqd0, cb0.k) AS rn
           FROM sv JOIN cb0 ON sv.m = cb0.m) x WHERE rn = 1),
       exd AS (SELECT m, k, unnest(sq) AS val, unnest(range(0, $PqSub)) AS dim FROM p0),
       cb1 AS (SELECT s1.m, s1.k, list(s1.sv ORDER BY s1.dim) AS cs, MAX(c2.cn) AS cn
           FROM (SELECT m, k, dim, CAST(SUM(val) AS BIGINT) AS sv
                 FROM exd GROUP BY m, k, dim) s1
           JOIN (SELECT m, k, COUNT(*) AS cn FROM p0 GROUP BY m, k) c2 USING (m, k)
           GROUP BY s1.m, s1.k),
       pdist AS (SELECT sv.vec_id, sv.m, c.k,
           CAST(FLOOR(($met1) * ${1L << 20}) AS BIGINT) AS pd
         FROM sv JOIN cb1 c ON sv.m = c.m),
       codes AS (SELECT vec_id AS n_id, m, k AS code FROM (
           SELECT vec_id, m, k,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY pd, k) AS rn
           FROM pdist) x WHERE rn = 1),
       adc AS (SELECT vec_id AS q_id, m, k, pd FROM pdist WHERE vec_id < 5),
       approx AS (SELECT a.q_id, c.n_id, CAST(SUM(a.pd) AS BIGINT) AS approx
           FROM adc a JOIN codes c ON a.m = c.m AND a.k = c.code
           WHERE c.n_id <> a.q_id GROUP BY a.q_id, c.n_id),
       short AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY approx, n_id) AS rn
           FROM approx) x WHERE rn <= $PqShort),
       sc AS (SELECT s.q_id, s.n_id,
           CAST(list_sum(list_transform(list_zip(qn.q, nn.q), z -> z[1]*z[2])) AS DOUBLE)
             / SQRT(CAST(qn.nrm AS DOUBLE) * CAST(nn.nrm AS DOUBLE)) AS sim
         FROM short s JOIN n qn ON qn.vec_id = s.q_id
                      JOIN n nn ON nn.vec_id = s.n_id)"""
  }

  private val pqTrainedOracle: String =
    s"""WITH $pqTrainedCtes
       SELECT q_id, n_id, sim FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
         FROM sc) WHERE rn <= 5"""

  /** PQ recall@10 eval — the missing rung of the compression ladder
    * (SQ8 and BQ already ship theirs): recall of the trained-PQ ADC
    * shortlist + exact rescore top-10 against brute-force truth, per
    * query. Deterministic end to end (2^20-grid ADC, exact rescore,
    * tie-broken ranks), so the whole curve is oracle-checked.
    *
    * Scale shape: PQ side is the `s_knn_pq_trained` pipeline (codes
    * scan + tiny ADC broadcast); truth is the bounded-query brute
    * pass; the compare joins two ≤ 5×10 frames.
    */
  val knnPqRecall: QueryDef = QueryDef(
    "s_knn_pq_recall",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cents = pqTrain(e, rounds = 1)
      val pq10 = pqSearch(e, cents, nQueries = 5, shortlist = PqShort, k = 10)
        .select("q_id", "n_id")
      val v = quantized(e)
      val q = broadcast(v.where(col("vec_id") < 5).toDF("q_id", "q_q", "q_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val truth = q.join(v.toDF("n_id", "n_q", "n_nrm"), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
        .select("q_id", "n_id")
      truth.join(pq10.withColumn("hit", lit(1L)), Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_x1000", expr("(n_hit * 1000) div n_true"))
    },
    Some(s"""WITH $pqTrainedCtes,
       pt AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id, ROW_NUMBER() OVER (
             PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
           FROM sc) x WHERE rn <= 10),
       bfp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           CAST(list_sum(list_transform(list_zip(a.q, b.q), z -> z[1]*z[2])) AS BIGINT) AS dot,
           a.nrm AS na, b.nrm AS nb
         FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
       bft AS (SELECT q_id, n_id FROM (
           SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
             CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) DESC, n_id) AS rn
           FROM bfp) x WHERE rn <= 10)
       SELECT b.q_id, COUNT(*) AS n_true,
         CAST(SUM(CASE WHEN p.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         CAST((CAST(SUM(CASE WHEN p.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
           // COUNT(*) AS BIGINT) AS recall_x1000
       FROM bft b LEFT JOIN pt p ON b.q_id = p.q_id AND b.n_id = p.n_id
       GROUP BY 1"""))

  val knnPqTrained: QueryDef = QueryDef(
    "s_knn_pq_trained",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cents = pqTrain(e, rounds = 1)
      pqSearch(e, cents, nQueries = 5, shortlist = PqShort, k = 5)
    },
    Some(pqTrainedOracle))

  /** §2.2 row 27e, TRAINED + SERVED: [[pqBuild]]'s Lloyd-trained
    * codebooks AND the corpus codes they induce are committed at most
    * once per input fingerprint ([[graft.sources.Snapshots.ensureIndex]])
    * and SERVED — the query never trains or encodes. It broadcasts the
    * persisted codebooks (M×K rows), scans the persisted code table
    * (M bytes per vector — the resident index at 100 TB), builds the
    * tiny query-side ADC tables, and exact-reranks the shortlist.
    * Training is deterministic exact-integer arithmetic, so serving is
    * bit-identical to the in-query trainer — the two queries share one
    * oracle, and equality is also asserted in PipelineSpec.
    */
  val knnPqServed: QueryDef = QueryDef(
    "s_knn_pq_served",
    (s, dir) => {
      import graft.sources.Snapshots
      val base = graft.Roots.scratch + "/pqtrained/" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val (cbT, codesT) = (s"$base/codebooks", s"$base/codes")
      val fp = Snapshots.fileFingerprint(s"$dir/embeddings.parquet")
      val e = Tables.load(s, dir, "embeddings")
      val cbV = Snapshots.ensureIndex(cbT, fp) { out =>
        val cents = pqTrain(e, rounds = 1)
        Snapshots.writeStaged(cents, out)
      }
      val cb = broadcast(s.read.parquet(Snapshots.versionDirs(cbT, cbV): _*))
      val codesV = Snapshots.ensureIndex(codesT, fp) { out =>
        val v = quantized(e).localCheckpoint()
        val byD = Window.partitionBy("vec_id", "m").orderBy(col("pd"), col("k"))
        Snapshots.writeStaged(subVectors(v).join(cb, Seq("m"))
          .select(col("vec_id"), col("m"), col("k"),
            floor(pqMetric * lit(1L << 20)).cast("long").as("pd"))
          .withColumn("rn", row_number().over(byD)).where(col("rn") === 1)
          .select(col("vec_id").as("n_id"), col("m").as("c_m"), col("k").as("code")),
          out)
      }
      val codes = s.read.parquet(Snapshots.versionDirs(codesT, codesV): _*)
      val v = quantized(e).localCheckpoint()
      // query-side ADC tables under the persisted trained codebooks —
      // same 2^20-grid partial distances the codes were encoded with
      val adc = subVectors(v.where(col("vec_id") < 5)).join(cb, Seq("m"))
        .select(col("vec_id").as("q_id"), col("m"), col("k"),
          floor(pqMetric * lit(1L << 20)).cast("long").as("pd"))
      val approx = broadcast(adc)
        .join(codes, col("m") === col("c_m") && col("k") === col("code"))
        .where(col("n_id") =!= col("q_id"))
        .groupBy("q_id", "n_id").agg(sum(col("pd")).as("approx"))
      val bySh = Window.partitionBy("q_id").orderBy(col("approx"), col("n_id"))
      val short = approx.withColumn("rn", row_number().over(bySh))
        .where(col("rn") <= PqShort).select("q_id", "n_id")
      val qv = broadcast(v.where(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("q").as("q_q"), col("nrm").as("q_nrm")))
      val nv = v.select(col("vec_id").as("n_id"), col("q").as("n_q"), col("nrm").as("n_nrm"))
      val scored = short.join(qv, "q_id").join(nv, "n_id")
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some(pqTrainedOracle))

  // ---- graph centrality over the persisted kNN graph ----


  private val PrIters = 4
  private val PrScale = 1000000000000L // rank mass, integer-scaled 1e12

  /** PageRank over the persisted kNN document graph — centrality-
    * weighted data selection: documents whose neighborhoods are dense
    * and well-connected rank high (good canonical/representative
    * picks for a training mixture), near-orphans sink to the teleport
    * floor. Runs the standard power iteration, but in INTEGER
    * arithmetic (ranks scaled by [[PrScale]], every divide an
    * integral DIV) so all [[PrIters]] rounds are bit-reproducible in
    * DuckDB — the oracle unrolls the same iterations over the same
    * rebuilt graph.
    *
    * No dangling nodes by construction: [[buildGraph]] symmetrizes
    * candidate pairs before the top-K cut, so any vector appearing as
    * a destination also has out-edges of its own — the node set IS
    * `distinct g_src`, and no rank mass leaks.
    *
    * Scale shape: per iteration, ONE equi-join of ranks against the
    * edge table on its persisted partitioning key (g_src) and ONE
    * partial-aggregated shuffle on g_dst; state is (vid, rank) pairs —
    * never vectors, never the corpus. Iterations are a fixed constant;
    * the final top-k is TakeOrderedAndProject, not a global sort. The
    * graph is scanned from its pinned snapshot version, shared with
    * `s_knn_graph`/`s_knn_beam`.
    */
  /** The full (vid, rank) vector after [[PrIters]] rounds — the query
    * below serves its top-20; tests read the whole vector to assert
    * mass conservation and the teleport floor.
    */
  private[graft] def pagerankRanks(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val graph = knnGraphTable(s, dir).select("g_src", "g_dst")
    val nodes = graph.select(col("g_src").as("vid")).distinct().localCheckpoint()
    val nN = nodes.count() // bounded driver scalar: the node count
    // empty graph (tiny/sparse corpus with zero band collisions):
    // there is nothing to rank — empty result, not a divide-by-zero
    if (nN == 0) return nodes.withColumn("rank", lit(0L))
    val deg = graph.groupBy("g_src").agg(count(lit(1)).as("deg"))
    val edges = graph.join(deg, "g_src").repartition(col("g_src"))
    // teleport and the uniform start are Long truncating division —
    // identical to `//` in the oracle (all operands positive)
    val teleport = (15L * PrScale) / (100L * nN)
    var ranks = nodes.withColumn("rank", lit(PrScale / nN))
    for (i <- 1 to PrIters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("vid", "g_src"), "g_src")
        .select(col("g_dst").as("vid"), expr("rank DIV deg").as("c"))
        .groupBy("vid").agg(sum(col("c")).as("cs"))
      val next = nodes.join(contrib, Seq("vid"), "left")
        .select(col("vid"),
          (lit(teleport) + expr("(85 * coalesce(cs, CAST(0 AS BIGINT))) DIV 100"))
            .as("rank"))
      // r16: the rank chain is LINEAR (each round's frame is referenced
      // exactly once by the next), so the whole [[PrIters]]-round
      // iteration runs as ONE lazy plan — the former per-round
      // localCheckpoints each cost a full materialization (3 extra
      // multi-job executions) only to bound a 4-deep plan that needs no
      // bounding. The loop-invariant edge frame's repartition exchange
      // is reused across rounds (ReusedExchange, verified in the after
      // plan), so nothing is recomputed, and the persisted-graph scan
      // stays visible in the final plan (asserted in PipelineSpec).
      ranks = next
    }
    ranks
  }

  val graphPagerank: QueryDef = QueryDef(
    "s_graph_pagerank",
    (s, dir) => pagerankRanks(s, dir)
      .orderBy(col("rank").desc, col("vid")).limit(20)
      .select(col("vid").as("vec_id"), col("rank")),
    Some(pagerankOracle))

  /** PERSONALIZED PageRank — seed-set expansion over the kNN graph,
    * the curation move behind "select corpus documents similar to a
    * trusted seed set" (quality-seed bootstrapping): identical integer
    * power iteration to [[pagerankRanks]], except ALL teleport mass
    * returns to the seeds (vec_id < 5), so rank measures proximity to
    * the seed neighborhood instead of global centrality. Same
    * bit-reproducible fixed-point arithmetic, same per-round one
    * shuffle on the edge partitioning key; the output is the top-20
    * expansion candidates a curator would pull in next.
    */
  val graphPprSeeded: QueryDef = QueryDef(
    "s_graph_ppr",
    (s, dir) => {
      val graph = knnGraphTable(s, dir).select("g_src", "g_dst")
      val nodes = graph.select(col("g_src").as("vid")).distinct().localCheckpoint()
      val nS = nodes.where(col("vid") < 5).count() // seed count, driver scalar
      // no seed has any edge: the personalized walk has no mass
      // sources — empty expansion, not a divide-by-zero
      if (nS == 0)
        nodes.where(lit(false))
          .select(col("vid").as("vec_id"), lit(0L).as("rank"))
      else {
        val deg = graph.groupBy("g_src").agg(count(lit(1)).as("deg"))
        val edges = graph.join(deg, "g_src").repartition(col("g_src"))
        val teleport = (15L * PrScale) / (100L * nS)
        var ranks = nodes.withColumn("rank",
          when(col("vid") < 5, lit(PrScale / nS)).otherwise(lit(0L)))
        for (i <- 1 to PrIters) {
          val contrib = edges
            .join(ranks.withColumnRenamed("vid", "g_src"), "g_src")
            .select(col("g_dst").as("vid"), expr("rank DIV deg").as("c"))
            .groupBy("vid").agg(sum(col("c")).as("cs"))
          val next = nodes.join(contrib, Seq("vid"), "left")
            .select(col("vid"),
              (when(col("vid") < 5, lit(teleport)).otherwise(lit(0L)) +
                expr("(85 * coalesce(cs, CAST(0 AS BIGINT))) DIV 100")).as("rank"))
          // linear chain — one lazy plan, no per-round checkpoints
          // (see pagerankRanks)
          ranks = next
        }
        ranks.orderBy(col("rank").desc, col("vid")).limit(20)
          .select(col("vid").as("vec_id"), col("rank"))
      }
    },
    Some {
      def iter(i: Int): String =
        s"""p$i AS (SELECT nd.vid,
              CAST(CASE WHEN nd.vid < 5
                THEN (SELECT (15 * $PrScale) // (100 * ns) FROM sn) ELSE 0 END
                + (85 * COALESCE(c.cs, 0)) // 100 AS BIGINT) AS rank
            FROM nodes nd LEFT JOIN (
              SELECT g.g_dst AS vid, SUM(r.rank // d.deg) AS cs
              FROM graph g JOIN p${i - 1} r ON r.vid = g.g_src
              JOIN deg d ON d.g_src = g.g_src
              GROUP BY 1) c ON c.vid = nd.vid)"""
      s"""WITH $graphSqlCtes,
         nodes AS (SELECT DISTINCT g_src AS vid FROM graph),
         sn AS (SELECT COUNT(*) AS ns FROM nodes WHERE vid < 5),
         deg AS (SELECT g_src, COUNT(*) AS deg FROM graph GROUP BY 1),
         p0 AS (SELECT vid, CASE WHEN vid < 5
             THEN (SELECT $PrScale // ns FROM sn) ELSE 0 END AS rank FROM nodes),
         ${(1 to PrIters).map(iter).mkString(",\n")}
         SELECT vid AS vec_id, rank FROM p$PrIters ORDER BY rank DESC, vid LIMIT 20"""
    })

  /** Oracle twin: rebuild the graph ([[graphSqlCtes]]) and unroll the
    * same [[PrIters]] integer power iterations; `//` ≡ Spark's DIV on
    * the all-positive operands.
    */
  private def pagerankOracle: String = {
    def iter(i: Int): String =
      s"""r$i AS (SELECT nd.vid,
            CAST((SELECT (15 * $PrScale) // (100 * n) FROM nn)
              + (85 * COALESCE(c.cs, 0)) // 100 AS BIGINT) AS rank
          FROM nodes nd LEFT JOIN (
            SELECT g.g_dst AS vid, SUM(r.rank // d.deg) AS cs
            FROM graph g JOIN r${i - 1} r ON r.vid = g.g_src
            JOIN deg d ON d.g_src = g.g_src
            GROUP BY 1) c ON c.vid = nd.vid)"""
    s"""WITH $graphSqlCtes,
       nodes AS (SELECT DISTINCT g_src AS vid FROM graph),
       nn AS (SELECT COUNT(*) AS n FROM nodes),
       deg AS (SELECT g_src, COUNT(*) AS deg FROM graph GROUP BY 1),
       r0 AS (SELECT vid, (SELECT $PrScale // n FROM nn) AS rank FROM nodes),
       ${(1 to PrIters).map(iter).mkString(",\n")}
       SELECT vid AS vec_id, rank FROM r$PrIters ORDER BY rank DESC, vid LIMIT 20"""
  }

  /** Hard-negative mining for contrastive / embedding training: for
    * each anchor vector, the top-5 MOST similar vectors carrying a
    * DIFFERENT label — the "hard" negatives a trainer pairs with each
    * anchor's positives (random negatives are too easy to teach the
    * margin; the highest-similarity wrong-label examples are where the
    * gradient is). Exact cosine on the quantized integers, ranked
    * (sim DESC, n_id) per anchor.
    *
    * Scale shape: identical to [[knnBruteForce]] — broadcast the small
    * anchor set, stream the corpus once, partial WindowGroupLimit
    * top-k below the exchange. Mining jobs are offline batch scans, so
    * the per-shard brute-force pass IS the production shape; to mine
    * for EVERY corpus vector at once, swap the broadcast for the
    * banded self-join of [[embeddingNearDup]] and filter labels the
    * same way.
    */
  val hardNegatives: QueryDef = QueryDef(
    "s_hard_negatives",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val v = e.select(col("vec_id"), quantize(col("embedding")).as("q"),
          col("label"))
        .withColumn("nrm", dotL(col("q"), col("q")))
      val q = broadcast(v.where(col("vec_id") < 5)
        .toDF("q_id", "q_q", "q_label", "q_nrm"))
      val scored = q.join(v.toDF("n_id", "n_q", "n_label", "n_nrm"),
          col("n_label") =!= col("q_label"))
        .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
          col("sim"), col("rn").cast("long").as("rn"))
    },
    Some("""WITH v AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
               FROM embeddings),
            n AS (SELECT vec_id, label, q,
                 CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
            p AS (SELECT a.vec_id AS q_id, a.label AS q_label,
                 b.vec_id AS n_id, b.label AS n_label,
                 CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
                 a.nrm AS na, b.nrm AS nb
               FROM n a JOIN n b ON a.vec_id < 5 AND b.label <> a.label),
            s AS (SELECT q_id, q_label, n_id, n_label,
                 CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
            SELECT q_id, q_label, n_id, n_label, sim, rn FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM s)
            WHERE rn <= 5"""))

  private val SemTau = 0.95

  /** Hot-cluster size cap, as a multiple of the average cluster size
    * ⌈N/C⌉: a cluster larger than SemCapFactor× the average is
    * sub-split before pairing. With C = ⌈√N⌉ the cap is ≈ 4·√N, so
    * in-cluster pair work is bounded by N·cap/2 ≈ 2·N^1.5 regardless
    * of skew (PipelineSpec asserts both the cap and the bound).
    */
  private[graft] val SemCapFactor = 4L

  /** Sub-split cluster assignment for [[dedupSemantic]]: one row per
    * vector — (vec_id, q, nrm, cid, sub) — where `cid` is the Lloyd
    * cluster (C = ⌈√N⌉ deterministic seeds, one exact-integer update
    * round, the [[ivfBuild]] machinery) and `sub` salts members of a
    * HOT cluster (size > SemCapFactor·⌈N/C⌉) into ⌈size/cap⌉ shards by
    * `vec_id mod nsplit` — the [[Dedup.minhashCandidatesSalted]]
    * convention applied to the cluster key, keeping every pairing
    * shard under the cap. Deterministic and integer-exact, so the
    * DuckDB oracle reproduces the split bit-for-bit.
    */
  def semanticClusters(e: DataFrame): DataFrame = {
    val n = e.count()
    val c = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    val cap = SemCapFactor * ((n + c - 1) / c)
    val cents = ivfTrain(e, c, 1)
    val a2 = ivfAssign(quantized(e), cents)
      .select(col("vec_id"), col("q"), col("nrm"), col("cid"))
    val sizes = a2.groupBy("cid").agg(count(lit(1)).as("csz"))
    a2.join(broadcast(sizes), "cid")
      .withColumn("sub",
        when(col("csz") <= cap, lit(0L))
          .otherwise(col("vec_id") % expr(s"(csz + ${cap - 1}) div $cap")))
      .select(col("vec_id"), col("q"), col("nrm"), col("cid"), col("sub"))
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023): the
    * third rung of the dedup ladder after exact (byte-identical) and
    * near (surface-form MinHash/SimHash) — k-means-cluster the
    * embedding space, then inside each cluster drop every vector that
    * has a LOWER-id cluster-mate with cosine ≥ [[SemTau]] (the same
    * min-id keep convention as `d_dedup_embedding`; pairs are only
    * compared WITHIN a cluster, which is the SemDeDup approximation
    * that makes corpus-scale semantic dedup tractable). Output is one
    * row per vector: (vec_id, cid, keep).
    *
    * Clustering reuses the exact-integer Lloyd machinery of the IVF
    * family ([[ivfBuild]] / [[ivfAssign]]) — deterministic seeds, one
    * update round, undivided (Σ-vector, count) centroids — so the
    * DuckDB oracle reproduces the whole pipeline bit-for-bit.
    *
    * Scale shape: two broadcast-assign passes + one C×dims partial-sum
    * shuffle (the IVF build), then a self-join SHUFFLED BY (cid, sub)
    * — C scales with the DATA (⌈√N⌉, the published SemDeDup setting,
    * keeping clusters near-constant ≈√N size) and a skewed hot cluster
    * is salted into capped shards ([[semanticClusters]]), so pair work
    * is Σ|shard|² ≤ N·cap ≈ 4·N^1.5 — never an N² all-pairs, under
    * ANY skew. PipelineSpec's scale law measures in-cluster pairs on
    * the 10× corpus against exactly this bound.
    */
  val dedupSemantic: QueryDef = QueryDef(
    "d_dedup_semantic",
    (s, dir) => {
      val a3 = semanticClusters(Tables.load(s, dir, "embeddings"))
        .localCheckpoint()
      val dup = a3.toDF("a_id", "a_q", "a_nrm", "cid", "sub")
        .join(a3.toDF("b_id", "b_q", "b_nrm", "cid", "sub"), Seq("cid", "sub"))
        .where(col("a_id") < col("b_id"))
        .where(cosine(dotL(col("a_q"), col("b_q")),
          col("a_nrm"), col("b_nrm")) >= SemTau)
        .select(col("b_id").as("vec_id")).distinct()
        .withColumn("is_dup", lit(true))
      a3.join(dup, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid").cast("long").as("cid"),
          col("is_dup").isNull.as("keep"))
    },
    Some {
      val sqd = "list_sum(list_transform(list_zip(n.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
      val met = "CAST(list_sum(list_transform(list_zip(n.q, c1.cs), " +
        "s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
      val cSql = "CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)"
      s"""WITH $quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       pc AS (SELECT $cSql AS c,
           $SemCapFactor * ((COUNT(*) + $cSql - 1) // $cSql) AS cap FROM v),
       c0 AS (SELECT vec_id AS cid, q AS cq FROM v
           WHERE vec_id < (SELECT c FROM pc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM n, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       a2 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1) x WHERE rn = 1),
       sz AS (SELECT cid, COUNT(*) AS csz FROM a2 GROUP BY cid),
       a3 AS (SELECT a2.vec_id, a2.q, a2.nrm, a2.cid,
           CASE WHEN sz.csz <= (SELECT cap FROM pc) THEN 0
                ELSE a2.vec_id % ((sz.csz + (SELECT cap FROM pc) - 1)
                  // (SELECT cap FROM pc))
           END AS sub
         FROM a2 JOIN sz USING (cid)),
       dup AS (SELECT DISTINCT b.vec_id
           FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.sub = b.sub AND a.vec_id < b.vec_id
           WHERE CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS DOUBLE)
             / SQRT(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) >= $SemTau)
       SELECT a3.vec_id, CAST(a3.cid AS BIGINT) AS cid,
         a3.vec_id NOT IN (SELECT vec_id FROM dup) AS keep
       FROM a3"""
    })

  /** Bootstrap the incremental-SemDeDup structures: train the frozen
    * quantizer on `base` and commit it WITH its train-time drift
    * baseline as a manifest tag (the [[ivfListsMaintain]] convention),
    * then commit the assigned members. The tag is what arms
    * [[semDedupRetrainIfDrifted]] — without it a drifting embedding
    * distribution silently degrades dup recall (clusters overgrow,
    * near-dups land in different cells and are never compared).
    */
  private[graft] def semDedupBootstrap(s: SparkSession, base: DataFrame,
      centsT: String, memT: String): Unit = {
    import graft.sources.Snapshots
    val cents = ivfTrain(base, cCountOf(base.count()), 1)
    Snapshots.commitOverwriteTagged(cents, centsT,
      Seq(IvfDriftBasePrefix + driftMean(quantized(base), cents)))
    Snapshots.commitOverwrite(ivfAssign(quantized(base), cents).drop("m"), memT)
    ()
  }

  /** Keep flags for an assigned batch `aB(vec_id, q, nrm, cid)` against
    * the comparison set `all` (same schema): a batch vector is a dup
    * iff some LOWER-id cluster-mate in `all` has cos ≥ τ — exactly the
    * one-shot SemDeDup predicate, shared by the catalog query and the
    * drift-recovery parity spec.
    */
  private[graft] def semBatchKeep(aB: DataFrame, all: DataFrame): DataFrame = {
    val dup = aB.toDF("b_id", "b_q", "b_nrm", "cid")
      .join(all.toDF("a_id", "a_q", "a_nrm", "cid"), Seq("cid"))
      .where(col("a_id") < col("b_id"))
      .where(cosine(dotL(col("a_q"), col("b_q")),
        col("a_nrm"), col("b_nrm")) >= SemTau)
      .select(col("b_id").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    aB.join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid").cast("long").as("cid"),
        col("is_dup").isNull.as("keep"))
  }

  /** Drift-triggered RE-TRAIN for the incremental-SemDeDup structures —
    * the same escape hatch [[ivfRetrainIfDrifted]] gives the IVF DML
    * path, closing the round-8 gap where this family shared the
    * frozen-quantizer contract but not the hatch: compares the live
    * corpus's mean integer drift against the baseline tagged at train
    * time; past `ratio` × baseline it re-trains the quantizer on the
    * live corpus, commits it with ITS new baseline, and RE-CLUSTERS the
    * members table as one clean version — after which batch dedup
    * verdicts are again those of a one-shot SemDeDup under a
    * fit quantizer (parity asserted in AnalyticsSpec).
    */
  def semDedupRetrainIfDrifted(s: SparkSession, corpus: DataFrame,
      centsT: String, memT: String, ratio: Double = 1.5): Boolean = {
    import graft.sources.Snapshots
    val live = quantized(corpus).localCheckpoint()
    val drift = driftMean(live, Snapshots.read(s, centsT))
    val base0 = Snapshots
      .versionTags(centsT, Snapshots.currentVersion(centsT))
      .collectFirst { case t if t.startsWith(IvfDriftBasePrefix) =>
        t.drop(IvfDriftBasePrefix.length).toLong }
    val fire = base0.exists(b => drift > ratio * b)
    if (fire) {
      val newCents = ivfTrain(corpus, cCountOf(corpus.count()), 1)
      Snapshots.commitOverwriteTagged(newCents, centsT,
        Seq(IvfDriftBasePrefix + driftMean(live, newCents)))
      Snapshots.commitOverwrite(ivfAssign(live, newCents).drop("m"), memT)
      ()
    }
    fire
  }

  /** INCREMENTAL SemDeDup — the production shape of [[dedupSemantic]]:
    * the corpus grows in batches, and semantic dedup of a new batch
    * must cost O(batch · cluster), never O(corpus²) and never a
    * corpus re-cluster. Structures persisted via [[graft.sources.Snapshots]]:
    * a FROZEN quantizer (centroids trained once on the base corpus —
    * the same frozen-quantizer contract as `s_knn_ivf_dml`, with
    * [[semDedupRetrainIfDrifted]] as the drift escape hatch) and a members
    * table of assigned vectors. A new batch (1) assigns to the frozen
    * centroids (broadcast, map-side), (2) joins ONLY its own clusters'
    * members (shuffle on cid; pair work Σ_c |batch_c|·|cluster_c|),
    * (3) appends exactly-once under (streamId, batchId) so replays
    * no-op ([[graft.operators.Dedup.dedupAgainstIndex]] convention, pinned
    * base version).
    *
    * Batch keep flags compare against ALL prior cluster members — kept
    * AND dropped — which is exactly the one-shot dup predicate
    * (∃ lower-id cluster-mate with cos ≥ τ), so incremental ≡ a
    * frozen-quantizer one-shot over the full corpus, and the DuckDB
    * oracle proves it: it re-trains the quantizer on the base subset,
    * assigns everything, and restricts output to batch vectors. (The
    * one-shot catalog twin additionally salts hot clusters; the
    * incremental batch join is already bounded per batch, so the salt
    * is a within-stage repartition concern, not a semantics one.)
    */
  val dedupSemanticIncremental: QueryDef = QueryDef(
    "d_dedup_semantic_incremental",
    (s, dir) => {
      import graft.sources.Snapshots
      val e = Tables.load(s, dir, "embeddings")
      val base = e.where(col("vec_id") % 10 =!= 0)
      val batch = e.where(col("vec_id") % 10 === 0)
      // CONTENT-keyed root (the ensureIndex convention applied to this
      // two-table structure): regenerated input data lands in a fresh
      // root and retrains — a path-only key would keep serving a
      // quantizer trained on the OLD corpus while the oracle retrains
      // on the new one
      val fp = Snapshots.fileFingerprint(s"$dir/embeddings.parquet")
        .replaceAll("[^A-Za-z0-9]", "").take(16)
      val root = graft.Roots.scratch + "/semdedup/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_" + fp
      val (centsT, memT) = (s"$root/cents", s"$root/members")
      if (Snapshots.currentVersion(centsT) == 0) {
        // regenerated inputs land in a fresh fingerprint root; drop
        // the superseded siblings instead of accreting trained
        // artifacts forever (advice r8 #4)
        Snapshots.gcSiblingRoots(root)
        semDedupBootstrap(s, base, centsT, memT)
      }
      // cents pinned to v1 to match the pinned members base below: a
      // drift re-train (semDedupRetrainIfDrifted) overwrites BOTH
      // tables with a new cid space, and a latest-cents read would
      // then assign batches under NEW cids while comparing against v1
      // members clustered under OLD cids (round-9 advice)
      val cents = Snapshots.readVersion(s, centsT, 1)
      val aB = ivfAssign(quantized(batch), cents).drop("m").localCheckpoint()
      Snapshots.ingestBatch(aB, memT, "d_dedup_semantic_incremental", 0L)
      // pinned base members (v1): replays and bench re-runs read the
      // same comparison set no matter how many batches landed since
      semBatchKeep(aB, Snapshots.readVersion(s, memT, 1).unionByName(aB))
    },
    Some {
      val sqd = "list_sum(list_transform(list_zip(nb.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
      val met = "CAST(list_sum(list_transform(list_zip(n.q, c1.cs), " +
        "s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
      val cSql = "CAST(CEIL(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)"
      s"""WITH $quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       nb AS (SELECT * FROM n WHERE vec_id % 10 <> 0),
       pc AS (SELECT $cSql AS c FROM nb),
       c0 AS (SELECT vec_id AS cid, q AS cq FROM nb
           WHERE vec_id < (SELECT c FROM pc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT nb.vec_id, nb.q, nb.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY nb.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM nb, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       a2 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c1.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1) x WHERE rn = 1),
       dup AS (SELECT DISTINCT b.vec_id
           FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
             AND b.vec_id % 10 = 0
           WHERE CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS DOUBLE)
             / SQRT(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) >= $SemTau)
       SELECT a2.vec_id, CAST(a2.cid AS BIGINT) AS cid,
         a2.vec_id NOT IN (SELECT vec_id FROM dup) AS keep
       FROM a2 WHERE a2.vec_id % 10 = 0"""
    })

  /** MMR diversified re-ranking (Carbonell & Goldstein 1998) — the
    * retrieval-serving step after ANY candidate generator (IVF, BM25,
    * hybrid): from each query's top-20 relevance pool, select 5
    * results greedily by Maximal Marginal Relevance
    * score(d) = λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s), λ = 0.7 —
    * relevance traded against redundancy with what's already picked,
    * so near-duplicate hits can't crowd the result page.
    *
    * Oracle-exact by the beam-search playbook: the greedy loop has a
    * FIXED round count (K = 5), so DuckDB unrolls it as K MATERIALIZED
    * CTE stages (default inlining would re-evaluate the selection
    * chain quadratically); every similarity is the usual exact-integer
    * dot + one IEEE divide, λ-blend is two IEEE multiplies + a
    * subtract on bit-identical operands, ties break on n_id — both
    * engines pick identical argmaxes every round.
    *
    * Scale shape: the ONLY corpus-sized work is the candidate pool
    * (here brute-force top-20 — at serving scale swap in the IVF
    * probe unchanged, the `s_hard_negatives` convention); the greedy
    * loop runs on localCheckpointed frames of ≤ P rows per query
    * (P² pairwise sims = 400 rows/query) — driver-free, but bounded
    * by the query batch, not the corpus.
    */
  val mmrRerank: QueryDef = {
    val K = 5
    val P = 20
    val Lam = 0.7
    QueryDef(
      "s_mmr_rerank",
      (s, dir) => {
        val v = quantized(Tables.load(s, dir, "embeddings"))
        val q = broadcast(v.where(col("vec_id") < 3).toDF("q_id", "q_q", "q_nrm"))
        val scored = q.join(v.toDF("n_id", "n_q", "n_nrm"), col("n_id") =!= col("q_id"))
          .select(col("q_id"), col("n_id"), col("n_q"), col("n_nrm"),
            cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("rel"))
        val wp = Window.partitionBy("q_id").orderBy(col("rel").desc, col("n_id"))
        val pool = scored.withColumn("rn", row_number().over(wp))
          .where(col("rn") <= P).drop("rn").localCheckpoint()
        val simmat = pool.select(col("q_id"), col("n_id").as("a_id"),
            col("n_q").as("a_q"), col("n_nrm").as("a_nrm"))
          .join(pool.select(col("q_id").as("bq"), col("n_id").as("b_id"),
            col("n_q").as("b_q"), col("n_nrm").as("b_nrm")),
            col("q_id") === col("bq") && col("a_id") =!= col("b_id"))
          .select(col("q_id"), col("a_id"), col("b_id"),
            cosine(dotL(col("a_q"), col("b_q")), col("a_nrm"), col("b_nrm")).as("ps"))
          .localCheckpoint()
        val rel = pool.select("q_id", "n_id", "rel")
        var sel = rel.withColumn("rn", row_number().over(wp)).where(col("rn") === 1)
          .select(col("q_id"), col("n_id"), lit(1L).as("round"), col("rel"))
          .localCheckpoint()
        for (r <- 2 to K) {
          val cand = rel.join(sel.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_anti")
          val ms = simmat
            .join(sel.select(col("q_id").as("sq"), col("n_id").as("s_id")),
              col("q_id") === col("sq") && col("b_id") === col("s_id"))
            .groupBy(col("q_id"), col("a_id")).agg(max(col("ps")).as("ms"))
          val pick = cand
            .join(ms, cand("q_id") === ms("q_id") && col("n_id") === col("a_id"))
            .select(cand("q_id"), col("n_id"), col("rel"),
              (lit(Lam) * col("rel") - lit(1 - Lam) * col("ms")).as("sc"))
            .withColumn("rn", row_number().over(
              Window.partitionBy("q_id").orderBy(col("sc").desc, col("n_id"))))
            .where(col("rn") === 1)
            .select(col("q_id"), col("n_id"), lit(r.toLong).as("round"), col("rel"))
          sel = sel.union(pick).localCheckpoint()
        }
        sel
      },
      Some {
        val rounds = (2 to K).map { r =>
          val prev = if (r == 2) "s1" else s"sel${r - 1}"
          s"""cand$r AS MATERIALIZED (SELECT rl.* FROM rl
                WHERE NOT EXISTS (SELECT 1 FROM $prev s
                  WHERE s.q_id = rl.q_id AND s.n_id = rl.n_id)),
              ms$r AS MATERIALIZED (SELECT sm.q_id, sm.a_id, MAX(sm.ps) AS ms
                FROM sm JOIN $prev s ON sm.q_id = s.q_id AND sm.b_id = s.n_id
                GROUP BY 1, 2),
              p$r AS MATERIALIZED (SELECT q_id, n_id, CAST($r AS BIGINT) AS round, rel
                FROM (SELECT c.q_id, c.n_id, c.rel,
                    $Lam * c.rel - ${1 - Lam} * m.ms AS sc,
                    ROW_NUMBER() OVER (PARTITION BY c.q_id
                      ORDER BY $Lam * c.rel - ${1 - Lam} * m.ms DESC, c.n_id) AS rn
                  FROM cand$r c JOIN ms$r m
                    ON c.q_id = m.q_id AND c.n_id = m.a_id) t
                WHERE rn = 1),
              sel$r AS MATERIALIZED (SELECT * FROM $prev
                UNION ALL SELECT * FROM p$r)"""
        }.mkString(",\n")
        s"""WITH v AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
              FROM embeddings),
            n AS (SELECT vec_id, q,
                CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
            sc0 AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id, b.q AS n_q, b.nrm AS n_nrm,
                CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
                a.nrm AS na
              FROM n a JOIN n b ON a.vec_id < 3 AND b.vec_id <> a.vec_id),
            pool AS MATERIALIZED (SELECT q_id, n_id, n_q, n_nrm, rel FROM (
                SELECT q_id, n_id, n_q, n_nrm,
                  CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(n_nrm AS DOUBLE)) AS rel,
                  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                    CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(n_nrm AS DOUBLE)) DESC,
                    n_id) AS rn
                FROM sc0) t WHERE rn <= $P),
            sm AS MATERIALIZED (SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
                CAST(list_sum(list_transform(list_zip(a.n_q, b.n_q), s -> s[1]*s[2])) AS DOUBLE)
                  / SQRT(CAST(a.n_nrm AS DOUBLE) * CAST(b.n_nrm AS DOUBLE)) AS ps
              FROM pool a JOIN pool b ON a.q_id = b.q_id AND a.n_id <> b.n_id),
            rl AS MATERIALIZED (SELECT q_id, n_id, rel FROM pool),
            s1 AS MATERIALIZED (SELECT q_id, n_id, CAST(1 AS BIGINT) AS round, rel FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                  ORDER BY rel DESC, n_id) AS rn FROM rl) t WHERE rn = 1),
            $rounds
            SELECT q_id, n_id, round, rel FROM sel$K"""
      })
  }

  /** Nearest-class-mean (Rocchio) classifier eval — the cheap,
    * training-free embedding-quality baseline next to `s_knn_purity`'s
    * kNN agreement: one prototype per label (the EXACT integer class
    * mean, kept un-divided as (Σ-vector, n) — the Lloyd-step
    * convention), every vector assigned to its nearest prototype by
    * the ivf metric Σ(n·x − s)²/n² (numerator exact ≤ 2^53 at these
    * magnitudes, one IEEE divide, label tie-break), reported as the
    * confusion matrix (true × predicted counts) — the artifact an
    * embedding-eval dashboard renders directly.
    *
    * Scale shape: prototypes are a per-(label, dim) integer-sum
    * aggregate (≤ labels × 64 rows); classification is corpus ×
    * broadcast-prototypes — one pass, no corpus shuffle; the argmin
    * window partitions by vec_id over #labels rows each; output =
    * labels² rows.
    */
  /** Per-vector nearest-class-mean predictions (vec_id, label,
    * plabel) — the shared classifier core of [[nearestCentroid]] and
    * [[labelKappa]]: prototype = exact integer class mean kept
    * un-divided as (Σ-vector, n), assignment by the ivf metric with
    * label tie-break. ONE copy so the kappa report can never
    * desynchronize from the confusion matrix it summarizes.
    */
  private def centroidPredictions(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        quantize(col("embedding")).as("q"))
    val sums = v.select(col("label"), posexplode(col("q"))).toDF("label", "dim", "x")
      .groupBy("label", "dim").agg(sum(col("x")).as("sv"))
      .groupBy("label").agg(transform(
        array_sort(collect_list(struct(col("dim"), col("sv")))),
        x => x.getField("sv")).as("cs"))
    val protos = broadcast(
      sums.join(v.groupBy("label").agg(count(lit(1)).as("cn")), "label")
        .select(col("label").as("plabel"), col("cs"), col("cn")))
    val w = Window.partitionBy("vec_id").orderBy(col("m"), col("plabel"))
    v.crossJoin(protos)
      .select(col("vec_id"), col("label"), col("plabel"),
        (graft.functions.Native.sqDistScaled(col("q"), col("cs"), col("cn"))
          .cast("double") / (col("cn") * col("cn")).cast("double")).as("m"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("vec_id", "label", "plabel")
  }

  /** The oracle CTE chain of [[centroidPredictions]], ending in
    * `pred(vec_id, label, plabel)` — shared by both consumers' SQL.
    */
  private def centroidPredSqlCtes: String =
    """v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
              list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
            FROM embeddings),
            sums AS (SELECT label, i AS dim, CAST(SUM(q[i]) AS BIGINT) AS sv
              FROM v CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
            cs AS (SELECT label, list(sv ORDER BY dim) AS cs FROM sums GROUP BY label),
            proto AS (SELECT cs.label AS plabel, cs.cs, c.cn
              FROM cs JOIN (SELECT label, COUNT(*) AS cn FROM v GROUP BY label) c
                ON cs.label = c.label),
            scored AS (SELECT v.vec_id, v.label, p.plabel,
                CAST(list_sum(list_transform(list_zip(v.q, p.cs),
                  z -> (p.cn * z[1] - z[2]) * (p.cn * z[1] - z[2]))) AS DOUBLE)
                  / CAST(p.cn * p.cn AS DOUBLE) AS m
              FROM v CROSS JOIN proto p),
            pred AS (SELECT vec_id, label, plabel FROM (
                SELECT vec_id, label, plabel,
                  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY m, plabel) AS rn
                FROM scored) a WHERE rn = 1)"""

  val nearestCentroid: QueryDef = QueryDef(
    "s_nearest_centroid",
    (s, dir) => centroidPredictions(s, dir)
      .groupBy(col("label").as("true_label"), col("plabel").as("pred_label"))
      .agg(count(lit(1)).as("n")),
    Some(s"""WITH $centroidPredSqlCtes
            SELECT label AS true_label, plabel AS pred_label, COUNT(*) AS n
            FROM pred GROUP BY 1, 2"""))

  /** Triangle count + global clustering coefficient over the
    * PERSISTED kNN graph — the structural-health diagnostic of a
    * similarity graph (a healthy kNN graph over clustered data is
    * triangle-dense; a near-random one is not), next to
    * `s_graph_pagerank`'s centrality. Standard ordered-vertex
    * two-join count: undirected distinct edges with a < b, a triangle
    * is (a,b) ⋈ (b,c) ⋈ (a,c) — each counted exactly once; global
    * coefficient = 3·T / wedges with wedges = Σ d(v)·(d(v)−1)/2, all
    * exact integers (the one DIV is fixed-point ×1000).
    *
    * Scale shape: the edge table is N·K rows (bounded out-degree K),
    * so the path join's fanout is ≤ K per vertex — the kNN graph is
    * exactly the graph class where the naive two-join IS the scalable
    * plan (a power-law graph would order vertices by degree first);
    * two shuffles on vertex keys, output is one row.
    */
  val graphTriangles: QueryDef = QueryDef(
    "s_graph_triangles",
    (s, dir) => {
      val g = knnGraphTable(s, dir)
      val e = g.select(least(col("g_src"), col("g_dst")).as("a"),
          greatest(col("g_src"), col("g_dst")).as("b"))
        .where(col("a") =!= col("b")).distinct().localCheckpoint()
      val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val wedges = deg.agg(sum(expr("(d * (d - 1)) div 2")).as("wedges"),
        count(lit(1)).as("n_nodes"))
      val tri = e.toDF("a", "b").join(e.toDF("b", "c"), "b")
        .join(e.toDF("a", "c"), Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
      e.agg(count(lit(1)).as("n_edges")).crossJoin(wedges).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"), col("wedges"),
          expr("(n_triangles * 3000) div greatest(wedges, 1)").as("global_cc_x1000"))
    },
    Some(s"""WITH $graphSqlCtes,
         e AS (SELECT DISTINCT LEAST(g_src, g_dst) AS a, GREATEST(g_src, g_dst) AS b
             FROM graph WHERE g_src <> g_dst),
         deg AS (SELECT v, COUNT(*) AS d FROM (
             SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) u GROUP BY v),
         w AS (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS wedges,
             COUNT(*) AS n_nodes FROM deg),
         t AS (SELECT COUNT(*) AS n_triangles FROM e e1
             JOIN e e2 ON e1.b = e2.a
             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         ne AS (SELECT COUNT(*) AS n_edges FROM e)
         SELECT n_nodes, n_edges, n_triangles, wedges,
           (n_triangles * 3000) // GREATEST(wedges, 1) AS global_cc_x1000
         FROM ne, w, t"""))

  /** Mutual-kNN clustering — the standard density-aware grouping of an
    * embedding corpus WITHOUT choosing a cluster count: keep only
    * edges where BOTH endpoints rank each other in their top-K (a
    * mutual edge needs bilateral agreement, which strips the hub
    * vertices that make raw kNN graphs into one giant blob), then take
    * connected components of the surviving graph. Vertices with no
    * mutual edge are singletons. Output is the cluster-size histogram
    * — the corpus-structure fingerprint a curation run records.
    *
    * Scale shape: the mutuality filter is ONE self-join of the
    * persisted N·K edge table on its own partitioning key; components
    * run on the surviving subgraph via the size-adaptive
    * [[graft.operators.Dedup.connectedComponents]] (min-label rounds,
    * one shuffle each, at scale); the histogram is two tiny
    * aggregates. Nothing touches raw vectors.
    */
  val mutualComponents: QueryDef = QueryDef(
    "s_knn_mutual_components",
    (s, dir) => {
      val g = knnGraphTable(s, dir)
      val mutual = g.select(col("g_src"), col("g_dst"))
        .join(g.select(col("g_dst").as("g_src"), col("g_src").as("g_dst")),
          Seq("g_src", "g_dst"))
        .where(col("g_src") =!= col("g_dst"))
        .select(col("g_src").as("src"), col("g_dst").as("dst"))
        .localCheckpoint()
      val touched = mutual.select(col("src").as("v")).distinct()
      val labels = graft.operators.Dedup.connectedComponents(touched, mutual)
      val all = Tables.load(s, dir, "embeddings").select(col("vec_id"))
      val singletons = all.join(touched.toDF("vec_id"), Seq("vec_id"), "left_anti")
        .select(col("vec_id").as("v"), col("vec_id").as("label"))
      labels.unionAll(singletons)
        .groupBy("label").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
    },
    Some(s"""WITH RECURSIVE $graphSqlCtes,
         m AS (SELECT g.g_src AS src, g.g_dst AS dst FROM graph g
             JOIN graph r ON g.g_src = r.g_dst AND g.g_dst = r.g_src
             WHERE g.g_src <> g.g_dst),
         reach(src, node) AS (
           SELECT vec_id AS src, vec_id AS node FROM embeddings
           UNION
           SELECT r.src, m.dst FROM reach r JOIN m ON r.node = m.src),
         canon AS (SELECT src AS v, MIN(node) AS label FROM reach GROUP BY src),
         sz AS (SELECT label, COUNT(*) AS cluster_size FROM canon GROUP BY label)
         SELECT cluster_size, COUNT(*) AS n_clusters FROM sz GROUP BY 1"""))

  /** Embedding-table quality audit — the pre-flight QC every vector
    * corpus runs before building ANN structures: per label, vector
    * count, degenerate (all-zero) vectors, and the distribution of
    * quantized squared norms (sum/min/max — a collapsed or exploding
    * norm band is the classic symptom of a broken encoder or a
    * mis-scaled ingest). All exact integers on the shared ×1000
    * quantization grid, so both engines agree bit-for-bit.
    *
    * Scale shape: one narrow map pass computing per-vector norms, one
    * #labels-row aggregate; no joins, no corpus shuffle beyond the
    * label key.
    */
  val embeddingAudit: QueryDef = QueryDef(
    "s_embedding_audit",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      e.select(col("label").cast("long").as("label"),
          quantize(col("embedding")).as("q"))
        .withColumn("nrm", dotL(col("q"), col("q")))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("nrm") === 0, 1L).otherwise(0L)).as("n_zero_vecs"),
          sum(col("nrm")).as("sum_nrm"),
          min(col("nrm")).as("min_nrm"), max(col("nrm")).as("max_nrm"))
        .withColumn("mean_nrm", expr("sum_nrm div n_vecs"))
    },
    Some("""WITH v AS (SELECT CAST(label AS BIGINT) AS label,
              CAST(list_sum(list_transform(embedding,
                x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)
                     * CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT))) AS BIGINT)
                AS nrm
            FROM embeddings)
            SELECT label, COUNT(*) AS n_vecs,
              CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
              CAST(SUM(nrm) AS BIGINT) AS sum_nrm,
              MIN(nrm) AS min_nrm, MAX(nrm) AS max_nrm,
              CAST(SUM(nrm) AS BIGINT) // COUNT(*) AS mean_nrm
            FROM v GROUP BY 1"""))

  /** Cohen's KAPPA over the nearest-class-mean predictions — the
    * chance-corrected agreement summary of [[nearestCentroid]]'s
    * confusion matrix (accuracy alone rewards majority-class
    * collapse; kappa subtracts the agreement the marginals produce by
    * chance). Everything stays exact integers: with diag = Σ
    * correct, chance = Σ_l row_l·col_l, kappa = (diag·n − chance) /
    * (n² − chance) ships ×1000 by integer DIV, accuracy alongside.
    *
    * Scale shape: identical to [[nearestCentroid]] (prototype
    * aggregate + corpus × broadcast-prototypes pass); the kappa fold
    * is labels² rows → one row.
    */
  val labelKappa: QueryDef = QueryDef(
    "s_label_kappa",
    (s, dir) => {
      val conf = centroidPredictions(s, dir)
        .groupBy("label", "plabel").agg(count(lit(1)).as("c"))
      val marg = conf.groupBy("label").agg(sum(col("c")).as("row_n"))
        .join(conf.groupBy("plabel").agg(sum(col("c")).as("col_n"))
          .withColumnRenamed("plabel", "label"), Seq("label"), "full")
        .select(coalesce(col("row_n"), lit(0L)).as("row_n"),
          coalesce(col("col_n"), lit(0L)).as("col_n"))
        .agg(sum(col("row_n") * col("col_n")).as("chance"),
          sum(col("row_n")).as("n"))
      conf.agg(sum(when(col("label") === col("plabel"), col("c")).otherwise(0L))
          .as("diag"), sum(col("c")).as("n2"))
        .crossJoin(marg)
        .select(col("n"), col("diag").as("n_agree"),
          expr("(n_agree * 1000) div n").as("accuracy_x1000"),
          // chance == n*n (single predicted+true class): kappa is 0/0
          // undefined -> NULL, not a crash
          expr("""case when n * n > chance
            then ((n_agree * n - chance) * 1000) div (n * n - chance) end""")
            .as("kappa_x1000"))
    },
    Some(s"""WITH $centroidPredSqlCtes,
            conf AS (SELECT label, plabel, COUNT(*) AS c FROM pred
              GROUP BY 1, 2),
            rm AS (SELECT label, CAST(SUM(c) AS BIGINT) AS row_n FROM conf GROUP BY 1),
            cm AS (SELECT plabel AS label, CAST(SUM(c) AS BIGINT) AS col_n
              FROM conf GROUP BY 1),
            mg AS (SELECT CAST(SUM(COALESCE(row_n, 0) * COALESCE(col_n, 0)) AS BIGINT)
                AS chance, CAST(SUM(COALESCE(row_n, 0)) AS BIGINT) AS n
              FROM rm FULL JOIN cm USING (label)),
            dg AS (SELECT CAST(SUM(CASE WHEN label = plabel THEN c ELSE 0 END) AS BIGINT)
                AS n_agree FROM conf)
            SELECT mg.n, dg.n_agree,
              (dg.n_agree * 1000) // mg.n AS accuracy_x1000,
              CASE WHEN mg.n * mg.n > mg.chance THEN
                ((dg.n_agree * mg.n - mg.chance) * 1000) // (mg.n * mg.n - mg.chance)
              END AS kappa_x1000
            FROM dg, mg"""))

  /** Ranked-RETRIEVAL evaluation (P@5, MRR, hit@10) of the
    * brute-force cosine ranking against label relevance — the
    * standard IR report card next to [[annRecall]]'s
    * approximate-vs-exact recall (there the exact ranking is the
    * ground truth; here the exact ranking is the SYSTEM under eval
    * and labels are the truth). Per query vector (vec_id < 10): the
    * corpus ranked by (cosine desc, id), relevance = same label;
    * precision@5 and the reciprocal rank of the first relevant hit
    * within the top-10 cutoff ship ×1000 as exact integers (1000 div
    * rank — engine-identical).
    *
    * Scale shape: query-set broadcast × corpus scan (the bruteforce
    * baseline's shape), one per-query top-10 window
    * (WindowGroupLimit), metrics fold 10 rows per query → 10 rows
    * total.
    */
  val evalRetrieval: QueryDef = QueryDef(
    "s_eval_retrieval",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          quantize(col("embedding")).as("q"))
        .withColumn("nrm", dotL(col("q"), col("q")))
      val qs = broadcast(e.where(col("vec_id") < 10)
        .toDF("q_id", "q_label", "q_q", "q_nrm"))
      val scored = qs.join(e.toDF("n_id", "n_label", "n_q", "n_nrm"),
          col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("q_label"), col("n_label"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"),
          col("n_id"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 10)
        .withColumn("rel", (col("n_label") === col("q_label")).cast("long"))
        .groupBy("q_id")
        .agg(sum(when(col("rn") <= 5, col("rel")).otherwise(0L)).as("n_rel_at5"),
          sum(col("rel")).as("n_rel_at10"),
          min(when(col("rel") === 1L, col("rn"))).as("first_rel"))
        .select(col("q_id"), col("n_rel_at5"),
          expr("(n_rel_at5 * 1000) div 5").as("p_at5_x1000"),
          (col("n_rel_at10") > 0).as("hit_at10"),
          coalesce(expr("1000 div first_rel"), lit(0L)).as("rr_x1000"))
    },
    Some("""WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
              list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
            FROM embeddings),
            n AS (SELECT vec_id, label, q,
              CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
            p AS (SELECT a.vec_id AS q_id, a.label AS q_label,
                b.label AS n_label, b.vec_id AS n_id,
                CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
                a.nrm AS na, b.nrm AS nb
              FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
            sc AS (SELECT q_id, q_label, n_label, n_id,
                CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim
              FROM p),
            r AS (SELECT q_id, q_label, n_label,
                CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rn
              FROM sc),
            t AS (SELECT q_id, rn, CAST(n_label = q_label AS BIGINT) AS rel
              FROM r WHERE rn <= 10),
            m AS (SELECT q_id,
                CAST(SUM(CASE WHEN rn <= 5 THEN rel ELSE 0 END) AS BIGINT) AS n_rel_at5,
                CAST(SUM(rel) AS BIGINT) AS n_rel_at10,
                MIN(CASE WHEN rel = 1 THEN rn END) AS first_rel
              FROM t GROUP BY 1)
            SELECT q_id, n_rel_at5, (n_rel_at5 * 1000) // 5 AS p_at5_x1000,
              n_rel_at10 > 0 AS hit_at10,
              COALESCE(1000 // first_rel, 0) AS rr_x1000
            FROM m"""))

  /** COMMUNITY detection via synchronous label propagation (3 rounds)
    * over the persisted kNN graph — the community tier of the graph
    * family (components = connectivity, triangles = local density,
    * PageRank = centrality; LPA = mesoscale groups INSIDE a
    * component). Deterministic throughout: labels init to vec_id,
    * each round every node adopts its neighbors' most frequent label
    * with (count desc, label asc) ties, rounds fixed at 3 so the
    * DuckDB oracle unrolls them exactly (the `s_knn_beam` convention).
    * Output = the top-20 communities by size.
    *
    * Scale shape: per round ONE equi-join of the symmetrized edge
    * list against the (node, label) frame + one (node, label) count
    * shuffle — the PageRank iteration profile with labels instead of
    * ranks; state is one label per node, lineage cut per round.
    */
  val graphCommunities: QueryDef = QueryDef(
    "s_graph_communities",
    (s, dir) => {
      val g = knnGraphTable(s, dir)
      val e = g.select(col("g_src").as("src"), col("g_dst").as("dst"))
        .unionAll(g.select(col("g_dst").as("src"), col("g_src").as("dst")))
        .where(col("src") =!= col("dst")).distinct().localCheckpoint()
      var labels = e.select(col("src").as("v")).distinct()
        .select(col("v"), col("v").as("lbl"))
      for (_ <- 1 to 3) {
        val w = Window.partitionBy("src").orderBy(col("cnt").desc, col("lbl"))
        labels = e.join(labels.withColumnRenamed("v", "dst"), "dst")
          .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("src").as("v"), col("lbl"))
          .localCheckpoint()
      }
      val wTop = Window.orderBy(col("n_members").desc, col("community"))
      labels.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_members"))
        .withColumn("rk", row_number().over(wTop).cast("long"))
        .where(col("rk") <= 20)
        .select("rk", "community", "n_members")
    },
    Some(s"""WITH $graphSqlCtes,
         e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
             SELECT g_src AS src, g_dst AS dst FROM graph
             UNION ALL SELECT g_dst, g_src FROM graph) u WHERE src <> dst),
         l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS lbl FROM e),
         c1 AS (SELECT e.src, l.lbl, COUNT(*) AS cnt FROM e
             JOIN l0 l ON e.dst = l.v GROUP BY 1, 2),
         l1 AS MATERIALIZED (SELECT src AS v, lbl FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY cnt DESC, lbl) AS rn
           FROM c1) t WHERE rn = 1),
         c2 AS (SELECT e.src, l.lbl, COUNT(*) AS cnt FROM e
             JOIN l1 l ON e.dst = l.v GROUP BY 1, 2),
         l2 AS MATERIALIZED (SELECT src AS v, lbl FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY cnt DESC, lbl) AS rn
           FROM c2) t WHERE rn = 1),
         c3 AS (SELECT e.src, l.lbl, COUNT(*) AS cnt FROM e
             JOIN l2 l ON e.dst = l.v GROUP BY 1, 2),
         l3 AS MATERIALIZED (SELECT src AS v, lbl FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY cnt DESC, lbl) AS rn
           FROM c3) t WHERE rn = 1),
         f AS (SELECT lbl AS community, COUNT(*) AS n_members FROM l3 GROUP BY 1)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_members DESC, community) AS BIGINT)
             AS rk, community, n_members
         FROM f QUALIFY rk <= 20"""))

  /** COST-ROUTED ANN serving — the System R idea applied to the
    * similarity path: the engine picks the physical ANN strategy from
    * a cost model instead of making the caller choose. Per query set,
    * exact brute force costs ~N comparisons per query with zero index
    * cost; the IVF probe reads ~NProbe·N/C ≈ NProbe·√N but carries
    * the index build/serve machinery. Below `RouteThreshold` corpus
    * rows the scan is cheaper than the machinery — route brute force
    * (and skip even touching the index); above it, serve from the
    * persisted partition-pruned lists. The routing predicate is ONE
    * driver-side metadata count (parquet footers), deterministic per
    * dataset, and ships in the output (`path`) so the plan choice is
    * itself oracle-audited: the DuckDB twin derives the same
    * predicate from COUNT(*) and gates two full CTE branches with
    * complementary WHEREs — at sf0.001/0.01 the hash proves the brute
    * branch fired, at sf0.1 the IVF branch.
    *
    * Scale shape: whichever branch fires has its own audited scale
    * shape (`s_knn_bruteforce` / `s_knn_ivf`); the router adds one
    * footer count. This is the serving entry a 100 TB deployment
    * would actually expose — callers ask for neighbors, not for
    * index implementations.
    */
  val knnRouted: QueryDef = {
    val RouteThreshold = 1000L
    QueryDef(
      "s_knn_routed",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val n = e.count() // parquet footer metadata count — driver-cheap
        if (n <= RouteThreshold) {
          val v = quantized(e)
          val q = broadcast(v.where(col("vec_id") < 5).toDF("q_id", "q_q", "q_nrm"))
          val scored = q.join(v.toDF("n_id", "n_q", "n_nrm"), col("n_id") =!= col("q_id"))
            .select(col("q_id"), col("n_id"),
              cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
          val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
          scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
            .select(lit("brute").as("path"), col("q_id"), col("n_id"), col("sim"))
        } else {
          knnIvf.fn(s, dir).select(lit("ivf").as("path"), col("q_id"),
            col("n_id"), col("sim"))
        }
      },
      Some(s"""WITH $ivfServeCtes,
         cnt AS (SELECT COUNT(*) AS nn FROM embeddings),
         bp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
               CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
               a.nrm AS na, b.nrm AS nb
             FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         bs AS (SELECT q_id, n_id,
               CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM bp),
         bt AS (SELECT q_id, n_id, sim FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
             FROM bs) x WHERE rn <= 5),
         it AS (SELECT q_id, n_id, sim FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
             FROM sc) x WHERE rn <= 5)
         SELECT 'brute' AS path, q_id, n_id, sim FROM bt
           WHERE (SELECT nn FROM cnt) <= $RouteThreshold
         UNION ALL
         SELECT 'ivf' AS path, q_id, n_id, sim FROM it
           WHERE (SELECT nn FROM cnt) > $RouteThreshold"""))
  }

  /** Simplified SILHOUETTE — clustering-quality eval of the IVF
    * quantizer (purity grades labels, drift trends the fit over time;
    * this grades the GEOMETRY at a point in time): per vector,
    * a = metric to its own centroid, b = metric to the second-nearest,
    * s = (b − a) / max(a, b) ∈ [0, 1] (simplified silhouette — the
    * classic centroid-based surrogate for the O(n²) full form), then
    * the per-cluster mean. A cluster whose mean is near 0 earns no
    * probe pruning: its vectors sit as close to a neighbor centroid as
    * their own, exactly where IVF recall leaks.
    *
    * Portability: both metrics are the exact-integer [[ivfMetric]]
    * numerators over one IEEE divide; s is two IEEE ops on identical
    * operands, floored to ×10⁶ fixed point BEFORE summation so the
    * per-cluster mean is an exact integer in both engines.
    *
    * Scale shape: one corpus × broadcast-centroids pass (the
    * assignment shape — rn ≤ 2 instead of rn = 1), one C-group
    * aggregate. Nothing new beyond what every IVF build already pays.
    */
  val silhouette: QueryDef = QueryDef(
    "s_silhouette",
    (s, dir) => {
      val (cents, _, _) = ivfIndex(s, dir)
      val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
      val ranked = quantized(Tables.load(s, dir, "embeddings"))
        .crossJoin(cents)
        .select(col("vec_id"), col("cid"), ivfMetric.as("m"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") <= 2)
      val a = ranked.where(col("rn") === 1).select(col("vec_id"), col("cid"), col("m").as("a"))
      val b = ranked.where(col("rn") === 2).select(col("vec_id"), col("m").as("b"))
      a.join(b, Seq("vec_id"))
        .select(col("cid"),
          // nullif guard: a = b = 0 (duplicate centroids) yields NULL
          // and drops from the mean identically in both engines
          expr("cast(floor(((b - a) / nullif(greatest(a, b), 0.0d)) * 1000000.0) as long)").as("sil"))
        .groupBy("cid").agg(count(lit(1)).as("n_vecs"),
          expr("sum(sil) div count(1)").as("mean_sil_x1e6"))
        .select(col("cid").cast("long").as("cid"), col("n_vecs"), col("mean_sil_x1e6"))
    },
    Some {
      val sqd = "list_sum(list_transform(list_zip(n.q, c0.cq), s -> (s[1]-s[2])*(s[1]-s[2])))"
      val met = "CAST(list_sum(list_transform(list_zip(n.q, c1.cs), " +
        "s -> (c1.cn*s[1]-s[2])*(c1.cn*s[1]-s[2]))) AS DOUBLE) / (c1.cn*c1.cn)"
      s"""WITH $quantizedSql,
       n AS (SELECT vec_id, q,
           CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
       $ivpcSql,
       c0 AS (SELECT vec_id AS cid, q AS cq FROM v WHERE vec_id < (SELECT c FROM ivpc)),
       a1 AS (SELECT vec_id, q, nrm, cid FROM (
           SELECT n.vec_id, n.q, n.nrm, c0.cid,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $sqd, c0.cid) AS rn
           FROM n, c0) x WHERE rn = 1),
       ex AS (SELECT cid, unnest(q) AS val, unnest(range(0, 64)) AS dim FROM a1),
       c1 AS (SELECT s.cid, list(s.sv ORDER BY s.dim) AS cs, MAX(c.cn) AS cn
           FROM (SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS sv FROM ex GROUP BY cid, dim) s
           JOIN (SELECT cid, COUNT(*) AS cn FROM a1 GROUP BY cid) c USING (cid)
           GROUP BY s.cid),
       rk AS (SELECT vec_id, cid, m, rn FROM (
           SELECT n.vec_id, c1.cid, $met AS m,
             ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY $met, c1.cid) AS rn
           FROM n, c1) x WHERE rn <= 2),
       ab AS (SELECT a.cid,
             CAST(FLOOR(((b.m - a.m) / NULLIF(GREATEST(a.m, b.m), 0.0)) * 1000000.0) AS BIGINT) AS sil
           FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2)
       SELECT CAST(cid AS BIGINT) AS cid, COUNT(*) AS n_vecs,
         CAST(SUM(sil) AS BIGINT) // COUNT(*) AS mean_sil_x1e6
       FROM ab GROUP BY 1"""
    })

  /** LABEL-CENTROID STABILITY audit — does each class mean hold up
    * across independent halves of the corpus? Per label, the cosine
    * between the SUM vectors of even- and odd-id members (a mean
    * direction is scale-invariant, so the never-divided integer sums
    * compare exactly: int dot + one IEEE sqrt/divide). Low stability
    * for a label means its embedding region is noise or the label is
    * incoherent — the class-conditional twin of `s_knn_ivf_drift`
    * (which trends the unconditional distribution against a frozen
    * quantizer).
    *
    * Scale shape: one explode → (label, half, dim) partial-sum shuffle
    * (≤ labels × 2 × dims cells — KB at any corpus size), then
    * per-label arithmetic on the 10-row result. Nothing corpus-sized
    * survives the first aggregate.
    */
  val labelCentroidDrift: QueryDef = QueryDef(
    "s_label_centroid_drift",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val parts = quantized(e)
        .join(e.select(col("vec_id"), col("label").cast("long").as("label")), Seq("vec_id"))
        .select(col("label"), (col("vec_id") % 2 === 0).as("even"),
          posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy("label", "even", "dim").agg(sum(col("x")).as("sv"))
        .groupBy("label", "even")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("sv")))),
          x => x.getField("sv")).as("sum_q"), count(lit(1)).as("n_dims"))
      val ev = parts.where(col("even")).select(col("label"), col("sum_q").as("qe"))
      val od = parts.where(!col("even")).select(col("label"), col("sum_q").as("qo"))
      val cnt = e.groupBy(col("label").cast("long").as("label"))
        .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_even"),
          sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_odd"))
      ev.join(od, Seq("label")).join(cnt, Seq("label"))
        .select(col("label"), col("n_even"), col("n_odd"),
          cosine(dotL(col("qe"), col("qo")),
            dotL(col("qe"), col("qe")), dotL(col("qo"), col("qo"))).as("stability"))
    },
    Some(s"""WITH $quantizedSql,
         vl AS (SELECT v.vec_id, v.q, e.label, v.vec_id % 2 = 0 AS even
             FROM v JOIN embeddings e ON e.vec_id = v.vec_id),
         ex AS (SELECT label, even, unnest(q) AS x, unnest(range(0, 64)) AS dim FROM vl),
         sv AS (SELECT label, even, dim, CAST(SUM(x) AS BIGINT) AS sv
             FROM ex GROUP BY 1, 2, 3),
         sq AS (SELECT label, even, list(sv ORDER BY dim) AS sum_q
             FROM sv GROUP BY 1, 2),
         cnt AS (SELECT CAST(label AS BIGINT) AS label,
             CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
             CAST(SUM(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
           FROM embeddings GROUP BY 1),
         j AS (SELECT e.label, e.sum_q AS qe, o.sum_q AS qo
             FROM sq e JOIN sq o ON e.label = o.label AND e.even AND NOT o.even)
         SELECT CAST(j.label AS BIGINT) AS label, cnt.n_even, cnt.n_odd,
           CAST(list_sum(list_transform(list_zip(qe, qo), s -> s[1]*s[2])) AS DOUBLE)
             / SQRT(CAST(list_sum(list_transform(qe, x -> x*x)) AS DOUBLE)
               * CAST(list_sum(list_transform(qo, x -> x*x)) AS DOUBLE)) AS stability
         FROM j JOIN cnt ON cnt.label = CAST(j.label AS BIGINT)"""))

  /** §2.2 row 27w — top PRINCIPAL COMPONENT of the embedding table by
    * fixed-point POWER ITERATION: the dimensionality-reduction /
    * whitening pre-read (which directions carry the corpus variance —
    * the decision input for Matryoshka truncation next to row 27s and
    * for PCA'd PQ codebooks). All arithmetic is EXACT integers so both
    * engines agree bit-for-bit: the 64×64 centered scatter matrix is
    * M = n·Σxxᵀ − SSᵀ over the ×1000-quantized vectors (one map-side
    * aggregate — the only corpus-sized pass), then 3 power-iteration
    * rounds v ← ⌊(M·v)·1000 / max|M·v|⌋ from the all-ones start run
    * entirely on 64-row / 4096-row frames. Magnitude audit at test
    * SFs: |M| ≤ n²·q²_max ≈ 6.4·10¹³, |M·v| ≤ 64·|M|·1000 ≈ 4·10¹⁸ <
    * 2⁶³; at 100 TB corpus sizes the scatter aggregate switches to
    * decimal(38,0) (the checksum convention) — the iteration frames
    * stay 64-row regardless.
    *
    * Scale shape: ONE compiled aggregate pass over the corpus
    * accumulates Σxxᵀ, Σx and n into a single flat buffer
    * ([[graft.functions.VectorScatterAgg]] — mergeable, so the only
    * exchange carries ONE 4161-long partial state per task; the HOF
    * form that inlined 4096 structs per row was interpreted and
    * 2.7× slower, and the round-10 self-join shuffled the corpus);
    * every subsequent step expands the 1-row buffer to the 4096-cell
    * frame — never a second corpus pass, never a driver-side matrix
    * from collect.
    */
  /** The 64×64 centered scatter matrix M = n·Σxxᵀ − SSᵀ over the
    * ×1000-quantized embedding table — ONE compiled mergeable
    * aggregate pass (zero corpus shuffles), shared by [[embeddingPca]]
    * and [[embeddingVariance]].
    */
  private def scatterFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val v = quantized(Tables.load(s, dir, "embeddings"))
    // flat [g row-major (4096), s (64), n] buffer from one pass
    val mom = v.agg(graft.functions.Sketches.vectorScatter(col("q"), 64).as("sc"))
      .localCheckpoint()
      // a global TypedImperativeAggregate always emits ONE buffer row —
      // on an EMPTY corpus that row is all zeros (n = 0) and would
      // materialize 4096 zero-valued cells where the oracle's CTEs (and
      // the pre-aggregate Spark path) produce zero rows. Engine parity
      // on degenerate inputs: no vectors → no scatter cells.
      .where(expr("element_at(sc, 4161)") > 0)
    mom.select(posexplode(expr("slice(sc, 1, 4096)")).as(Seq("idx", "gg")),
        col("sc"))
      .select(expr("cast(idx div 64 as int)").as("j"),
        expr("cast(idx % 64 as int)").as("k"),
        (expr("element_at(sc, 4161)") * col("gg") -
          expr("element_at(sc, cast(4097 + idx div 64 as int))") *
          expr("element_at(sc, cast(4097 + idx % 64 as int))")).as("m"))
      .localCheckpoint()
  }

  /** 3 fixed-point power-iteration rounds over a scatter frame —
    * 64-row frames only; returns (k, vv) with vv the ×1000 dominant
    * eigenvector estimate. The mat-vec folds in decimal(38,0)
    * (DuckDB: HUGEINT) so |M·v| ≤ 64·|M|·1000 has no int64 headroom
    * cliff at larger corpora/quantized magnitudes; the normalized
    * component |vv| ≤ 1000 always fits a BIGINT.
    */
  private def powerIterate(s: org.apache.spark.sql.SparkSession,
      m: DataFrame): DataFrame = {
    var vv = s.range(0, 64).select(col("id").as("k"), lit(1000L).as("vv"))
    for (_ <- 1 to 3) {
      val w = m.join(vv, "k").groupBy(col("j"))
        .agg(sum(col("m").cast("decimal(38,0)") * col("vv")).as("w"))
      val mx = w.agg(max(abs(col("w"))).as("mx"))
      vv = w.crossJoin(broadcast(mx))
        .select(col("j").as("k"),
          expr("CAST((w * 1000) div nullif(mx, 0) AS LONG)").as("vv"))
        .localCheckpoint()
    }
    vv
  }

  /** Shared oracle CTE chain: scatter build (`mm`) + 3 unrolled power
    * rounds ending in `v3(k, vv)`.
    */
  private def scatterPowerSqlCtes: String = {
    def round(i: Int, prev: String) =
      s"""w$i AS MATERIALIZED (SELECT j, CAST(SUM(m * vv) AS HUGEINT) AS w
           FROM mm JOIN $prev ON $prev.k = mm.k GROUP BY 1),
         x$i AS (SELECT MAX(ABS(w)) AS mx FROM w$i),
         v$i AS MATERIALIZED (SELECT j AS k,
             CAST((w * 1000) // NULLIF(mx, 0) AS BIGINT) AS vv
           FROM w$i CROSS JOIN x$i)"""
    s"""$quantizedSql,
       ex AS MATERIALIZED (SELECT vec_id, unnest(q) AS x,
           unnest(range(0, 64)) AS dim FROM v),
       g AS MATERIALIZED (SELECT a.dim AS j, b.dim AS k,
           CAST(SUM(a.x * b.x) AS BIGINT) AS gg
         FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
       sv AS (SELECT dim, CAST(SUM(x) AS BIGINT) AS sv FROM ex GROUP BY 1),
       nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
       mm AS MATERIALIZED (SELECT j, g.k AS k, n * gg - sa.sv * sb.sv AS m
         FROM g JOIN sv sa ON sa.dim = g.j JOIN sv sb ON sb.dim = g.k
         CROSS JOIN nn),
       v0 AS (SELECT CAST(range AS BIGINT) AS k, CAST(1000 AS BIGINT) AS vv
           FROM range(0, 64)),
       ${round(1, "v0")},
       ${round(2, "v1")},
       ${round(3, "v2")}"""
  }

  val embeddingPca: QueryDef = QueryDef(
    "s_embedding_pca",
    (s, dir) => powerIterate(s, scatterFrame(s, dir))
      .select(col("k").cast("long").as("dim"), col("vv").as("v_x1000")),
    Some(s"""WITH $scatterPowerSqlCtes
         SELECT k AS dim, vv AS v_x1000 FROM v3"""))

  /** EXPLAINED-VARIANCE ratio of the top principal component — the
    * actionable number next to [[embeddingPca]]'s direction: what
    * fraction of total corpus variance does PC1 carry? (High → the
    * embedding space is anisotropic and Matryoshka truncation /
    * PCA'd PQ codebooks are cheap; low → dimensions pull equal
    * weight.) Rayleigh quotient over the shared scatter:
    * ratio = vᵀMv / (vᵀv · tr M) in ×10⁶ fixed point. The products
    * overflow int64 (|vᵀMv| ≤ 64²·|M|·10⁶), so both engines fold in
    * 38-digit decimals — Spark decimal(38,0), DuckDB HUGEINT — the
    * `q_table_checksum` convention; the final ratio fits a BIGINT.
    * M is positive semidefinite, so the ratio lands in [0, 10⁶]
    * (spec-asserted).
    *
    * Scale shape: the one corpus-sized pass is the shared scatter
    * build; the Rayleigh contraction and trace run on the 4096-cell
    * frame.
    */
  val embeddingVariance: QueryDef = QueryDef(
    "s_embedding_variance",
    (s, dir) => {
      val m = scatterFrame(s, dir)
      val v = powerIterate(s, m)
      val vMv = m.join(v.toDF("j", "vj"), "j").join(v.toDF("k", "vk"), "k")
        .agg(sum(expr("cast(m as decimal(38,0)) * vj * vk")).as("vmv"))
      val tr = m.where(col("j") === col("k"))
        .agg(sum(col("m")).as("trace"))
      val vtv = v.agg(sum(col("vv") * col("vv")).as("vtv"))
      vMv.crossJoin(broadcast(tr)).crossJoin(broadcast(vtv))
        .where(col("trace") > 0 && col("vtv") > 0)
        .select(col("trace"), col("vtv").cast("long").as("vtv"),
          expr("""cast((vmv * 1000000) div
               (cast(trace as decimal(38,0)) * vtv) as bigint)""")
            .as("explained_x1e6"))
    },
    Some(s"""WITH $scatterPowerSqlCtes,
         vmv AS (SELECT SUM(CAST(mm.m AS HUGEINT) * a.vv * b.vv) AS vmv
           FROM mm JOIN v3 a ON a.k = mm.j JOIN v3 b ON b.k = mm.k),
         tr AS (SELECT CAST(SUM(m) AS BIGINT) AS trace FROM mm WHERE j = k),
         vtv AS (SELECT CAST(SUM(vv * vv) AS BIGINT) AS vtv FROM v3)
         SELECT trace, vtv,
           CAST((vmv * 1000000) // (CAST(trace AS HUGEINT) * vtv) AS BIGINT)
             AS explained_x1e6
         FROM vmv CROSS JOIN tr CROSS JOIN vtv
         WHERE trace > 0 AND vtv > 0"""))

  /** LINK PREDICTION over the persisted kNN graph — the "which edges
    * are MISSING" read next to `s_graph_triangles`' "how dense is what
    * exists": for every non-adjacent pair with ≥ 2 common neighbors,
    * the common-neighbor count and Jaccard overlap of the two
    * neighborhoods (×1000 exact integers), top-50 by score. On a
    * similarity graph a high-Jaccard non-edge is a near-duplicate or
    * same-cluster pair the banding missed — the recall-repair
    * candidate list an ANN-graph maintainer would re-score next
    * (exactly the wedge structure `s_knn_beam`'s hop exploits at
    * serve time, here inverted into an audit).
    *
    * Scale shape: undirected edges are ≤ 2·N·K rows; the wedge
    * enumeration joins the symmetric adjacency with itself on the
    * middle vertex, so fanout per vertex is its undirected degree —
    * out-degree is K by construction and in-degree is
    * similarity-bounded on a kNN graph (the [[graphTriangles]]
    * argument; a power-law graph would cap or degree-order the middle
    * vertex first). The final top-50 is orderBy+limit
    * (TakeOrderedAndProject — per-partition heaps, no global sort or
    * single-partition window over the candidate frame).
    */
  val graphLinkPredict: QueryDef = QueryDef(
    "s_graph_link_predict",
    (s, dir) => {
      val g = knnGraphTable(s, dir)
      val und = g.select(least(col("g_src"), col("g_dst")).as("a"),
          greatest(col("g_src"), col("g_dst")).as("b"))
        .where(col("a") =!= col("b")).distinct().localCheckpoint()
      val sym = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
      val deg = sym.groupBy("a").agg(count(lit(1)).as("dg"))
      val cn = sym.toDF("w", "u").join(sym.toDF("w", "v"), "w")
        .where(col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("cn"))
        .where(col("cn") >= 2)
      val nonEdge = cn.join(und,
        cn("u") === und("a") && cn("v") === und("b"), "left_anti")
      val top = nonEdge
        .join(deg.toDF("u", "du"), "u").join(deg.toDF("v", "dv"), "v")
        .select(col("u"), col("v"), col("cn"),
          expr("(1000 * cn) div (du + dv - cn)").as("jaccard_x1000"))
        .orderBy(col("jaccard_x1000").desc, col("cn").desc, col("u"), col("v"))
        .limit(50)
      top.withColumn("rnk", row_number().over(Window.orderBy(
          col("jaccard_x1000").desc, col("cn").desc, col("u"), col("v")))
        .cast("long"))
    },
    Some(s"""WITH $graphSqlCtes,
         und AS (SELECT DISTINCT LEAST(g_src, g_dst) AS a, GREATEST(g_src, g_dst) AS b
             FROM graph WHERE g_src <> g_dst),
         sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
         deg AS (SELECT a, COUNT(*) AS dg FROM sym GROUP BY 1),
         cn AS (SELECT x.b AS u, y.b AS v, COUNT(*) AS cn
             FROM sym x JOIN sym y ON x.a = y.a AND x.b < y.b
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         ne AS (SELECT cn.u, cn.v, cn.cn FROM cn
             LEFT JOIN und ON und.a = cn.u AND und.b = cn.v
             WHERE und.a IS NULL),
         sc AS (SELECT ne.u, ne.v, ne.cn,
             (1000 * ne.cn) // (du.dg + dv.dg - ne.cn) AS jaccard_x1000
           FROM ne JOIN deg du ON du.a = ne.u JOIN deg dv ON dv.a = ne.v)
         SELECT u, v, cn, jaccard_x1000,
           CAST(ROW_NUMBER() OVER (ORDER BY jaccard_x1000 DESC, cn DESC, u, v)
             AS BIGINT) AS rnk
         FROM sc
         ORDER BY jaccard_x1000 DESC, cn DESC, u, v LIMIT 50"""))

  /** ISOLATION audit over the persisted kNN graph — the data-cleaning
    * read `s_graph_link_predict` inverts once more: which vectors have
    * the WEAKEST best neighbor? A point whose top-1 retained edge is
    * low-cosine sits alone in the space — noise, mislabels, or
    * distribution tails a curation pass should inspect (the kNN-
    * distance outlier family, served from the graph instead of a
    * fresh scan). Bottom-20 sources by (best-edge sim asc), with the
    * edge count and the weakest retained edge beside it; max/min are
    * order-independent aggregates, so no float-sum nondeterminism.
    * Vectors with NO banded candidate at all never entered the graph
    * — this audits retained adjacency; the banding-miss set is row
    * 27v's recall job.
    *
    * Scale shape: one groupBy over the O(N·k) edge table, then
    * orderBy+limit per-partition heaps. No corpus scan, no window
    * over the full frame.
    */
  val embeddingIsolation: QueryDef = QueryDef(
    "s_embedding_isolation",
    (s, dir) => {
      val per = knnGraphTable(s, dir).groupBy(col("g_src"))
        .agg(count(lit(1)).as("k_edges"), max(col("g_sim")).as("best_sim"),
          min(col("g_sim")).as("worst_sim"))
      per.orderBy(col("best_sim").asc, col("g_src")).limit(20)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("best_sim").asc, col("g_src"))).cast("long"))
        .select(col("g_src").as("vec_id"), col("k_edges"), col("best_sim"),
          col("worst_sim"), col("rnk"))
    },
    Some(s"""WITH $graphSqlCtes,
         ge AS (SELECT g.g_src, s.sim FROM graph g
             JOIN gsc s ON s.a = g.g_src AND s.b = g.g_dst),
         per AS (SELECT g_src, COUNT(*) AS k_edges, MAX(sim) AS best_sim,
             MIN(sim) AS worst_sim FROM ge GROUP BY 1)
         SELECT g_src AS vec_id, k_edges, best_sim, worst_sim,
           CAST(ROW_NUMBER() OVER (ORDER BY best_sim ASC, g_src) AS BIGINT) AS rnk
         FROM per ORDER BY best_sim ASC, g_src LIMIT 20"""))

  /** IVF LIST-OCCUPANCY balance audit — `d_lsh_bucket_stats` applied
    * to the ANN serving index: per ⌊log₂ size⌋ bucket the list count,
    * vector mass, and size bounds, plus the straggler factor
    * max·n_lists/n_vecs ×1000 (the `q_skew_profile` statistic — an
    * imbalanced quantizer makes every probe of the hot list a
    * straggler task and starves recall on the rest). Read BEFORE
    * serving traffic or deciding a re-train: this is the pre-flight
    * the IVF drift trigger (row 27b's `ivfRetrainIfDrifted`) acts on.
    * The oracle re-derives the full seed→Lloyd assignment chain and
    * must land on identical occupancy — a quantizer-determinism check
    * for free.
    *
    * Scale shape: one pass over the persisted lists table (an
    * index-maintenance read — cid-keyed, map-side combined into
    * C ≈ √N sizes), then ≤ 64-bucket rollup + 1-row broadcast.
    */
  val ivfBalance: QueryDef = QueryDef(
    "s_ivf_balance",
    (s, dir) => {
      import graft.sources.Snapshots
      val (_, listsT, listsV) = ivfIndex(s, dir)
      val sizes = s.read.parquet(Snapshots.versionDirs(listsT, listsV): _*)
        .groupBy(col("cid").cast("long").as("cid"))
        .agg(count(lit(1)).as("sz"))
      val tot = sizes.agg(count(lit(1)).as("n_lists_total"),
        sum(col("sz")).as("n_vecs_total"), max(col("sz")).as("max_sz"))
      sizes.withColumn("k", (length(bin(col("sz"))) - 1).cast("long"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_lists"), sum(col("sz")).as("n_vecs"),
          min(col("sz")).as("min_size"), max(col("sz")).as("max_size"))
        .crossJoin(broadcast(tot))
        .select(col("k"), col("n_lists"), col("n_vecs"),
          col("min_size"), col("max_size"),
          expr("(max_sz * n_lists_total * 1000) div n_vecs_total")
            .as("skew_x1000"))
    },
    Some(s"""WITH $ivfServeCtes,
         sz AS (SELECT cid, COUNT(*) AS sz FROM a2 GROUP BY 1),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nl,
             CAST(SUM(sz) AS BIGINT) AS nv, MAX(sz) AS mx FROM sz)
         SELECT CAST(LENGTH(bin(sz)) - 1 AS BIGINT) AS k,
           COUNT(*) AS n_lists, CAST(SUM(sz) AS BIGINT) AS n_vecs,
           MIN(sz) AS min_size, MAX(sz) AS max_size,
           (t.mx * t.nl * 1000) // t.nv AS skew_x1000
         FROM sz CROSS JOIN t GROUP BY 1, t.mx, t.nl, t.nv"""))

  /** kNN-GRAPH IN-DEGREE profile — the HUB audit on the persisted
    * graph: out-degree is K by construction, but IN-degree is free to
    * concentrate, and a hub vertex distorts everything downstream —
    * beam search funnels through it ([[knnBeam]]), PageRank mass
    * pools on it, and its removal disconnects neighborhoods. Vertices
    * bucket by ⌊log₂(in-degree)⌋ (the [[graft.operators.Events]]
    * power-law convention) plus the zero-in-degree orphan count —
    * vertices NO ONE points at, unreachable by any graph walk and
    * served only by brute force. The skew scalar max·n/edges ×1000
    * is the straggler read for in-neighbor joins.
    *
    * Scale shape: one groupBy over the O(N·K) edge table on the dst
    * key (map-side combined), an anti-join against the corpus for
    * orphans, a ≤ 64-bucket rollup.
    */
  val graphDegree: QueryDef = QueryDef(
    "s_graph_degree",
    (s, dir) => {
      val g = knnGraphTable(s, dir)
      val indeg = g.groupBy(col("g_dst").as("v")).agg(count(lit(1)).as("d"))
      val orphans = quantized(Tables.load(s, dir, "embeddings"))
        .select(col("vec_id").as("v"))
        .join(indeg, Seq("v"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(lit(-1L).as("k"), col("n").as("n_vertices"),
          lit(0L).as("n_edges"), lit(0L).as("min_indeg"), lit(0L).as("max_indeg"))
      val tot = indeg.agg(count(lit(1)).as("nv"), sum(col("d")).as("ne"),
        max(col("d")).as("mx"))
      val buckets = indeg
        .withColumn("k", (length(bin(col("d"))) - 1).cast("long"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_vertices"), sum(col("d")).as("n_edges"),
          min(col("d")).as("min_indeg"), max(col("d")).as("max_indeg"))
      buckets.unionAll(orphans)
        .crossJoin(broadcast(tot))
        .select(col("k"), col("n_vertices"), col("n_edges"),
          col("min_indeg"), col("max_indeg"),
          expr("(mx * nv * 1000) div ne").as("skew_x1000"))
    },
    Some {
      s"""WITH $graphSqlCtes,
         indeg AS (SELECT g_dst AS v, COUNT(*) AS d FROM graph GROUP BY 1),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
             CAST(SUM(d) AS BIGINT) AS ne, MAX(d) AS mx FROM indeg),
         orph AS (SELECT CAST(-1 AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n_vertices,
             CAST(0 AS BIGINT) AS n_edges, CAST(0 AS BIGINT) AS min_indeg,
             CAST(0 AS BIGINT) AS max_indeg
           FROM v WHERE vec_id NOT IN (SELECT v FROM indeg)),
         b AS (SELECT CAST(LENGTH(bin(d)) - 1 AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n_vertices,
             CAST(SUM(d) AS BIGINT) AS n_edges,
             MIN(d) AS min_indeg, MAX(d) AS max_indeg
           FROM indeg GROUP BY 1)
         SELECT u.k, u.n_vertices, u.n_edges, u.min_indeg, u.max_indeg,
           (tot.mx * tot.nv * 1000) // tot.ne AS skew_x1000
         FROM (SELECT * FROM b UNION ALL SELECT * FROM orph) u
         CROSS JOIN tot"""
    })

  /** PER-DIMENSION embedding audit — the dead-dimension read next to
    * [[embeddingPca]]'s global direction: per dim, the quantized
    * min/max and the exact variance numerator n·Σx² − (Σx)², plus
    * each dim's share of total variance ×10⁶ and a zero-variance
    * `is_dead` flag. A dim carrying ~0 variance is wasted storage in
    * every IVF list / PQ codebook / cache line — the audit that
    * justifies Matryoshka truncation (row 27s) dimension by
    * dimension. The share folds in decimal(38,0)/HUGEINT (the 16c
    * convention — n·Σx² overflows int64 at corpus scale).
    *
    * Scale shape: one map-side posexplode pass (64 rows per vector,
    * no payload shuffle — aggregation keys are the 64 dims with
    * map-side combine), a 64-row rollup, a 1-row broadcast total.
    */
  val embeddingDimAudit: QueryDef = QueryDef(
    "s_embedding_dim_audit",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(posexplode(quantize(col("embedding")))).toDF("dim", "x")
      val d = e.groupBy(col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("x")).as("sq"),
          sum(col("x") * col("x")).as("ssq"),
          min(col("x")).as("min_q"), max(col("x")).as("max_q"))
        .withColumn("varnum",
          expr("cast(n_vecs as decimal(38,0)) * ssq - cast(sq as decimal(38,0)) * sq"))
      val t = d.agg(sum(col("varnum")).as("tot"))
      d.crossJoin(broadcast(t))
        .select(col("dim"), col("n_vecs"), col("min_q"), col("max_q"),
          expr("cast(varnum * 1000000 div nullif(tot, 0) as bigint)")
            .as("var_share_x1e6"),
          (col("varnum") === 0).as("is_dead"))
    },
    Some("""WITH v AS (SELECT list_transform(embedding,
              x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
            FROM embeddings),
            ex AS (SELECT unnest(q) AS x, unnest(range(0, 64)) AS dim FROM v),
            d AS (SELECT dim, COUNT(*) AS n_vecs,
                CAST(SUM(x) AS BIGINT) AS sq, CAST(SUM(x * x) AS BIGINT) AS ssq,
                MIN(x) AS min_q, MAX(x) AS max_q
              FROM ex GROUP BY 1),
            v2 AS (SELECT *, CAST(n_vecs AS HUGEINT) * ssq
                - CAST(sq AS HUGEINT) * sq AS varnum FROM d),
            t AS (SELECT SUM(varnum) AS tot FROM v2)
            SELECT CAST(dim AS BIGINT) AS dim, n_vecs, min_q, max_q,
              CAST((varnum * 1000000) // NULLIF(t.tot, 0) AS BIGINT)
                AS var_share_x1e6,
              varnum = 0 AS is_dead
            FROM v2 CROSS JOIN t"""))

  /** Per-dimension (min, range) of the quantized corpus as two
    * broadcastable 64-element arrays — the SQ8 codebook (range is
    * clamped ≥ 1 so a constant dimension codes to 0 instead of
    * dividing by zero). One 64-group aggregate; output is 1 row.
    */
  private def sqStats(v: DataFrame): DataFrame =
    v.select(posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min(col("x")).as("mn"),
        greatest(max(col("x")) - min(col("x")), lit(1L)).as("rng"))
      .agg(
        expr("transform(sort_array(collect_list(struct(dim, mn))), s -> s.mn)")
          .as("mns"),
        expr("transform(sort_array(collect_list(struct(dim, rng))), s -> s.rng)")
          .as("rngs"))

  /** (vec_id, code) — each vector SCALAR-QUANTIZED to 64 int codes in
    * [0, 255]: code_d = ((q_d − min_d) · 255) div range_d. Map-side
    * given the broadcast stats row.
    */
  private def sqCoded(v: DataFrame): DataFrame =
    v.crossJoin(broadcast(sqStats(v)))
      .select(col("vec_id"), expr(
        "transform(q, (x, d) -> ((x - element_at(mns, d+1)) * 255)" +
        " div element_at(rngs, d+1))").as("code"))

  /** Shared oracle CTEs for the SQ8 codebook + codes: `v` (quantized)
    * → `sqst` (per-dim min/range as ordered lists) → `sqc`
    * (vec_id, code).
    */
  private def sqCodedSql: String = s"$quantizedSql,\n       $sqCodesOnVSql"

  /** [[sqCodedSql]] without the leading `v` CTE — for oracles that
    * already define the quantized corpus (the IVF+SQ chain).
    */
  private def sqCodesOnVSql: String =
    s"""sqex AS (SELECT unnest(q) AS x, unnest(range(0, 64)) AS dim FROM v),
       sqst AS (SELECT list(mn ORDER BY dim) AS mns,
           list(rng ORDER BY dim) AS rngs
         FROM (SELECT dim, MIN(x) AS mn, GREATEST(MAX(x) - MIN(x), 1) AS rng
           FROM sqex GROUP BY 1)),
       sqc AS (SELECT vec_id,
           list_transform(list_zip(q, mns, rngs),
             s -> ((s[1] - s[2]) * 255) // s[3]) AS code
         FROM v CROSS JOIN sqst)"""

  /** §2.2 row 27aa — SCALAR-QUANTIZED (SQ8) ANN serving: the corpus is
    * compressed 8× (64 × int8 codes vs 64 × float + derived int64
    * work vectors) by per-dimension affine quantization, and top-k
    * runs entirely in code space — squared-L2 over the int codes via
    * the codegen'd native [[graft.functions.Native.sqDistScaled]]
    * (scale = 1). The memory-compression tier every production vector
    * store offers below full-precision serving (reference analog:
    * the same vec_id < 5 query set as `s_knn_bruteforce`).
    *
    * Scale shape: the codebook is ONE 64-group aggregate broadcast as
    * a 1-row frame; encoding is map-side; scoring joins the 5-row
    * broadcast query side against the corpus (the bounded-query-side
    * brute-force convention — at 100 TB SQ composes with IVF probe
    * pruning exactly as `s_knn_ivfpq` does for PQ; this query is the
    * compression tier in isolation). The top-10 window is partitioned
    * by q_id.
    */
  val knnSq: QueryDef = QueryDef(
    "s_knn_sq",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val c = sqCoded(v)
      val q = broadcast(c.where(col("vec_id") < 5).toDF("q_id", "q_code"))
      val scored = q.join(c.toDF("n_id", "n_code"), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          graft.functions.Native.sqDistScaled(
            col("q_code"), col("n_code"), lit(1L)).as("sqdist"))
      val w = Window.partitionBy("q_id").orderBy(col("sqdist"), col("n_id"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 10)
        .select("q_id", "n_id", "sqdist", "rn")
    },
    Some(s"""WITH $sqCodedSql,
         p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(a.code, b.code),
               s -> (s[1] - s[2]) * (s[1] - s[2]))) AS BIGINT) AS sqdist
           FROM sqc a JOIN sqc b ON a.vec_id < 5 AND b.vec_id <> a.vec_id)
         SELECT q_id, n_id, sqdist, CAST(rn AS BIGINT) AS rn FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY sqdist, n_id) AS rn FROM p)
         WHERE rn <= 10"""))

  /** §2.2 row 27aa2 — SQ8 recall@10: the eval next to [[knnSq]]'s
    * serving tier (the `s_knn_truncated_recall` convention) — what
    * fraction of the exact cosine top-10 survives 8× compression?
    * The actionable read before turning SQ on for a corpus.
    */
  val knnSqRecall: QueryDef = QueryDef(
    "s_knn_sq_recall",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
      // exact cosine top-10 (the brute-force baseline)
      val qf = broadcast(v.where(col("vec_id") < 5).toDF("q_id", "q_q", "q_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val exact = qf.join(v.toDF("n_id", "n_q", "n_nrm"), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
        .select("q_id", "n_id")
      // SQ top-10 in code space
      val c = sqCoded(v)
      val qc = broadcast(c.where(col("vec_id") < 5).toDF("q_id", "q_code"))
      val ws = Window.partitionBy("q_id").orderBy(col("sqdist"), col("n_id"))
      val approx = qc.join(c.toDF("n_id", "n_code"), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          graft.functions.Native.sqDistScaled(
            col("q_code"), col("n_code"), lit(1L)).as("sqdist"))
        .withColumn("rn", row_number().over(ws)).where(col("rn") <= 10)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(approx, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_x1000", expr("(n_hit * 1000) div n_true"))
    },
    Some(s"""WITH $sqCodedSql,
         n AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
         fp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             a.nrm AS na, b.nrm AS nb
           FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         ft AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
               CAST(dot AS DOUBLE) / SQRT(NULLIF(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE), 0)) DESC NULLS LAST, n_id) AS rn
             FROM fp) x WHERE rn <= 10),
         sp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(a.code, b.code),
               s -> (s[1] - s[2]) * (s[1] - s[2]))) AS BIGINT) AS sqdist
           FROM sqc a JOIN sqc b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         st AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sqdist, n_id) AS rn FROM sp) x WHERE rn <= 10)
         SELECT f.q_id, COUNT(*) AS n_true,
           CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST((CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
             // COUNT(*) AS BIGINT) AS recall_x1000
         FROM ft f LEFT JOIN st t ON f.q_id = t.q_id AND f.n_id = t.n_id
         GROUP BY 1"""))

  /** (vec_id, lo, hi) — each vector BINARY-QUANTIZED to 64 sign bits
    * against the per-dimension corpus mean, packed as two 32-bit
    * masks. The threshold test is the exact integer comparison
    * q_d · n > Σq_d (no mean division), so both engines agree
    * bit-for-bit.
    */
  private def bqMasked(v: DataFrame): DataFrame = {
    val sums = broadcast(
      v.select(posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy("dim").agg(sum(col("x")).as("sv"))
        .agg(expr(
          "transform(sort_array(collect_list(struct(dim, sv))), t -> t.sv)")
          .as("sums"))
        .crossJoin(v.agg(count(lit(1)).as("n"))))
    v.crossJoin(sums).select(col("vec_id"),
      expr("aggregate(transform(slice(q, 1, 32), (x, d) -> " +
        "IF(x * n > element_at(sums, d+1), shiftleft(1L, d), 0L)), " +
        "0L, (acc, y) -> acc + y)").as("lo"),
      expr("aggregate(transform(slice(q, 33, 32), (x, d) -> " +
        "IF(x * n > element_at(sums, d+33), shiftleft(1L, d), 0L)), " +
        "0L, (acc, y) -> acc + y)").as("hi"))
  }

  /** Shared oracle CTEs for the BQ masks: `v` → `bqm`
    * (vec_id, lo, hi).
    */
  private def bqMaskedSql: String =
    s"""$quantizedSql,
       bqex AS (SELECT unnest(q) AS x, unnest(range(0, 64)) AS dim FROM v),
       bqsv AS (SELECT list(sv ORDER BY dim) AS sums,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n
         FROM (SELECT dim, CAST(SUM(x) AS BIGINT) AS sv
           FROM bqex GROUP BY 1)),
       bqm AS (SELECT vec_id,
           CAST(list_sum(list_transform(list_zip(q[1:32], range(0, 32), sums[1:32]),
             s -> CASE WHEN s[1] * n > s[3]
               THEN (CAST(1 AS BIGINT) << CAST(s[2] AS INTEGER)) ELSE 0 END))
             AS BIGINT) AS lo,
           CAST(list_sum(list_transform(list_zip(q[33:64], range(0, 32), sums[33:64]),
             s -> CASE WHEN s[1] * n > s[3]
               THEN (CAST(1 AS BIGINT) << CAST(s[2] AS INTEGER)) ELSE 0 END))
             AS BIGINT) AS hi
         FROM v CROSS JOIN bqsv)"""

  /** §2.2 row 27ab — BINARY-QUANTIZED ANN with exact re-ranking: the
    * 512× compression + rescoring pattern (each vector is 64 sign
    * bits against the per-dim corpus mean; candidates are the
    * Hamming-nearest 200 per query (20× oversampling of k — the
    * tuning knob that buys recall back when 64 bits over 64 dims
    * tie heavily; production BQ over 1024-dim embeddings needs far
    * less); the final top-10 re-ranks ONLY those 200 with the exact
    * integer dot product). This is the
    * production BQ serving shape — cheap popcount scan to shortlist,
    * full-precision rescoring on the shortlist — distinct from
    * `s_knn_lsh` (bucketed bands, no rescoring stage).
    *
    * Scale shape: masks are map-side given a broadcast 1-row stats
    * frame; the Hamming scan carries TWO LONGS per corpus row (not
    * the 64-long work vector), so the shortlist stage reads 32× less
    * than brute force; the exact rerank touches 5 × 200 rows. Windows
    * are partitioned by q_id.
    */
  val knnBq: QueryDef = QueryDef(
    "s_knn_bq",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val m = bqMasked(v)
      val qm = broadcast(m.where(col("vec_id") < 5).toDF("q_id", "q_lo", "q_hi"))
      val ham = qm.join(m.toDF("n_id", "n_lo", "n_hi"), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          (expr("bit_count(q_lo ^ n_lo)") + expr("bit_count(q_hi ^ n_hi)"))
            .cast("long").as("ham"))
      val wh = Window.partitionBy("q_id").orderBy(col("ham"), col("n_id"))
      val cand = ham.withColumn("hrn", row_number().over(wh))
        .where(col("hrn") <= 200).select("q_id", "n_id", "ham")
      // exact rescoring of the 5 × 200 shortlist only
      val qv = broadcast(v.where(col("vec_id") < 5).toDF("q_id", "q_q", "q_nrm"))
      val wr = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      cand.join(v.toDF("n_id", "n_q", "n_nrm"), "n_id").join(qv, "q_id")
        .select(col("q_id"), col("n_id"), col("ham"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(wr).cast("long"))
        .where(col("rn") <= 10)
        .select("q_id", "n_id", "ham", "sim", "rn")
    },
    Some(s"""WITH $bqMaskedSql,
         n AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
         hp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
               AS BIGINT) AS ham
           FROM bqm a JOIN bqm b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         cand AS (SELECT q_id, n_id, ham FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY ham, n_id) AS hrn FROM hp) x WHERE hrn <= 200),
         rr AS (SELECT c.q_id, c.n_id, c.ham,
             CAST(list_sum(list_transform(list_zip(qa.q, nb.q), s -> s[1]*s[2])) AS DOUBLE)
               / SQRT(NULLIF(CAST(qa.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE), 0)) AS sim
           FROM cand c JOIN n qa ON qa.vec_id = c.q_id
             JOIN n nb ON nb.vec_id = c.n_id)
         SELECT q_id, n_id, ham, sim, CAST(rn AS BIGINT) AS rn FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY sim DESC NULLS LAST, n_id) AS rn FROM rr)
         WHERE rn <= 10"""))

  /** §2.2 row 27ab2 — BQ recall@10: what fraction of the exact cosine
    * top-10 survives 512× compression + the 200-candidate Hamming
    * shortlist + exact rescoring ([[knnBq]])? The decision artifact
    * before turning BQ on — read NEXT TO `s_knn_sq_recall`: the two
    * curves are the compression-ladder tradeoff (8× vs 512×) measured
    * on the same queries.
    */
  val knnBqRecall: QueryDef = QueryDef(
    "s_knn_bq_recall",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val qf = broadcast(v.where(col("vec_id") < 5).toDF("q_id", "q_q", "q_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val exact = qf.join(v.toDF("n_id", "n_q", "n_nrm"), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
        .select("q_id", "n_id")
      val bq = knnBq.fn(s, dir)
        .select(col("q_id"), col("n_id"), lit(1L).as("hit"))
      exact.join(bq, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .withColumn("recall_x1000", expr("(n_hit * 1000) div n_true"))
    },
    Some(s"""WITH $bqMaskedSql,
         n AS (SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
         hp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
               AS BIGINT) AS ham
           FROM bqm a JOIN bqm b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         cand AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY ham, n_id) AS hrn FROM hp) x WHERE hrn <= 200),
         rr AS (SELECT c.q_id, c.n_id,
             CAST(list_sum(list_transform(list_zip(qa.q, nb.q), s -> s[1]*s[2])) AS DOUBLE)
               / SQRT(NULLIF(CAST(qa.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE), 0)) AS sim
           FROM cand c JOIN n qa ON qa.vec_id = c.q_id
             JOIN n nb ON nb.vec_id = c.n_id),
         bqt AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sim DESC NULLS LAST, n_id) AS rn FROM rr) x WHERE rn <= 10),
         fp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
             a.nrm AS na, b.nrm AS nb
           FROM n a JOIN n b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
         ft AS (SELECT q_id, n_id FROM (
             SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
               CAST(dot AS DOUBLE) / SQRT(NULLIF(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE), 0)) DESC NULLS LAST, n_id) AS rn
             FROM fp) x WHERE rn <= 10)
         SELECT f.q_id, COUNT(*) AS n_true,
           CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST((CAST(SUM(CASE WHEN t.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
             // COUNT(*) AS BIGINT) AS recall_x1000
         FROM ft f LEFT JOIN bqt t ON f.q_id = t.q_id AND f.n_id = t.n_id
         GROUP BY 1"""))

  /** §2.2 row 27ac — IVF + SQ8 combined serving: the composition the
    * SQ tier's scale story promises, made real (the IVF+PQ pattern
    * with the quantizer swapped): probes prune the persisted inverted
    * lists to NProbe cid= directories, candidates are scored in SQ
    * CODE space (8× smaller reads than the work vectors), the
    * 40-per-query shortlist alone fetches exact vectors for the
    * cosine rerank. Codebook = the corpus per-dim (min, range) stats,
    * one broadcast row.
    *
    * Scale shape: index build amortized (ensureIndex, content-keyed);
    * serving reads ONLY probed partitions; the exact-vector fetch
    * joins a ≤ 5 × 40-row frame against the corpus (broadcast the
    * short side); windows partitioned by q_id.
    */
  val knnIvfSq: QueryDef = QueryDef(
    "s_knn_ivf_sq",
    (s, dir) => {
      import graft.sources.Snapshots
      val (cents, listsT, listsV) = ivfIndex(s, dir)
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val stats = broadcast(sqStats(v))
      val enc = "transform(q, (x, d) -> ((x - element_at(mns, d+1)) * 255)" +
        " div element_at(rngs, d+1))"
      val byDist = Window.partitionBy("vec_id").orderBy(col("m"), col("cid"))
      val queries = v.where(col("vec_id") < 5)
      val probes = queries.crossJoin(cents)
        .select(col("vec_id"), col("q"), col("cid"), ivfMetric.as("m"))
        .withColumn("rn", row_number().over(byDist)).where(col("rn") <= NProbe)
        .crossJoin(stats)
        .select(col("vec_id").as("q_id"), expr(enc).as("q_code"), col("cid"))
      val probeCids = probes.select("cid").distinct().collect().map(_.getLong(0))
      val lists = s.read.parquet(Snapshots.versionDirs(listsT, listsV): _*)
        .where(col("cid").isin(probeCids: _*))
        .crossJoin(stats)
        .select(col("vec_id").as("n_id"), expr(enc).as("n_code"),
          col("cid").cast("long").as("cid"))
      val approx = broadcast(probes).join(lists, Seq("cid"))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          graft.functions.Native.sqDistScaled(
            col("q_code"), col("n_code"), lit(1L)).as("sqdist"))
      val ws = Window.partitionBy("q_id").orderBy(col("sqdist"), col("n_id"))
      val short = approx.withColumn("srn", row_number().over(ws))
        .where(col("srn") <= 40).select("q_id", "n_id")
      // exact vectors fetched for the shortlist ONLY
      val qv = broadcast(queries
        .select(col("vec_id").as("q_id"), col("q").as("q_q"), col("nrm").as("q_nrm")))
      val nv = v.select(col("vec_id").as("n_id"), col("q").as("n_q"), col("nrm").as("n_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      short.join(qv, "q_id").join(nv, "n_id")
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some(s"""WITH $ivfServeCtes,
         $sqCodesOnVSql,
         cand AS (SELECT pr.q_id, a2.vec_id AS n_id
           FROM pr JOIN a2 ON pr.cid = a2.cid AND a2.vec_id <> pr.q_id),
         sqs AS (SELECT c.q_id, c.n_id,
             CAST(list_sum(list_transform(list_zip(qa.code, nb.code),
               s -> (s[1] - s[2]) * (s[1] - s[2]))) AS BIGINT) AS sqdist
           FROM cand c JOIN sqc qa ON qa.vec_id = c.q_id
             JOIN sqc nb ON nb.vec_id = c.n_id),
         sh AS (SELECT q_id, n_id FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sqdist, n_id) AS rn FROM sqs) x WHERE rn <= 40),
         rr AS (SELECT sh.q_id, sh.n_id,
             CAST(list_sum(list_transform(list_zip(qa.q, nb.q), s -> s[1]*s[2])) AS DOUBLE)
               / SQRT(NULLIF(CAST(qa.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE), 0)) AS sim
           FROM sh JOIN n qa ON qa.vec_id = sh.q_id JOIN n nb ON nb.vec_id = sh.n_id)
         SELECT q_id, n_id, sim FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY sim DESC NULLS LAST, n_id) AS rn FROM rr) x
         WHERE rn <= 5"""))

  /** PAIRWISE-SIMILARITY distribution audit — embedding-collapse
    * detection (the corpus-level complement of [[embeddingVariance]]'s
    * PC1 share): the cosine HISTOGRAM over a deterministic unbiased
    * pair sample (vector i paired with i + ⌈n/2⌉ in id order — every
    * vector in at most one pair, no self-pairs, no RNG). A healthy
    * embedding table shows mass spread across buckets; a collapsing
    * encoder (all vectors similar) piles mass at the top bucket and a
    * dead one at 0. Cosines use the exact-integer quantized dot/norm
    * convention ([[quantized]]), so the one IEEE divide — and the
    * ×10 bucket floor — is bit-identical in both engines; per-bucket
    * min/max are order-independent and safe to hash.
    *
    * Scale shape: the pairing is an id-shifted self-equi-join (one
    * shuffle, n/2 rows), the histogram ≤ 21 buckets. Never all-pairs:
    * the sample is O(n) by construction at any corpus size.
    */
  val similarityHistogram: QueryDef = QueryDef(
    "s_similarity_histogram",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
      val h = broadcast(v.agg(expr("(max(vec_id) + 1) div 2").as("hh")))
      val sims = v.toDF("a", "qa", "na").crossJoin(h)
        .where(col("a") < col("hh"))
        .withColumn("b", col("a") + col("hh"))
        .join(v.toDF("b", "qb", "nb"), Seq("b"))
        .select(cosine(dotL(col("qa"), col("qb")), col("na"), col("nb")).as("sim"))
        .where(col("sim").isNotNull)
      sims.groupBy(floor(col("sim") * 10).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("sim")).as("min_sim"), max(col("sim")).as("max_sim"))
    },
    Some(s"""WITH $quantizedSql,
          n AS (SELECT vec_id, q,
              CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm FROM v),
          hh AS (SELECT (MAX(vec_id) + 1) // 2 AS h FROM n),
          p AS (SELECT a.q AS qa, a.nrm AS na, b.q AS qb, b.nrm AS nb
            FROM n a CROSS JOIN hh JOIN n b ON b.vec_id = a.vec_id + hh.h
            WHERE a.vec_id < hh.h),
          sc AS (SELECT
              CAST(list_sum(list_transform(list_zip(qa, qb), z -> z[1]*z[2])) AS DOUBLE)
                / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim
            FROM p)
          SELECT CAST(FLOOR(sim * 10) AS INT) AS bucket,
            CAST(COUNT(*) AS BIGINT) AS n_pairs,
            MIN(sim) AS min_sim, MAX(sim) AS max_sim
          FROM sc WHERE sim IS NOT NULL GROUP BY 1"""))

  /** EXACT k-core: peel to FIXPOINT — the unbounded twin of
    * [[graphKCore]]'s three-round bounded peel (round-14 verdict item
    * 5). The loop is the [[graft.operators.Dedup.connectedComponents]]
    * driver-loop shape: each round one degree aggregate + two
    * semi-joins on the shrinking edge set, `localCheckpoint` per round
    * to truncate lineage, and the ONLY driver-side value per round is
    * the edge-count aggregate that detects the fixpoint (monotone
    * shrinkage ⇒ equal counts ⇔ no removal ⇔ converged — never the
    * edges themselves). Termination is certain: each non-final round
    * removes ≥ 1 edge, so rounds ≤ |E|; `maxIters` is a loud backstop,
    * not a semantic bound. Takes `edges` already symmetrized +
    * distinct (src, dst); returns the exact k-core edge set.
    * Spec-proven against a brute driver fixpoint on random graphs
    * (RandomizedSpec); the bounded [[graphKCore]] stays the oracled
    * catalog entry because a DuckDB oracle cannot unroll an unbounded
    * loop.
    */
  def kCoreExact(edges: DataFrame, k: Int, maxIters: Int = 1000): DataFrame = {
    var e = edges.localCheckpoint()
    var n = e.count()
    var iter = 0
    var converged = n == 0
    while (!converged && iter < maxIters) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
        .where(col("d") >= k).select("src")
      val next = e.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint()
      val m = next.count()
      converged = m == n
      e = next; n = m
      iter += 1
    }
    require(converged || iter < maxIters,
      s"k-core peel did not converge within $maxIters rounds")
    e
  }

  /** DEGREE ASSORTATIVITY of the kNN graph (Newman 2002) — the
    * mixing-pattern read next to [[graphKCore]]'s density skeleton
    * and `s_graph_degree`'s tail audit: the Pearson correlation of
    * endpoint degrees over the symmetrized edge set. Positive = hubs
    * attach to hubs (a core-periphery embedding space — beam search
    * seeds well, isolated points suffer); negative = hub-and-spoke
    * mixing (high-degree vectors are everyone's neighbor — the
    * hubness pathology of high-dimensional kNN, worth knowing before
    * trusting graph-ANN recall). Integer sums feed one deterministic
    * double tail (the `q_events_acf` parity convention); degenerate
    * (zero-variance) degree distributions yield NULL via the shared
    * nullif guard.
    *
    * Scale shape: degree fold + two vertex-keyed joins on the O(N·k)
    * edge set, one 1-row fold — nothing pairwise. Int64 headroom:
    * Σd² ≤ N·(2k)³ at k = GraphK — fine past 10¹² edges; a 100 TB
    * corpus casts the folds to decimal(38,0) first.
    */
  val graphAssortativity: QueryDef = QueryDef(
    "s_graph_assortativity",
    (s, dir) => {
      val g = knnGraphTable(s, dir)
      val e0 = g.select(col("g_src").as("src"), col("g_dst").as("dst"))
        .unionAll(g.select(col("g_dst").as("src"), col("g_src").as("dst")))
        .distinct().localCheckpoint()
      val deg = e0.groupBy("src").agg(count(lit(1)).as("d"))
      val m = e0.join(deg, Seq("src"))
        .join(deg.select(col("src").as("dst"), col("d").as("d2")), Seq("dst"))
        .agg(count(lit(1)).as("m"), sum(col("d")).as("sx"),
          sum(col("d2")).as("sy"), sum(col("d") * col("d2")).as("sxy"),
          sum(col("d") * col("d")).as("sxx"),
          sum(col("d2") * col("d2")).as("syy"))
      m.crossJoin(broadcast(deg.agg(count(lit(1)).as("n_vertices"))))
        .select(col("n_vertices"), expr("m div 2").as("n_edges"),
          expr("""CAST(m * sxy - sx * sy AS DOUBLE)
            / NULLIF(SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
              * SQRT(CAST(m * syy - sy * sy AS DOUBLE)), 0)""")
            .as("assortativity"))
    },
    Some(s"""WITH $graphSqlCtes,
         e0 AS (SELECT g_src AS src, g_dst AS dst FROM graph
                UNION SELECT g_dst, g_src FROM graph),
         deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e0 GROUP BY 1),
         j AS (SELECT x.d AS d, y.d AS d2 FROM e0 e
             JOIN deg x ON x.src = e.src JOIN deg y ON y.src = e.dst),
         mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(d) AS BIGINT) AS sx, CAST(SUM(d2) AS BIGINT) AS sy,
             CAST(SUM(d * d2) AS BIGINT) AS sxy,
             CAST(SUM(d * d) AS BIGINT) AS sxx,
             CAST(SUM(d2 * d2) AS BIGINT) AS syy
           FROM j),
         nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM deg)
         SELECT n_vertices, m // 2 AS n_edges,
           CAST(m * sxy - sx * sy AS DOUBLE)
             / NULLIF(SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
               * SQRT(CAST(m * syy - sy * sy AS DOUBLE)), 0) AS assortativity
         FROM mm CROSS JOIN nv"""))

  /** K-CORE decomposition (bounded peel) — the graph-health read
    * behind data selection on the kNN graph (rows 27h/27m audit
    * centrality and local closure; the k-core is the standard global
    * DENSITY skeleton: vertices surviving iterated removal of
    * degree-< k nodes form the graph's cohesive core, and a thin core
    * means the neighborhood structure most graph-ANN and
    * graph-sampling methods rely on is shallow). Three SYNCHRONIZED
    * peeling rounds (the row-71 label-propagation convention — a
    * bounded, deterministic pass, oracle-unrolled), each: degree
    * count over the symmetrized edge set, keep ≥ k, semi-join both
    * endpoints. A `converged` flag (round 3 removed nothing) marks
    * when the bounded peel IS the exact k-core; when false the
    * numbers are an upper bound still peeling (k=3 at sf0.001 — the
    * flag tells the caller which, spec-proven against a brute
    * fixpoint).
    *
    * Scale shape: each round is one degree aggregate + two semi-joins
    * on the O(N·k) edge set, all keyed by vertex; nothing pairwise,
    * nothing driver-side.
    */
  val graphKCore: QueryDef = QueryDef(
    "s_graph_kcore",
    (s, dir) => {
      val g = knnGraphTable(s, dir)
      // each peeled edge set feeds BOTH the next round's lineage and
      // its own count aggregate, for two k values — checkpoint the
      // (O(N·k)-small) frames so the union's DAG reads each round once
      // instead of re-deriving the whole peel chain per aggregate
      val e0 = g.select(col("g_src").as("src"), col("g_dst").as("dst"))
        .unionAll(g.select(col("g_dst").as("src"), col("g_src").as("dst")))
        .distinct().localCheckpoint()
      def peel(e: DataFrame, k: Int): DataFrame = {
        val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
          .where(col("d") >= k).select("src")
        e.join(keep, Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
      }
      def row(k: Int): DataFrame = {
        val e2 = peel(peel(e0, k), k).localCheckpoint()
        val e3 = peel(e2, k).localCheckpoint()
        e3.select(col("src").as("v")).distinct()
          .agg(count(lit(1)).as("n_core_vertices"))
          .crossJoin(e3.agg(expr("count(1) div 2").as("n_core_edges")))
          .crossJoin(
            e2.agg(count(lit(1)).as("ne2"))
              .crossJoin(e3.agg(count(lit(1)).as("ne3")))
              .select((col("ne2") === col("ne3")).as("converged")))
          .select(lit(k.toLong).as("k"), col("n_core_vertices"),
            col("n_core_edges"), col("converged"))
      }
      row(2).unionAll(row(3))
    },
    Some {
      def coreSql(k: Int): String =
        s"""d${k}a AS (SELECT src FROM e0 GROUP BY src HAVING COUNT(*) >= $k),
           e${k}1 AS (SELECT e.src, e.dst FROM e0 e
              JOIN d${k}a x ON x.src = e.src JOIN d${k}a y ON y.src = e.dst),
           d${k}b AS (SELECT src FROM e${k}1 GROUP BY src HAVING COUNT(*) >= $k),
           e${k}2 AS (SELECT e.src, e.dst FROM e${k}1 e
              JOIN d${k}b x ON x.src = e.src JOIN d${k}b y ON y.src = e.dst),
           d${k}c AS (SELECT src FROM e${k}2 GROUP BY src HAVING COUNT(*) >= $k),
           e${k}3 AS (SELECT e.src, e.dst FROM e${k}2 e
              JOIN d${k}c x ON x.src = e.src JOIN d${k}c y ON y.src = e.dst)"""
      def coreRow(k: Int): String =
        s"""SELECT CAST($k AS BIGINT) AS k,
             (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) FROM e${k}3)
               AS n_core_vertices,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM e${k}3) // 2 AS n_core_edges,
             (SELECT COUNT(*) FROM e${k}2) = (SELECT COUNT(*) FROM e${k}3)
               AS converged"""
      s"""WITH $graphSqlCtes,
         e0 AS (SELECT g_src AS src, g_dst AS dst FROM graph
                UNION SELECT g_dst, g_src FROM graph),
         ${coreSql(2)}, ${coreSql(3)}
         ${coreRow(2)} UNION ALL ${coreRow(3)}"""
    })

  val defs: Seq[QueryDef] =
    Seq(similarityHistogram, graphKCore, graphAssortativity,
      knnBruteForce, knnLsh, knnLshMultiprobe, embeddingNearDup, knnIvf,
      knnIvfDml, knnIvfDrift, knnFiltered, knnPurity, knnJoin,
      knnPq, knnIvfPq, knnPqTrained, knnPqServed, knnPqRecall,
      knnIvfPqRecall, knnGraph, knnGraphIncremental,
      knnBeam, knnBeamConverged, graphPagerank, hardNegatives, dedupSemantic,
      dedupSemanticIncremental, mmrRerank, nearestCentroid, graphTriangles,
      mutualComponents, embeddingAudit, graphPprSeeded, annRecall,
      annRecallMultiprobe, ivfSweep,
      labelKappa, evalRetrieval, graphCommunities, knnRouted, truncatedRecall,
      silhouette, labelCentroidDrift, embeddingPca, graphLinkPredict,
      embeddingVariance, embeddingIsolation, embeddingDimAudit, ivfBalance,
      pqCodeBalance, graphDegree, knnSq, knnSqRecall, knnBq, knnBqRecall, knnIvfSq)
}
