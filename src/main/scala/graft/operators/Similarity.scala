package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * The LSH path shuffles the corpus once by bucket id and compares
  * within buckets — the standard scale-out ANN shape; vectors stay
  * packed as arrays end to end.
  */
object Similarity {

  /** Quantized integer vector: exact, engine-portable. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000 + 0.5).cast("long"))

  def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine from integer dot/norms — one IEEE divide, portable. */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  private def quantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("nrm", dotL(col("q"), col("q")))

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

  /** Deterministic random-hyperplane components: plane j, dim i →
    * small signed integer. Public LSH construction (Charikar 2002),
    * derandomized so both engines / reruns agree.
    */
  private def planeComponent(j: Int, i: Column): Column =
    pmod(i * (31 + 2 * j) + j * 17, lit(13)) - 6

  private val NPlanes = 6

  /** Sign-bucket of a quantized vector under the j-th hyperplane. */
  private def planeBit(q: Column, j: Int): Column = {
    val dims = sequence(lit(0), size(q) - 1)
    val dot = aggregate(zip_with(q, transform(dims, i => planeComponent(j, i)),
      (x, c) => x * c), lit(0L), (a, x) => a + x)
    when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
  }

  def lshBucket(q: Column): Column =
    (0 until NPlanes).map(j => planeBit(q, j)).reduce(_ + _)

  /** DuckDB rendering of [[lshBucket]] — the same plane arithmetic on
    * the quantized vector list, so the oracle covers the LSH path too.
    */
  private def bucketSql(qcol: String): String = {
    val terms = (0 until NPlanes).map { j =>
      val dot = s"list_sum(list_transform(list_zip($qcol, range(0, 64)), " +
        s"s -> s[1] * ((((s[2] * ${31 + 2 * j}) + ${17 * j}) % 13) - 6)))"
      s"(CASE WHEN $dot >= 0 THEN ${1L << j} ELSE 0 END)"
    }
    terms.mkString(" + ")
  }

  private val quantizedSql =
    """v AS (SELECT vec_id,
       list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS q
       FROM embeddings)"""

  /** §2.2 row 27 — LSH-bucketed ANN: candidates only within a sign
    * bucket, cosine rerank, top-5 per query. Oracle reproduces the
    * bucket arithmetic in DuckDB list lambdas.
    */
  val knnLsh: QueryDef = QueryDef(
    "s_knn_lsh",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
        .withColumn("bucket", lshBucket(col("q")))
      val q = v.where(col("vec_id") < 5).toDF("q_id", "q_q", "q_nrm", "bucket")
      val scored = q.join(v.toDF("n_id", "n_q", "n_nrm", "bucket"), Seq("bucket"))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          cosine(dotL(col("q_q"), col("n_q")), col("q_nrm"), col("n_nrm")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
        .select("q_id", "n_id", "sim")
    },
    Some(s"""WITH $quantizedSql,
         n AS (SELECT vec_id, q,
              CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm,
              (${bucketSql("q")}) AS bucket FROM v),
         p AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
              CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
              a.nrm AS na, b.nrm AS nb
            FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < 5 AND b.vec_id <> a.vec_id),
         s AS (SELECT q_id, n_id,
              CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim FROM p)
         SELECT q_id, n_id, sim FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn FROM s)
         WHERE rn <= 5"""))

  /** §2.2 row 25 — embedding-cosine near-duplicate detection: LSH
    * buckets → within-bucket pairs → top-20 most similar pairs.
    * Oracle shares the bucket arithmetic with the LSH ANN oracle.
    */
  val embeddingNearDup: QueryDef = QueryDef(
    "d_dedup_embedding",
    (s, dir) => {
      val v = quantized(Tables.load(s, dir, "embeddings"))
        .withColumn("bucket", lshBucket(col("q")))
      val a = v.toDF("a", "q_a", "n_a", "bucket")
      val b = v.toDF("b", "q_b", "n_b", "bucket")
      a.join(b, Seq("bucket")).where(col("a") < col("b"))
        .select(col("a"), col("b"),
          cosine(dotL(col("q_a"), col("q_b")), col("n_a"), col("n_b")).as("sim"))
        .orderBy(col("sim").desc, col("a"), col("b"))
        .limit(20)
    },
    Some(s"""WITH $quantizedSql,
         n AS (SELECT vec_id, q,
              CAST(list_sum(list_transform(q, x -> x*x)) AS BIGINT) AS nrm,
              (${bucketSql("q")}) AS bucket FROM v),
         p AS (SELECT a.vec_id AS a, b.vec_id AS b,
              CAST(list_sum(list_transform(list_zip(a.q, b.q), s -> s[1]*s[2])) AS BIGINT) AS dot,
              a.nrm AS na, b.nrm AS nb
            FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         SELECT a, b, CAST(dot AS DOUBLE) / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS sim
         FROM p ORDER BY sim DESC, a, b LIMIT 20"""))

  val defs: Seq[QueryDef] = Seq(knnBruteForce, knnLsh, embeddingNearDup)
}
