package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Document deduplication family (SURVEY §2.2 rows 21–24): exact,
  * MinHash+LSH, SimHash, and banded n-gram Jaccard.
  *
  * Scale design: none of these ever cross-joins the corpus.
  *  - exact dedup shuffles 16-byte md5 keys only;
  *  - MinHash LSH shuffles (band, bucket) keys; candidate pairs are
  *    verified only within buckets (the standard shingle→minhash→band
  *    →bucket-join pipeline);
  *  - SimHash joins on 8-bit blocks (pigeonhole for small Hamming
  *    distance);
  *  - n-gram Jaccard compares only within (lang, length-band) blocks.
  * All signature computation is pure `functions._` array arithmetic —
  * codegen'd, no UDFs, no driver-side loops.
  */
object Dedup {

  // ---- shingling / hashing primitives (portable arithmetic) ----

  /** Hash domain for shingle hashes; small enough that affine
    * re-hashing (a*h+b) never overflows a Long. */
  private val HashP = 1000003L
  private val BucketP = 1000000007L
  private val K = 32       // minhash signature length
  private val Bands = 8    // LSH bands
  private val Rows = 4     // rows per band (K = Bands * Rows)

  /** Distinct word 3-gram shingles of a text column. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
  }

  /** crc32-based shingle hash reduced into the affine-safe domain. */
  private def shingleHashes(shingles: Column): Column =
    transform(shingles, s => pmod(crc32(s), lit(HashP)))

  /** K-row minhash signature: sig[k] = min over shingle hashes h of
    * ((2k+1)*h + (k*2654435761 mod P)) mod P.
    */
  def minhashSignature(hashes: Column): Column =
    transform(sequence(lit(0), lit(K - 1)), k =>
      array_min(transform(hashes, h =>
        pmod((k * 2 + 1) * h + pmod(k * lit(2654435761L), lit(HashP)), lit(HashP)))))

  /** Polynomial-combine one LSH band of the signature into a bucket id
    * (the rolling-hash fingerprint primitive of SURVEY §2.2 row 31).
    */
  private def bandBucket(sigSlice: Column): Column =
    aggregate(sigSlice, lit(0L), (acc, x) => pmod(acc * HashP + x, lit(BucketP)))

  /** Per-document LSH state: doc_id, shingles, signature. */
  private def signed(docs: DataFrame): DataFrame = {
    val sh = wordShingles(col("text"))
    docs.select(col("doc_id"), sh.as("shingles"))
      .withColumn("sig", minhashSignature(shingleHashes(col("shingles"))))
  }

  /** (doc_id, band, bucket) — one row per band, the LSH shuffle key. */
  private def bandedBuckets(s: DataFrame): DataFrame =
    s.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        b => bandBucket(slice(col("sig"), b * Rows + 1, lit(Rows))))))
      .toDF("doc_id", "band", "bucket")

  /** Candidate pairs (a < b) that collide in at least one band. */
  def minhashCandidates(s: DataFrame): DataFrame = {
    val bb = bandedBuckets(s)
    val l = bb.toDF("a", "band", "bucket")
    val r = bb.toDF("b", "band", "bucket")
    l.join(r, Seq("band", "bucket")).where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact Jaccard of the shingle sets for a pair DataFrame. */
  def verifiedJaccard(pairs: DataFrame, s: DataFrame): DataFrame = {
    val sa = s.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val sb = s.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
    pairs.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  // ---- §2.2 row 21: exact dedup (SQL oracle) ----

  val exact: QueryDef = QueryDef(
    "d_dedup_exact",
    (s, dir) => Tables.load(s, dir, "documents")
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies")),
    Some("""SELECT md5(text) AS fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
            FROM documents GROUP BY 1"""))

  // ---- §2.2 row 22: MinHash + LSH (rows-only; deterministic) ----

  val minhash: QueryDef = QueryDef(
    "d_dedup_minhash",
    (s, dir) => {
      val sg = signed(Tables.load(s, dir, "documents"))
      val near = verifiedJaccard(minhashCandidates(sg), sg)
        .where(col("jaccard") >= 0.5)
      val perDoc = near.select(col("a").as("doc_id"), col("jaccard"))
        .unionAll(near.select(col("b").as("doc_id"), col("jaccard")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_near_dups"), max(col("jaccard")).as("max_jaccard"))
      sg.select(col("doc_id"), size(col("shingles")).as("n_shingles"),
          element_at(col("sig"), 1).as("minhash_0"))
        .join(perDoc, Seq("doc_id"), "left")
        .na.fill(Map("n_near_dups" -> 0L, "max_jaccard" -> -1.0))
    },
    None)

  // ---- §2.2 row 23: SimHash (rows-only; deterministic) ----

  val simhashDef: QueryDef = QueryDef(
    "d_dedup_simhash",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Native.simhash64(col("text")).as("simhash"))
      // pigeonhole: pairs within Hamming distance 7 share >= 1 of 8 bytes
      val blocks = d.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 8).map(j =>
          shiftrightunsigned(col("simhash"), 8 * j).bitwiseAND(lit(255L))): _*)))
        .toDF("doc_id", "simhash", "block", "byte")
      val cand = blocks.toDF("a", "sh_a", "block", "byte")
        .join(blocks.toDF("b", "sh_b", "block", "byte"), Seq("block", "byte"))
        .where(col("a") < col("b"))
        .select("a", "b", "sh_a", "sh_b").distinct()
        .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      val perDoc = cand.select(col("a").as("doc_id"), col("hamming"))
        .unionAll(cand.select(col("b").as("doc_id"), col("hamming")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_candidates"), min(col("hamming")).as("min_hamming"))
      d.join(perDoc, Seq("doc_id"), "left")
        .na.fill(Map("n_candidates" -> 0L, "min_hamming" -> 99L))
    },
    None)

  // ---- §2.2 row 24: banded n-gram Jaccard (rows-only; deterministic) ----

  val ngramJaccard: QueryDef = QueryDef(
    "d_dedup_ngram_jaccard",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      // hashed word bigrams: set intersections run on longs, not
      // strings — ~10x cheaper per pair at identical semantics
      val toks = split(lower(col("text")), " ")
      val grams = array_distinct(transform(
        sequence(lit(0), greatest(size(toks) - 2, lit(0))),
        i => crc32(concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))))
      val g = d.select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 40).as("len_band"), grams.as("grams"))
      val a = g.toDF("a", "lang", "len_band", "g_a")
      val b = g.toDF("b", "lang", "len_band", "g_b")
      a.join(b, Seq("lang", "len_band")).where(col("a") < col("b"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
            size(array_union(col("g_a"), col("g_b")))).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(50)
    },
    None)

  val defs: Seq[QueryDef] = Seq(exact, minhash, simhashDef, ngramJaccard)
}
