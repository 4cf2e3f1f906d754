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

  /** Sorted distinct hashed word 3-gram shingles (native one-pass
    * expression — see [[graft.functions.Native.wordNGramHashes]]).
    */
  def wordShingles(text: Column, n: Int = 3): Column =
    graft.functions.Native.wordNGramHashes(text, n)

  /** Shingle hashes reduced into the affine-safe minhash domain. */
  private def shingleHashes(shingles: Column): Column =
    transform(shingles, h => pmod(h, lit(HashP)))

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

  /** Per-document LSH state: doc_id, shingles (sorted hashes), signature. */
  def signed(docs: DataFrame): DataFrame = {
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

  /** Exact Jaccard of the (sorted, hashed) shingle sets for a pair
    * DataFrame — native merge-intersect, O(|A|+|B|) per pair.
    */
  def verifiedJaccard(pairs: DataFrame, s: DataFrame): DataFrame = {
    val sa = s.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
    val sb = s.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
    val inter = graft.functions.Native.sortedIntersectSize(col("sh_a"), col("sh_b"))
    pairs.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        (inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter)).as("jaccard"))
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
      // inverted-index set-similarity join: explode hashed word
      // bigrams (native one-pass expression), co-count pairs per
      // (band, gram), then |A∩B| = co-count — gram ARRAYS never
      // travel through the join, and work is proportional to actual
      // overlap, not to candidate pairs.
      // The 100 TB shape (add a stop-gram frequency cutoff there).
      val grams = graft.functions.Native.wordNGramHashes(col("text"), 2)
      val g = d.select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 40).as("len_band"), grams.as("grams"))
      val sizes = g.select(col("doc_id"), size(col("grams")).as("sz"))
      val inv = g.select(col("doc_id"), col("lang"), col("len_band"),
        explode(col("grams")).as("gram"))
      val co = inv.toDF("a", "lang", "len_band", "gram")
        .join(inv.toDF("b", "lang", "len_band", "gram"), Seq("lang", "len_band", "gram"))
        .where(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      co.join(sizes.toDF("a", "sz_a"), "a")
        .join(sizes.toDF("b", "sz_b"), "b")
        .select(col("a"), col("b"),
          (col("inter").cast("double") /
            (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a"), col("b"))
        .limit(50)
    },
    None)

  val defs: Seq[QueryDef] = Seq(exact, minhash, simhashDef, ngramJaccard)
}
