package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{Portable, StatsQueries, TextFunctions}
import graft.sources.{IndexRegistry, Snapshots}

/** The GDPR / right-to-be-forgotten capstone (SURVEY §2.1 row 27d):
  * ONE `deleteWhere` on the document corpus, folded through EVERY
  * persisted index family in a single registry-driven maintenance pass
  * — the operation a production pipeline runs on every erasure
  * request, and the composition proof that no index family silently
  * misses DML coverage.
  *
  * The base table is the document corpus with its (nullable) embedding
  * column — documents LEFT JOIN embeddings on doc_id = vec_id, the
  * "every doc may carry an embedding" production shape. Six families
  * attach through [[graft.sources.IndexRegistry]]:
  *
  *  | family          | structures                       | maintenance |
  *  |-----------------|----------------------------------|-------------|
  *  | bm25            | postings + doclen + corpus scalars | [[TextFunctions.bm25Maintain]] |
  *  | minhash_bands   | LSH band index                   | [[Dedup.bandIndexMaintain]] |
  *  | simhash_blocks  | pigeonhole block index           | [[Dedup.simhashIndexMaintain]] |
  *  | fingerprints    | exact-dedup fp membership        | [[Dedup.fingerprintIndexMaintain]] |
  *  | ivf_lists       | frozen quantizer + inverted lists | [[Similarity.ivfListsMaintain]] |
  *  | knn_graph       | banded sidecar + kNN adjacency   | [[Similarity.knnGraphMaintain]] |
  *
  * Every family folds the SAME change feed
  * ([[graft.sources.Snapshots.changesBetween]] — only the data dirs the
  * delete touched) as an O(erased docs) tombstone-delta append; no
  * index is rebuilt, no corpus re-signed, the quantizer stays frozen.
  * The query emits one (family, n_rows, checksum) row per served
  * structure, with the portable md5-60bit checksum of a canonical row
  * serialization (the `q_table_checksum` convention) — and the DuckDB
  * oracle recomputes every structure from scratch over exactly the
  * LIVE corpus, so hash equality IS the proof that one maintenance
  * pass ≡ a full rebuild of all six families after real erasure.
  *
  * Reference analog: Database.deleteRecord propagating a record
  * mutation through the table heap and every B+ tree access path
  * (reference: Database.java, index/BPlusTree.java) — here the access
  * paths are the engine's six persisted serving structures.
  *
  * 100 TB shape: the delete is file-selective (only dirs with matches
  * rewrite); each family's fold reads the change feed (O(erased
  * rows)), appends one delta dir, and serves by netting — so an
  * erasure request costs O(erased data × families) + 7 manifest
  * commits, never O(corpus). The one corpus-sized touch is the kNN
  * graph's re-rank vector fetch (a pruned point-join at scale; see
  * [[Similarity.knnGraphMaintain]]).
  */
object Forget {

  /** Adapt the wide base table to the (vec_id, embedding) frame the
    * vector families consume — docs without an embedding simply do not
    * participate in the ANN structures.
    */
  private def embProject(df: DataFrame): DataFrame =
    df.where(col("embedding").isNotNull).select(col("vec_id"), col("embedding"))

  /** Register the built-in family maintainers (idempotent — safe to
    * call from every query run and from specs).
    */
  def registerBuiltins(): Unit = {
    IndexRegistry.registerMaintainer("bm25")((s, base, r) =>
      TextFunctions.bm25Maintain(s, base, r(0), r(1), r(2)))
    IndexRegistry.registerMaintainer("minhash_bands")((s, base, r) => {
      Dedup.bandIndexMaintain(s, base, r(0)); ()
    })
    IndexRegistry.registerMaintainer("simhash_blocks")((s, base, r) => {
      Dedup.simhashIndexMaintain(s, base, r(0)); ()
    })
    IndexRegistry.registerMaintainer("fingerprints")((s, base, r) => {
      Dedup.fingerprintIndexMaintain(s, base, r(0)); ()
    })
    IndexRegistry.registerMaintainer("ivf_lists")((s, base, r) =>
      Similarity.ivfListsMaintain(s, base, r(0), r(1), project = embProject))
    IndexRegistry.registerMaintainer("knn_graph")((s, base, r) =>
      Similarity.knnGraphMaintain(s, base, r(0), r(1), project = embProject))
  }

  /** The family → index-roots layout under a capstone root dir, in
    * attach (= maintenance) order. Shared with ForgetSpec.
    */
  def familyRoots(root: String): Seq[(String, Seq[String])] = Seq(
    "bm25" -> Seq(s"$root/postings", s"$root/doclen", s"$root/totals"),
    "minhash_bands" -> Seq(s"$root/bands"),
    "simhash_blocks" -> Seq(s"$root/simhash"),
    "fingerprints" -> Seq(s"$root/fps"),
    "ivf_lists" -> Seq(s"$root/ivf_cents", s"$root/ivf_lists"),
    "knn_graph" -> Seq(s"$root/knn_bands", s"$root/knn_graph"))

  /** 60-bit md5 hash of a serialized row — the Spark half of the
    * portable checksum (`q_table_checksum` convention).
    */
  private def h60(ser: Column): Column =
    conv(substring(md5(ser), 1, 15), 16, 10).cast("long")

  /** (family, n_rows, checksum) over one served structure. */
  private def familyChk(name: String, df: DataFrame, ser: Column): DataFrame =
    df.select(h60(ser).cast("decimal(38,0)").as("h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("hs"))
      .select(lit(name).as("family"), col("n_rows"),
        coalesce((col("hs") % lit(StatsQueries.ChecksumMod)).cast("long"),
          lit(0L)).as("checksum"))

  private def str(c: Column): Column = c.cast("string")

  /** Build the base corpus table, attach all six families, run the
    * bootstrap maintenance pass, and return (baseT, root). Shared by
    * the catalog query and ForgetSpec (which asserts the exactly-once
    * properties around the same flow).
    */
  def bootstrap(s: SparkSession, dir: String, tag: String = ""): (String, String) = {
    registerBuiltins()
    val root = "/root/repo/target/forget/" +
      dir.replaceAll("[^A-Za-z0-9]", "_") + tag
    Snapshots.deleteRecursively(root)
    val baseT = s"$root/base"
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    Snapshots.commitOverwrite(
      docs.join(emb, col("doc_id") === col("vec_id"), "left"), baseT)
    familyRoots(root).foreach { case (fam, roots) =>
      IndexRegistry.attach(baseT, fam, roots)
    }
    IndexRegistry.maintainAll(s, baseT)
    (baseT, root)
  }

  /** One (family, n_rows, checksum) row per served structure under
    * `root` — the post-erasure serve the oracle recomputes live.
    */
  def serveChecksums(s: SparkSession, root: String): DataFrame = {
    val post = TextFunctions.servePostingsNet(Snapshots.read(s, s"$root/postings"))
    val dl = Snapshots.read(s, s"$root/doclen").groupBy("doc_id")
      .agg(sum(col("dl")).cast("long").as("dl")).where(col("dl") > 0)
    val tot = Snapshots.read(s, s"$root/totals")
      .agg(coalesce(sum(col("np")), lit(0L)).cast("long").as("n"),
        coalesce(sum(col("totalp")), lit(0L)).cast("long").as("total"))
    val bands = Dedup.serveBandIndex(s, s"$root/bands")
    val blocks = Dedup.serveSimhashIndex(s, s"$root/simhash")
    val fps = Dedup.serveFingerprintIndex(s, s"$root/fps")
    val lists = Similarity.serveIvfLists(s, s"$root/ivf_lists")
    val graph = Similarity.serveKnnGraph(s, s"$root/knn_graph")
    familyChk("bm25_postings", post,
        concat_ws("|", col("term"), str(col("doc_id")), str(col("tf")), str(col("b"))))
      .unionAll(familyChk("bm25_doclen", dl,
        concat_ws("|", str(col("doc_id")), str(col("dl")))))
      .unionAll(familyChk("bm25_totals", tot,
        concat_ws("|", str(col("n")), str(col("total")))))
      .unionAll(familyChk("minhash_bands", bands,
        concat_ws("|", str(col("doc_id")), str(col("band")), str(col("bucket")))))
      .unionAll(familyChk("simhash_blocks", blocks,
        concat_ws("|", str(col("doc_id")), str(col("simhash")),
          str(col("block")), str(col("blockval")))))
      .unionAll(familyChk("fingerprints", fps,
        concat_ws("|", col("fp"), str(col("canonical_id")))))
      .unionAll(familyChk("ivf_lists", lists,
        concat_ws("|", str(col("vec_id")), str(col("cid")), str(col("nrm")))))
      .unionAll(familyChk("knn_graph", graph,
        concat_ws("|", str(col("g_src")), str(col("g_dst")))))
  }

  /** One UNION ALL arm of the oracle: COUNT + md5-60bit checksum of the
    * serialized rows of CTE `from`.
    */
  private def duckChk(family: String, from: String, ser: String): String =
    s"""SELECT '$family' AS family, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(CAST(SUM(${Portable.textSql.h60(ser)}) AS DECIMAL(38,0))
         % ${StatsQueries.ChecksumMod}, 0) AS BIGINT) AS checksum
       FROM $from"""

  /** The live-corpus full-rebuild oracle: every structure recomputed
    * from scratch over exactly the post-DML corpus (the IVF quantizer
    * trains on the FULL pre-DML corpus — the frozen-quantizer contract
    * — and assigns only live vectors). `prefixCtes` (may be empty)
    * lets a variant define the live doc corpus as a CTE (e.g. with
    * updated text); `docsFrom` is the FROM clause supplying the live
    * (doc_id, text) rows to every text family.
    */
  private def checksumOracle(prefixCtes: String, docsFrom: String,
      vecsFrom: String): String = {
    val tok = Portable.textSql.tokensLower
    val bTerm = s"(${Portable.textSql.h60("term")}) % ${TextFunctions.termBucketCount}"
    s"""WITH $prefixCtes
       pltk AS (SELECT doc_id, unnest($tok) AS term $docsFrom),
       plpost AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
         FROM pltk GROUP BY 1, 2),
       plpb AS (SELECT term, doc_id, tf, CAST($bTerm AS BIGINT) AS b FROM plpost),
       pldl AS (SELECT doc_id, CAST(len($tok) AS BIGINT) AS dl
         $docsFrom),
       pltot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COALESCE(SUM(dl), 0) AS BIGINT) AS total FROM pldl),
       plfp AS (SELECT md5(text) AS fp, MIN(doc_id) AS canonical_id
         $docsFrom GROUP BY 1),
       ${Dedup.bandIndexSqlCtes(docsFrom)},
       ${Dedup.simhashIndexSqlCtes(docsFrom)},
       ${Similarity.ivfLiveListsSqlCtes(vecsFrom)},
       ${Similarity.graphLiveSqlCtes(vecsFrom)}
       ${duckChk("bm25_postings", "plpb",
         "concat_ws('|', term, CAST(doc_id AS VARCHAR), CAST(tf AS VARCHAR), CAST(b AS VARCHAR))")}
       UNION ALL ${duckChk("bm25_doclen", "pldl",
         "concat_ws('|', CAST(doc_id AS VARCHAR), CAST(dl AS VARCHAR))")}
       UNION ALL ${duckChk("bm25_totals", "pltot",
         "concat_ws('|', CAST(n AS VARCHAR), CAST(total AS VARCHAR))")}
       UNION ALL ${duckChk("minhash_bands", "mbands",
         "concat_ws('|', CAST(doc_id AS VARCHAR), CAST(band AS VARCHAR), CAST(bucket AS VARCHAR))")}
       UNION ALL ${duckChk("simhash_blocks", "sxblocks",
         "concat_ws('|', CAST(doc_id AS VARCHAR), CAST(simhash AS VARCHAR), CAST(block AS VARCHAR), CAST(blockval AS VARCHAR))")}
       UNION ALL ${duckChk("fingerprints", "plfp",
         "concat_ws('|', fp, CAST(canonical_id AS VARCHAR))")}
       UNION ALL ${duckChk("ivf_lists", "ia2",
         "concat_ws('|', CAST(vec_id AS VARCHAR), CAST(cid AS VARCHAR), CAST(nrm AS VARCHAR))")}
       UNION ALL ${duckChk("knn_graph", "ggraph",
         "concat_ws('|', CAST(g_src AS VARCHAR), CAST(g_dst AS VARCHAR))")}"""
  }

  val forgetCapstone: QueryDef = QueryDef(
    "q_forget_capstone",
    (s, dir) => {
      val (baseT, root) = bootstrap(s, dir)
      // THE erasure request: one predicate, one registry walk
      IndexRegistry.forgetWhere(s, baseT, pmod(col("doc_id"), lit(7)) === 0)
      serveChecksums(s, root)
    },
    Some(checksumOracle("",
      "FROM documents WHERE doc_id % 7 <> 0",
      "FROM embeddings WHERE vec_id % 7 <> 0")))

  /** The UPDATE path through the registry — the round-13 gap
    * pre-closed: [[forgetCapstone]] proves deletes; a real pipeline's
    * other mutation is the in-place EDIT. TWO edits fold through the
    * SAME registry walk as erasure: a TEXT rewrite (doc_id % 9 slice,
    * appended marker — re-crawled/redacted content) and an EMBEDDING
    * rewrite (doc_id % 8 == 1 slice, dimension-reversed — a
    * re-embedded document under a refreshed encoder). Updates arrive
    * in every family's change feed as delete-of-old + insert-of-new:
    * the text families re-sign exactly the edited docs (O(edited));
    * the vector families fold the embedding change for real — old
    * assignments/adjacency cancel by sgn, the new vector re-assigns
    * under the FROZEN quantizer and its graph neighborhood re-ranks
    * from live band candidates (while a text-only edit nets their
    * serve to a no-op, asserted in ForgetSpec). An erasure follows on
    * top, so the serve is text-edit ∘ re-embed ∘ delete. The oracle
    * rebuilds all six structures over the transformed-then-erased
    * corpus via corpus-transform CTEs — hash equality proves the
    * update passes + erasure pass ≡ a full rebuild of the final
    * state, quantizer still trained on the ORIGINAL bootstrap corpus.
    */
  val forgetUpdate: QueryDef = QueryDef(
    "q_forget_update",
    (s, dir) => {
      val (baseT, root) = bootstrap(s, dir, tag = "_upd")
      // EDIT 1: text rewrite, one registry walk
      IndexRegistry.updateWhere(s, baseT, pmod(col("doc_id"), lit(9)) === 0,
        "text", concat(col("text"), lit(" zzupdated")))
      // EDIT 2: re-embedding, one registry walk (vec_id = doc_id where
      // an embedding exists; rows without one keep their null)
      IndexRegistry.updateWhere(s, baseT, pmod(col("doc_id"), lit(8)) === 1,
        "embedding", reverse(col("embedding")))
      // then the erasure on top
      IndexRegistry.forgetWhere(s, baseT, pmod(col("doc_id"), lit(7)) === 0)
      serveChecksums(s, root)
    },
    Some(checksumOracle(
      """udocs AS (SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN text || ' zzupdated' ELSE text END AS text
         FROM documents WHERE doc_id % 7 <> 0),
       uvecs AS (SELECT vec_id,
         CASE WHEN vec_id % 8 = 1 THEN list_reverse(embedding) ELSE embedding END AS embedding
         FROM embeddings WHERE vec_id % 7 <> 0),""",
      "FROM udocs", "FROM uvecs")))

  /** STREAMED erasure requests, exactly-once — the capstone's
    * continuous form: two erasure micro-batches fold through the
    * registry via [[graft.sources.IndexRegistry.forgetBatch]]
    * (tagged delete + one registry walk each), then batch 0 REPLAYS —
    * the foreachBatch-retry case — and must no-op end to end (the
    * ingest tag blocks the re-delete; unchanged base versions leave
    * every maintenance watermark in place). Serving runs conjunctive
    * search over the maintained postings; the oracle recomputes over
    * exactly the twice-erased live corpus, so hash equality proves the
    * replayed erasure stream ≡ one-shot erasure of the union.
    */
  val forgetStreamSearch: QueryDef = QueryDef(
    "t_search_forget_stream",
    (s, dir) => {
      registerBuiltins()
      val root = "/root/repo/target/forget/" +
        dir.replaceAll("[^A-Za-z0-9]", "_") + "_stream"
      Snapshots.deleteRecursively(root)
      val baseT = s"$root/docs"
      val (postT, dlT, totT) = (s"$root/postings", s"$root/doclen", s"$root/totals")
      Snapshots.commitOverwrite(
        Tables.load(s, dir, "documents").select("doc_id", "text"), baseT)
      IndexRegistry.attach(baseT, "bm25", Seq(postT, dlT, totT))
      IndexRegistry.maintainAll(s, baseT)
      val sid = "t_search_forget_stream"
      IndexRegistry.forgetBatch(s, baseT, pmod(col("doc_id"), lit(5)) === 0, sid, 0L)
      IndexRegistry.forgetBatch(s, baseT, pmod(col("doc_id"), lit(11)) === 0, sid, 1L)
      // replayed batch 0 (the foreachBatch retry): must no-op
      IndexRegistry.forgetBatch(s, baseT, pmod(col("doc_id"), lit(5)) === 0, sid, 0L)
      TextFunctions.serveConjunctive(s, TextFunctions.servePostingsNet(
        Snapshots.read(s, postT)
          .where(col("b").isin(TextFunctions.searchBuckets: _*))))
    },
    Some(TextFunctions.conjunctiveOracleSql(
      "WHERE doc_id % 5 <> 0 AND doc_id % 11 <> 0")))

  val defs: Seq[QueryDef] = Seq(forgetCapstone, forgetUpdate, forgetStreamSearch)
}
