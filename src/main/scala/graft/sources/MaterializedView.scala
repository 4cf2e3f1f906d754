package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained materialized aggregates over a
  * [[Snapshots]] base table — the missing piece between the snapshot
  * log and serving: a grouped count/sum view that a refresh brings
  * current by folding ONLY the data directories appended since the
  * last refresh (algebraic merge — counts and sums add), never
  * re-scanning history.
  *
  * The refreshed-through base version rides as a tag inside the MV's
  * own atomically-claimed manifest, so
  *  - refreshes are IDEMPOTENT (already-current → no new version),
  *  - a crash between base append and MV refresh loses nothing (the
  *    next refresh sees the old watermark and folds the gap),
  *  - the MV is itself versioned and time-travelable like any table.
  * If the base history was REWRITTEN under the watermark (compaction /
  * overwrite / DML / merge), dir-level delta folding would double- or
  * miss-count — detected by a dir-set subset check. Count/sum MVs
  * then fold the row-level CHANGE FEED ([[Snapshots.changesBetween]]:
  * only the dirs that entered/left the manifest are read; deletes
  * subtract — the aggregates are abelian); min/max MVs, which are not
  * deletion-invertible, fall back to one full recompute and a fresh
  * watermark.
  *
  * At 100 TB this is the nightly-rollup pattern: refresh cost is
  * O(new data) + O(|MV|), not O(base); sums stay exact decimals so a
  * merged refresh is bit-identical to a full recompute (tested, and
  * hash-checked against DuckDB by `q_mv_incremental`).
  */
object MaterializedView {

  private val TagPrefix = "mv_through "

  /** How the last refresh of EACH view on this JVM brought it current
    * — keyed by mvTable because maintainers now run CONCURRENTLY by
    * default under the parallel registry walk (a process-wide mutable
    * field would race two same-kind views and make the cost-path
    * assertions flaky). Values: "bootstrap" | "append-fold" |
    * "cdc-fold" | "recompute*" (aggregate views), "append-fold" |
    * "recompute*" (sketch views), "bootstrap" | "delta-join" | "noop"
    * (join views). Test introspection only.
    */
  private val refreshModes =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The cost path the last refresh of `mvTable` took on this JVM
    * ("" if never refreshed here).
    */
  def lastRefreshModeOf(mvTable: String): String =
    Option(refreshModes.get(mvTable)).getOrElse("")

  private def setMode(mvTable: String, mode: String): Unit = {
    refreshModes.put(mvTable, mode); ()
  }

  /** The base version the MV at `mvTable` currently reflects (0 if the
    * MV does not exist yet).
    */
  def refreshedThrough(mvTable: String): Int =
    refreshedThroughAt(mvTable, Snapshots.currentVersion(mvTable))

  /** [[refreshedThrough]] at a PINNED view version — the accessor an
    * optimizer-rule registration must use so the watermark and the
    * served dirs come from the SAME version read (a concurrent refresh
    * landing between two separate head reads would pair an old
    * watermark with newer view content — a wrong answer, not
    * staleness).
    */
  def refreshedThroughAt(mvTable: String, v: Int): Int =
    if (v == 0) 0
    else Snapshots.versionTags(mvTable, v).collectFirst {
      case t if t.startsWith(TagPrefix) => t.drop(TagPrefix.length).toInt
    }.getOrElse(0)

  /** Stable MV schema: keys, `cnt` long, one exact decimal(38,6)
    * running sum per sum column, plus native-typed min/max columns.
    * count/sum/min/max are the algebraic aggregates an APPEND-only
    * fold maintains exactly (deletes/rewrites trip the recompute
    * path); avg is served at read as sum/cnt of exact operands.
    */
  private def aggregate(df: DataFrame, keys: Seq[String], sums: Seq[String],
      mins: Seq[String], maxs: Seq[String]): DataFrame = {
    val aggs = sums.map(c => sum(col(c).cast("decimal(18,2)")).as(s"sum_$c")) ++
      mins.map(c => min(col(c)).as(s"min_$c")) ++
      maxs.map(c => max(col(c)).as(s"max_$c"))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), aggs: _*)
      .select(keys.map(col) ++ (col("cnt") +:
        (sums.map(c => col(s"sum_$c").cast("decimal(38,6)").as(s"sum_$c")) ++
          mins.map(c => col(s"min_$c")) ++
          maxs.map(c => col(s"max_$c")))): _*)
  }

  /** Bring the MV current with the base table's head version. Returns
    * the MV version serving the result (unchanged when already
    * current). Racing refreshes serialize on a compare-and-swap of the
    * MV head: the watermark tag AND the MV content are both read from
    * ONE pinned MV version, and the fold commits only if the head is
    * still that version ([[Snapshots.commitOverwriteTaggedIf]]) — a
    * loser re-reads the winner's MV and re-folds, so a delta can never
    * land on top of content that already folded it (double-counting).
    */
  def refresh(spark: SparkSession, baseTable: String, mvTable: String,
      keys: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): Int = {
    val curV = Snapshots.currentVersion(baseTable)
    require(curV > 0, s"base table $baseTable has no committed version")
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 20, s"MV refresh of $mvTable lost $attempt head races")
      // pin one MV version: watermark and content below both resolve
      // from mvV, never from a re-read head
      val mvV = Snapshots.currentVersion(mvTable)
      val lastV =
        if (mvV == 0) 0
        else Snapshots.versionTags(mvTable, mvV).collectFirst {
          case t if t.startsWith(TagPrefix) => t.drop(TagPrefix.length).toInt
        }.getOrElse(0)
      // >=: a racing refresher may have folded a NEWER base version first
      if (lastV >= curV) return mvV

      // a vacuumed watermark version (retention passed under the MV)
      // must degrade to a full recompute, not fail every refresh
      // forever on an unresolvable manifest
      val watermarkGone = lastV > 0 && !Snapshots.versionAvailable(baseTable, lastV)
      val newDirs = Snapshots.versionDirs(baseTable, curV)
      val oldDirs = if (lastV == 0 || watermarkGone) Seq.empty
        else Snapshots.versionDirs(baseTable, lastV)
      def merges = sums.map(c => sum(col(s"sum_$c")).cast("decimal(38,6)").as(s"sum_$c")) ++
        mins.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        maxs.map(c => max(col(s"max_$c")).as(s"max_$c"))
      def foldInto(delta: DataFrame) =
        Snapshots.readVersion(spark, mvTable, mvV).unionByName(delta)
          .groupBy(keys.map(col): _*)
          .agg(sum(col("cnt")).cast("long").as("cnt"), merges: _*)
      val fresh =
        if (lastV == 0) {
          setMode(mvTable, "bootstrap")
          aggregate(Snapshots.readVersion(spark, baseTable, curV), keys, sums, mins, maxs)
        } else if (watermarkGone) {
          setMode(mvTable, "recompute-vacuumed")
          aggregate(Snapshots.readVersion(spark, baseTable, curV), keys, sums, mins, maxs)
        } else if (oldDirs.toSet.subsetOf(newDirs.toSet)) {
          setMode(mvTable, "append-fold")
          val deltaDirs = newDirs.filterNot(oldDirs.toSet)
          // a tag-only base bump (new version, zero new data dirs)
          // must advance the watermark, not crash an empty-path read
          if (deltaDirs.isEmpty) Snapshots.readVersion(spark, mvTable, mvV)
          else foldInto(aggregate(spark.read.parquet(deltaDirs: _*), keys, sums, mins, maxs))
        } else if (mins.isEmpty && maxs.isEmpty) {
          // history REWRITTEN under the watermark (DML / merge /
          // compaction): counts and exact-decimal sums are ABELIAN, so
          // fold the row-level change feed — which reads ONLY the dirs
          // that entered or left the manifest — instead of re-scanning
          // the base. A fully-deleted group's count reaches 0 and is
          // dropped. (A pure compaction's feed is empty — the fold
          // no-ops where the old path re-scanned everything.)
          setMode(mvTable, "cdc-fold")
          val (ins, del) = Snapshots.changesBetween(spark, baseTable, lastV, curV)
          val plus = aggregate(ins, keys, sums, Nil, Nil)
          val minus = aggregate(del, keys, sums, Nil, Nil)
            .select(keys.map(col) ++ ((-col("cnt")).as("cnt") +:
              sums.map(c => (-col(s"sum_$c")).cast("decimal(38,6)").as(s"sum_$c"))): _*)
          foldInto(plus.unionByName(minus)).where(col("cnt") > 0)
        } else {
          // min/max are not deletion-invertible: a rewritten history
          // under a min/max MV recomputes from the current snapshot
          setMode(mvTable, "recompute")
          aggregate(Snapshots.readVersion(spark, baseTable, curV), keys, sums, mins, maxs)
        }
      Snapshots.commitOverwriteTaggedIf(fresh, mvTable, mvV, Seq(TagPrefix + curV))
        .foreach(v => return v)
      // head moved between our pin and the claim: re-fold from the
      // winner's MV
    }
    -1 // unreachable
  }

  /** Continuously maintained rollup: each micro-batch lands in the
    * base snapshot table EXACTLY-ONCE ([[Snapshots.ingestBatch]]) and
    * the MV is brought current in the same foreachBatch — so readers
    * of the MV always see a consistent, at-most-one-batch-stale
    * aggregate. A replayed batch no-ops on both sides: the ingest tag
    * blocks the double-append, and the refresh watermark is already at
    * the head. The streaming form of the nightly-rollup pattern.
    *
    * With `autoRegister` the MV-aware rewrite pin
    * ([[graft.plans.MvRewrite.register]]) moves forward INSIDE the
    * same foreachBatch, replacing the table's previous registration —
    * so a matching aggregate issued BETWEEN micro-batches is served
    * fresh from the view; without it (or in the refresh-to-register
    * instant) the structural freshness check makes the query fall back
    * to its base scan, never to a stale answer.
    */
  def ingestWithRollup(stream: DataFrame, baseTable: String, mvTable: String,
      streamId: String, keys: Seq[String], sums: Seq[String],
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil,
      autoRegister: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Snapshots.ingestBatch(batch, baseTable, streamId, batchId)
        refresh(batch.sparkSession, baseTable, mvTable, keys, sums, mins, maxs)
        if (autoRegister)
          graft.plans.MvRewrite.register(baseTable, mvTable, keys, sums, mins, maxs)
        ()
      }

  // ---- incrementally maintained SKETCH views (mergeable state) ----

  private val SkTagPrefix = "mvsk_through "

  /** The base version the SKETCH view at `mvTable` currently reflects
    * (0 if the view does not exist yet) — [[refreshedThrough]]'s twin
    * under the sketch watermark, read by the optimizer-rule pin
    * ([[graft.plans.MvRewrite.registerSketch]]).
    */
  def sketchRefreshedThrough(mvTable: String): Int =
    sketchRefreshedThroughAt(mvTable, Snapshots.currentVersion(mvTable))

  /** [[sketchRefreshedThrough]] at a PINNED view version — see
    * [[refreshedThroughAt]] for why registrations must pin one read.
    */
  def sketchRefreshedThroughAt(mvTable: String, v: Int): Int =
    if (v == 0) 0
    else Snapshots.versionTags(mvTable, v).collectFirst {
      case t if t.startsWith(SkTagPrefix) => t.drop(SkTagPrefix.length).toInt
    }.getOrElse(0)

  /** Incrementally maintained MERGEABLE-SKETCH view — the sketch cell
    * of the MV matrix next to count/sum (abelian fold), min/max
    * (recompute on DML) and join views (signed deltas): per-key HLL
    * sketches of `idCol` (approximate distinct) brought current by
    * UNION-MERGING only the data directories appended since the last
    * refresh. HLL registers merge by max, so an append fold is exact —
    * the merged view's REGISTERS (hence estimates) equal a one-shot
    * recompute's, not merely within error (asserted in SourcesSpec).
    * Deletes are NOT invertible (a register has no memory of who set
    * it): a rewritten history degrades to one full recompute and a
    * fresh watermark, the min/max convention. Same CAS head discipline
    * as [[refresh]].
    *
    * At 100 TB this is the streaming-distinct pattern: per-(day,
    * dimension) user sketches maintained at O(new data) per refresh
    * with |MV| ≈ keys × 2^lgK bytes, served with union-across-keys
    * rollups — the exact distinct would need a users×keys shuffle per
    * question.
    */
  def sketchRefresh(spark: SparkSession, baseTable: String, mvTable: String,
      keys: Seq[String], idCol: String, lgK: Int = 12): Int = {
    val curV = Snapshots.currentVersion(baseTable)
    require(curV > 0, s"base table $baseTable has no committed version")
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 20, s"sketch-MV refresh of $mvTable lost $attempt head races")
      val mvV = Snapshots.currentVersion(mvTable)
      val lastV =
        if (mvV == 0) 0
        else Snapshots.versionTags(mvTable, mvV).collectFirst {
          case t if t.startsWith(SkTagPrefix) => t.drop(SkTagPrefix.length).toInt
        }.getOrElse(0)
      // >=: a racing refresher may have folded a NEWER base version first
      if (lastV >= curV) return mvV
      def agg(df: DataFrame) = df.groupBy(keys.map(col): _*)
        .agg(expr(s"hll_sketch_agg($idCol, $lgK)").as("sk"))
      val watermarkGone = lastV > 0 && !Snapshots.versionAvailable(baseTable, lastV)
      val newDirs = Snapshots.versionDirs(baseTable, curV)
      val oldDirs = if (lastV == 0 || watermarkGone) Seq.empty
        else Snapshots.versionDirs(baseTable, lastV)
      val fresh =
        if (lastV == 0) {
          setMode(mvTable, "bootstrap")
          agg(Snapshots.readVersion(spark, baseTable, curV))
        } else if (watermarkGone) {
          setMode(mvTable, "recompute-vacuumed")
          agg(Snapshots.readVersion(spark, baseTable, curV))
        } else if (oldDirs.toSet.subsetOf(newDirs.toSet)) {
          setMode(mvTable, "append-fold")
          val deltaDirs = newDirs.filterNot(oldDirs.toSet)
          // a tag-only base bump (new version, zero new data dirs)
          // must advance the watermark, not crash an empty-path read
          if (deltaDirs.isEmpty) Snapshots.readVersion(spark, mvTable, mvV)
          else Snapshots.readVersion(spark, mvTable, mvV)
            .unionByName(agg(spark.read.parquet(deltaDirs: _*)))
            .groupBy(keys.map(col): _*)
            .agg(expr("hll_union_agg(sk)").as("sk"))
        } else {
          // history rewritten under the watermark: registers are not
          // deletion-invertible — recompute from the current snapshot
          setMode(mvTable, "recompute")
          agg(Snapshots.readVersion(spark, baseTable, curV))
        }
      Snapshots.commitOverwriteTaggedIf(fresh, mvTable, mvV, Seq(SkTagPrefix + curV))
        .foreach(v => return v)
    }
    -1 // unreachable
  }

  /** Continuously maintained sketch rollup — [[ingestWithRollup]]'s
    * mergeable-state twin: each micro-batch lands in the base
    * exactly-once and the sketch view union-merges the batch's
    * registers in the same foreachBatch (an append fold by
    * construction — streaming ingest never rewrites history). A
    * replayed batch no-ops on both sides. With `autoRegister` the
    * sketch-rewrite pin ([[graft.plans.MvRewrite.registerSketch]])
    * moves forward inside the same foreachBatch — a matching
    * `hll_sketch_agg` aggregate issued between micro-batches is
    * optimizer-served from the stored registers, and the structural
    * freshness check falls back to the base scan in the
    * refresh-to-register instant, never to a stale answer.
    */
  def ingestWithSketchRollup(stream: DataFrame, baseTable: String,
      mvTable: String, streamId: String, keys: Seq[String], idCol: String,
      lgK: Int = 12, autoRegister: Boolean = false)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Snapshots.ingestBatch(batch, baseTable, streamId, batchId)
        sketchRefresh(batch.sparkSession, baseTable, mvTable, keys, idCol, lgK)
        if (autoRegister)
          graft.plans.MvRewrite.registerSketch(baseTable, mvTable, keys, idCol, lgK)
        ()
      }

  // ---- incrementally maintained JOIN views (delta joins) ----

  private val JTagL = "mvj_left_through "
  private val JTagR = "mvj_right_through "

  /** The (left base, right base) versions the JOIN view at `mvTable`
    * currently reflects ((0, 0) if the view does not exist) — read by
    * the optimizer-rule pin ([[graft.plans.MvRewrite.registerJoin]]).
    */
  def joinRefreshedThrough(mvTable: String): (Int, Int) =
    joinRefreshedThroughAt(mvTable, Snapshots.currentVersion(mvTable))

  /** [[joinRefreshedThrough]] at a PINNED view version — see
    * [[refreshedThroughAt]] for why registrations must pin one read.
    */
  def joinRefreshedThroughAt(mvTable: String, v: Int): (Int, Int) = {
    if (v == 0) return (0, 0)
    def tagOf(prefix: String) = Snapshots.versionTags(mvTable, v).collectFirst {
      case t if t.startsWith(prefix) => t.drop(prefix.length).toInt
    }.getOrElse(0)
    (tagOf(JTagL), tagOf(JTagR))
  }

  /** Incrementally maintained JOIN view V = π(cols)(L ⋈_key R) over
    * two [[Snapshots]] base tables — the other half of view
    * maintenance next to [[refresh]]'s aggregates: joins are not
    * algebraic per group, so the delta is the SIGNED delta-join
    * expansion in its two-term form (V_new − V_old = ΔL⋈R_new +
    * L_old⋈ΔR — the classic three-term ΔL⋈R_old + L_old⋈ΔR + ΔL⋈ΔR
    * nets to the same multiset by bilinearity; deletes carry −1),
    * appended as tombstone-folded rows and netted at read
    * ([[serveJoin]]). Each refresh reads ONLY the change feed of each
    * base ([[Snapshots.changesBetween]] — the dirs that entered/left
    * the manifest) joined against the other side's pinned version:
    * O(Δ·matched) per refresh, never a full re-join. Per-base
    * watermark versions ride as tags on the view's own atomic commits
    * (crash between base DML and refresh loses nothing — the next
    * refresh folds the gap); appends are HEAD-CAS-checked against the
    * pinned view version (the [[refresh]]/foldThrough discipline), so
    * two concurrent refreshers cannot double-fold one span's signed
    * delta, with a size-ratio compaction trigger ([[joinCompact]])
    * bounding tombstone debt.
    *
    * At 100 TB this is how a wide denormalized serving table follows
    * its normalized sources: the delta join shuffles only changed keys
    * plus their matches, and the netted view is itself a snapshot
    * table — versioned, time-travelable, compactable.
    */
  def joinRefresh(spark: SparkSession, leftTable: String, rightTable: String,
      mvTable: String, key: String): Int = {
    val lCur = Snapshots.currentVersion(leftTable)
    val rCur = Snapshots.currentVersion(rightTable)
    require(lCur > 0 && rCur > 0, "both join-view bases need a committed version")
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 20, s"join-view refresh of $mvTable lost $attempt head races")
      // pin ONE view head: both watermark tags and the CAS below
      // resolve from mvV — a racing refresher that committed first
      // aborts ours, and the retry re-derives the remaining delta from
      // the winner's tags (the foldThrough discipline; a blind append
      // would double-fold the signed expansion, which netting cannot
      // cancel)
      val mvV = Snapshots.currentVersion(mvTable)
      def tagOf(prefix: String) =
        if (mvV == 0) 0
        else Snapshots.versionTags(mvTable, mvV).collectFirst {
          case t if t.startsWith(prefix) => t.drop(prefix.length).toInt
        }.getOrElse(0)
      val (lLast, rLast) = (tagOf(JTagL), tagOf(JTagR))
      if (lLast >= lCur && rLast >= rCur) { setMode(mvTable, "noop"); return mvV }
      val tags = Seq(JTagL + math.max(lCur, lLast), JTagR + math.max(rCur, rLast))
      // vacuumed watermark on either base → full bootstrap recompute
      // (the aggregate-MV convention), never a permanently failing
      // delta read against a retired manifest
      val committed =
        if (lLast == 0 || rLast == 0 ||
            !Snapshots.versionAvailable(leftTable, lLast) ||
            !Snapshots.versionAvailable(rightTable, rLast)) {
          setMode(mvTable, "bootstrap")
          val full = Snapshots.readVersion(spark, leftTable, math.max(lCur, lLast))
            .join(Snapshots.readVersion(spark, rightTable, math.max(rCur, rLast)), key)
            .withColumn("sgn", lit(1L))
          // all-sgn=1 content: serveJoin's per-row explode(1..1) is the
          // identity, so the bootstrap may serve without re-netting
          Snapshots.commitOverwriteTaggedIf(full, mvTable, mvV,
            tags :+ Snapshots.NettedTag)
        } else {
          setMode(mvTable, "delta-join")
          val lTo = math.max(lCur, lLast)
          val rTo = math.max(rCur, rLast)
          val (lIns, lDel) = Snapshots.changesBetween(spark, leftTable, lLast, lTo)
          val (rIns, rDel) = Snapshots.changesBetween(spark, rightTable, rLast, rTo)
          val dL = lIns.withColumn("sl", lit(1L)).unionByName(
            lDel.withColumn("sl", lit(-1L)))
          val dR = rIns.withColumn("sr", lit(1L)).unionByName(
            rDel.withColumn("sr", lit(-1L)))
          // TWO-term signed expansion (r15): V_new − V_old =
          // ΔL⋈R_new + L_old⋈ΔR — the three-term ΔL⋈R_old + L_old⋈ΔR +
          // ΔL⋈ΔR form netted to the same multiset (bilinearity of ⋈
          // over signed multisets: ΔL⋈R_new = ΔL⋈R_old + ΔL⋈ΔR) but
          // ran one more join per refresh and appended tombstone pairs
          // that only existed to cancel at read. One fewer join, fewer
          // appended rows, identical net view (SourcesSpec serving
          // assertions + the q_mv_join_* oracles are the proof).
          val lOld = Snapshots.readVersion(spark, leftTable, lLast)
          val rNew = Snapshots.readVersion(spark, rightTable, rTo)
          val delta =
            dL.join(rNew, key).withColumn("sgn", col("sl")).drop("sl")
              .unionByName(
                lOld.join(dR, key).withColumn("sgn", col("sr")).drop("sr"))
          Snapshots.commitAppendTaggedIf(delta, mvTable, mvV, tags)
        }
      committed.foreach { v =>
        joinMaybeCompact(spark, mvTable)
        return v
      }
    }
    -1 // unreachable
  }

  /** Net view of the signed join rows: multiset multiplicity restored
    * by expanding each surviving row `net` times (a join view is a
    * BAG — two identical right rows yield two identical view rows).
    */
  def serveJoin(spark: SparkSession, mvTable: String): DataFrame = {
    // pin ONE version for the netted check and the read (a refresh
    // landing in between must not pair a stale tag with new content)
    val v = Snapshots.currentVersion(mvTable)
    val df = Snapshots.readVersion(spark, mvTable, v)
    val cols = df.columns.filter(_ != "sgn").toSeq
    if (Snapshots.nettedAt(mvTable, v))
      // compacted head: content IS the netted view (one row per
      // distinct value, sgn = its bag multiplicity) — skip the
      // re-netting shuffle, expand multiplicity with the streaming
      // generator (never an O(multiplicity) sequence array)
      Snapshots.replicateRows(df, col("sgn"), cols)
    else
      Snapshots.replicateRows(
        df.groupBy(cols.map(col): _*).agg(sum(col("sgn")).as("net")),
        col("net"), cols)
  }

  /** Size-ratio-triggered major compaction of the signed join view —
    * [[Snapshots.maybeCompactNet]]'s policy, but preserving BOTH
    * per-base watermark tags (which that single-prefix helper cannot
    * carry): CAS on the head read at fold start, retry on conflict so
    * a racing maintenance append is never dropped.
    */
  private def joinMaybeCompact(spark: SparkSession, mvTable: String,
      maxDeltaRatio: Double = 0.5): Option[Int] = {
    val (base, delta) = Snapshots.compactionDebt(spark, mvTable)
    if (delta <= maxDeltaRatio * math.max(base, 1L)) return None
    var out = -1
    while (out < 0) {
      val head = Snapshots.currentVersion(mvTable)
      val tags = Snapshots.versionTags(mvTable, head)
        .filter(t => t.startsWith(JTagL) || t.startsWith(JTagR))
      val df = Snapshots.readVersion(spark, mvTable, head)
      val cols = df.columns.filter(_ != "sgn").toSeq
      val netted = df.groupBy(cols.map(col): _*).agg(sum(col("sgn")).as("sgn"))
        .where(col("sgn") > 0)
      // the compacted content IS the netted view — tag it so serves
      // skip the re-netting shuffle (see Snapshots.NettedTag)
      Snapshots.commitOverwriteTaggedIf(netted, mvTable, head,
          tags :+ Snapshots.NettedTag)
        .foreach(v => out = v)
    }
    Some(out)
  }
}
