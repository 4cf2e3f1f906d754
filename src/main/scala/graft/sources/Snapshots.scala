package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned snapshot layer over parquet sinks — the
  * table-format pattern (Iceberg/Delta-style, re-implemented minimally
  * on plain files): every commit writes immutable data directories
  * plus a manifest listing the directories that make up that version;
  * readers resolve a manifest once and then see a frozen snapshot no
  * later commit can disturb. This completes the reference's
  * transaction story (reference: Database.java Transaction begin/
  * commit over heap files; concurrency/LockManager.java) the
  * Spark-native way: writers never mutate what readers can see, so
  * isolation needs no lock manager — only an atomic manifest swap.
  *
  * Layout:
  * {{{
  *   table/
  *     data/<version>-<nonce>/part-*.parquet   (immutable)
  *     meta/v<N>.manifest                      (one data dir per line)
  *     meta/HEAD                               (current version number)
  * }}}
  *
  * Scale notes: a manifest lists directories, not files, so it stays
  * tiny; commits are O(new data) with no rewrite of prior versions;
  * `vacuum` drops directories unreachable from any retained manifest.
  * On a real deployment HEAD's atomic rename maps to the metastore /
  * catalog swap every table format relies on.
  */
object Snapshots {

  private def meta(table: String): Path = Paths.get(table, "meta")
  private def head(table: String): Path = meta(table).resolve("HEAD")

  /** Current committed version, 0 if the table does not exist yet. */
  def currentVersion(table: String): Int =
    if (Files.exists(head(table)))
      new String(Files.readAllBytes(head(table)), StandardCharsets.UTF_8).trim.toInt
    else 0

  private def manifestDirs(table: String, version: Int): Seq[String] = {
    val p = meta(table).resolve(s"v$version.manifest")
    require(Files.exists(p), s"no snapshot v$version at $table")
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq.filter(_.nonEmpty)
  }

  private def writeManifest(table: String, version: Int, dirs: Seq[String]): Unit = {
    Files.createDirectories(meta(table))
    val tmp = meta(table).resolve(s".v$version.manifest.tmp")
    Files.write(tmp, dirs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, meta(table).resolve(s"v$version.manifest"),
      StandardCopyOption.ATOMIC_MOVE)
    val tmpHead = meta(table).resolve(".HEAD.tmp")
    Files.write(tmpHead, version.toString.getBytes(StandardCharsets.UTF_8))
    // the commit point: readers resolve HEAD before or after, never mid-swap
    Files.move(tmpHead, head(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeData(df: DataFrame, table: String, version: Int): String = {
    val dir = Paths.get(table, "data", s"$version-${java.util.UUID.randomUUID}")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)
    dir.toString
  }

  /** Commit a new version whose content REPLACES the table. */
  def commitOverwrite(df: DataFrame, table: String): Int = {
    val v = currentVersion(table) + 1
    writeManifest(table, v, Seq(writeData(df, table, v)))
    v
  }

  /** Commit a new version = previous content plus `df` (no rewrite of
    * existing data).
    */
  def commitAppend(df: DataFrame, table: String): Int = {
    val prev = currentVersion(table)
    val prevDirs = if (prev == 0) Seq.empty else manifestDirs(table, prev)
    val v = prev + 1
    writeManifest(table, v, prevDirs :+ writeData(df, table, v))
    v
  }

  /** Read the latest snapshot. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, currentVersion(table))

  /** Time travel: read the exact content of any committed version. */
  def readVersion(spark: SparkSession, table: String, version: Int): DataFrame =
    spark.read.parquet(manifestDirs(table, version): _*)

  /** Drop data directories unreachable from the retained manifests
    * (keep the last `retain` versions). Returns deleted dir count.
    */
  def vacuum(table: String, retain: Int = 1): Int = {
    val cur = currentVersion(table)
    val keep = ((cur - retain + 1) to cur).filter(_ >= 1)
      .flatMap(v => manifestDirs(table, v)).toSet
    val dataRoot = Paths.get(table, "data")
    if (!Files.exists(dataRoot)) return 0
    val doomed = Files.list(dataRoot).iterator().asScala.toSeq
      .filterNot(p => keep.contains(p.toString))
    doomed.foreach { p =>
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    // retire manifests below the retention window so vacuumed versions
    // cannot be resolved to missing files
    (1 to cur - retain).foreach { v =>
      Files.deleteIfExists(meta(table).resolve(s"v$v.manifest"))
    }
    doomed.size
  }
}
