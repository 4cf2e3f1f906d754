package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2 — the reference ingests CSV fixtures
  * into its page-file heap tables; reference: Database.java
  * createTable + the students/courses/enrollments CSV fixtures).
  * Spark-first: columnar parquet is the system of record; CSV/JSON are
  * interchange formats; partitioned and bucketed layouts are the
  * physical-design ("index") levers.
  *
  * Scale notes:
  *  - partitioned writes give partition pruning (the coarse B+-tree);
  *  - bucketed tables pre-shuffle by join key once at write time, so
  *    every later join/aggregate on that key runs with NO exchange —
  *    the 100 TB answer to repeated Grace-hash repartitioning;
  *  - sorted-within-bucket layout adds row-group min/max pruning.
  */
object Sources {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Hive-style partitioned parquet layout; queries filtering on the
    * partition columns scan only matching directories.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table: co-locates rows by join key at
    * write time (one shuffle, amortized over every future query).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
