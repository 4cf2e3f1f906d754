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

/** Copy-on-write mutations — the reference's record insert/update/
  * delete path (reference: Database.java Transaction addRecord /
  * updateRecord / deleteRecord on mutable heap files) re-expressed for
  * immutable columnar storage: a mutation is a rewritten snapshot,
  * committed atomically by the job commit protocol. Readers always see
  * a complete snapshot (the P3 isolation story without a lock manager).
  */
object Mutations {
  import org.apache.spark.sql.{Column, SparkSession}

  /** Append rows (schema-aligned by name). */
  def insertInto(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Delete = rewrite without matching rows; returns rows remaining. */
  def deleteWhere(spark: SparkSession, path: String, cond: Column, outPath: String): Long = {
    val remaining = spark.read.parquet(path).where(!cond)
    remaining.write.mode(SaveMode.Overwrite).parquet(outPath)
    spark.read.parquet(outPath).count()
  }

  /** Update = rewrite with the column conditionally replaced. */
  def updateWhere(spark: SparkSession, path: String, cond: Column,
      column: String, value: Column, outPath: String): Unit = {
    import org.apache.spark.sql.functions.when
    val df = spark.read.parquet(path)
    df.withColumn(column, when(cond, value).otherwise(df(column)))
      .write.mode(SaveMode.Overwrite).parquet(outPath)
  }
}
