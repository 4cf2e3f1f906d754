package graft.tools

/** Executable README quick-start — drives the public API end-to-end. */
import graft._
import graft.operators._
object DemoReadme {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[8]", 8)
    val dir = "/root/testdata/sf0.001"
    val result = QueryBuilder(Tables.load(spark, dir, "customer"))
      .join(Tables.load(spark, dir, "orders"), "c_custkey", "o_custkey")
      .where("o_totalprice", PredicateOperator.GreaterThan, 500)
      .groupBy("c_mktsegment")
      .count("n_orders").sum("o_totalprice", "sum_price")
      .execute()
    println("rows=" + result.count())
    println(spark.sql(s"SELECT graft_simhash60(text) AS h FROM parquet.`$dir/documents.parquet` LIMIT 1").head())
    val sg = Dedup.signed(Tables.load(spark, dir, "documents"))
    println("jacc rows=" + Dedup.verifiedJaccard(Dedup.minhashCandidates(sg), sg).count())
    spark.stop()
  }
}
