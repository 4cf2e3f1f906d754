package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try println("RECURSIVE OK: " + s.sql("WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r WHERE n < 5) SELECT sum(n) AS t FROM r").collect().mkString)
    catch { case e: Throwable => println("RECURSIVE FAIL: " + e.getMessage.take(300)) }
    try {
      import org.apache.spark.sql.functions._
      val df = s.range(3).selectExpr("id", "cast(id as string) v")
      df.write.mode("overwrite").orc("/tmp/orc_probe")
      println("ORC OK: " + s.read.orc("/tmp/orc_probe").count())
    } catch { case e: Throwable => println("ORC FAIL: " + e.getMessage.take(200)) }
    s.stop()
  }
}
