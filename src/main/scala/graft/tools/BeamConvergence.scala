package graft.tools

import graft.GraftSession

/** One-off measurement: convergence depth (expansion rounds) of
  * `Similarity.beamUntilConverged` per scale factor — the number that
  * anchors `s_knn_beam_converged`'s statically-unrolled oracle (the
  * oracle must unroll ≥ this many rounds; extra rounds no-op
  * identically in both engines).
  */
object BeamConvergence {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val (df, rounds) =
        graft.operators.Similarity.beamSearchCounted(spark, dir, None)
      val n = df.count()
      println(s"BEAM_CONVERGENCE sf=$sf rounds=$rounds result_rows=$n")
    }
    spark.stop()
  }
}
