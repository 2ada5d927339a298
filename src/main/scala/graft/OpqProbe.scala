package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.Similarity

/** Measurement probe behind the OPQ design note (VERDICT r9 #8):
  * recall@5 vs the cosine brute force for plain PQ and the
  * Householder-rotated PQ at the same (m, k, rounds) code budget. On
  * this corpus's near-flat covariance spectrum (PC1 share ≈ 2.8%) the
  * two measure EQUAL — the textbook OPQ result that rotation gains
  * concentrate on anisotropic embeddings (DataOpsSpec plants one and
  * proves the error cut). Not part of the driver contract.
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    val emb = Tables.embeddingsHot(spark, sfDir)
    val q = Tables.embeddings(spark, sfDir).where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val truth = Similarity
      .bruteForceTopK(q, Tables.embeddings(spark, sfDir), k = 5)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(top: DataFrame): Double = {
      val got = top.select(col("q_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }

    val (m, k, rounds) = (4, 4, 1)
    println(f"[opq] plain ${recallOf(Similarity.pqTopK(q, emb, m, k, rounds, 5))}%.3f")
    println(f"[opq] opq   ${recallOf(Similarity.opqTopK(q, emb, pcaRounds = 3, m, k, rounds, 5))}%.3f")
    spark.stop()
  }
}
