package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the correctness baseline,
  * and an IVF-style coarse-quantizer variant as the scale path (probe one
  * cell instead of the whole corpus).
  *
  * Determinism: dot products are LEFT FOLDS in index order
  * (`aggregate(zip_with(...))`), which any engine reproduces exactly
  * (0.0 + x == x in IEEE754, so an init-less fold matches too). No
  * engine-private vector kernels.
  *
  * Scale: brute force is a broadcast crossJoin of the (small) query set
  * against the corpus — embarrassingly parallel, no shuffle of the corpus.
  * IVF assigns each query to its nearest representative and searches only
  * that cell: corpus stays partitioned (ideally bucketed) by cell id, and
  * the probe is a partition-pruned scan. Representatives here are the
  * min-id member per cell (deterministic); production would fit k-means
  * centroids offline.
  */
object Similarity {

  /** Index-ordered left-fold dot product of two float vectors, in doubles —
    * the composable HOF reference form. [[graft.functions.FloatVecDot]] is
    * the codegen'd equivalent (bit-identical results); the search operators
    * below use it via `vec_dot` after registering it on the session. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def cosineFast(df: DataFrame)(a: Column, b: Column): Column = {
    val d = fastDot(df) _
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  private def fastDot(df: DataFrame)(a: Column, b: Column): Column = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    graft.functions.VectorFunctions.vec_dot(a, b)
  }

  /** Brute-force top-k: for each query row, the k nearest corpus rows by
    * cosine (ties broken by corpus id). Query set must be small — it is
    * broadcast. Norms are precomputed once per side (N + Q sqrt-folds)
    * instead of per pair (2·N·Q) before the crossJoin. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "q_id", qVec: String = "q_vec",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val d = fastDot(corpus) _
    val qn = queries.withColumn("q_norm", sqrt(d(col(qVec), col(qVec))))
    val cn = corpus.withColumn("c_norm", sqrt(d(col(cVec), col(cVec))))
    val joined = cn.crossJoin(broadcast(qn))
      .where(col(qId) =!= col(cId))
      .withColumn("cos_sim",
        d(col(qVec), col(cVec)) / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId))
    joined.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col(qId), col("rnk"), col(cId).as("neighbor_id"), col("cos_sim"))
  }

  /** Deterministic cell representatives: the min-id member per cell. */
  def representatives(corpus: DataFrame, cellCol: String, idCol: String,
                      vecCol: String): DataFrame = {
    val minIds = corpus.groupBy(col(cellCol)).agg(min(col(idCol)).as(idCol))
    corpus.join(minIds, Seq(cellCol, idCol))
      .select(col(cellCol).as("cell"), col(vecCol).as("rep_vec"))
  }

  /** IVF-style search: route each query to its `nprobe` nearest
    * representatives' cells, then brute-force only within those cells.
    * `nprobe` is the standard IVF recall/cost knob — 1 probes a single
    * cell (fastest, lowest recall); raising it approaches brute force.
    * Probed cells are disjoint, so each corpus row scores at most once
    * and the final per-query rank is global across probes. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int,
              nprobe: Int = 1,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val reps = representatives(corpus, cellCol, cId, cVec)
    val scored = queries.crossJoin(broadcast(reps))
      .withColumn("rep_sim", cosineFast(corpus)(col(qVec), col("rep_vec")))
    val wAssign = Window.partitionBy(col(qId))
      .orderBy(col("rep_sim").desc, col("cell"))
    val assigned = scored.withColumn("rn", row_number().over(wAssign))
      .where(col("rn") <= nprobe)
      .select(col(qId), col(qVec), col("cell"))
    val inCell = corpus.join(broadcast(assigned), corpus(cellCol) === col("cell"))
      .where(col(qId) =!= col(cId))
      .withColumn("cos_sim", cosineFast(corpus)(col(qVec), col(cVec)))
    val wTop = Window.partitionBy(col(qId)).orderBy(col("cos_sim").desc, col(cId))
    inCell.withColumn("rnk", row_number().over(wTop).cast("long"))
      .where(col("rnk") <= k)
      .select(col(qId), col("cell"), col("rnk"), col(cId).as("neighbor_id"),
        col("cos_sim"))
  }
}
