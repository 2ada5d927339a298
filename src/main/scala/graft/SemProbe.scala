package graft

import org.apache.spark.sql.SparkSession

import graft.data.Dedup

/** Cell-count knob probe for SemDeDup (round 8): times
  * [[Dedup.semanticDedup]] at the oracle-fixed 8 cells vs
  * [[Dedup.semanticDedupScaled]] (cells ∝ corpus) on a ScaleGen
  * directory — demonstrating that the quadratic-in-cell-size pairwise
  * stage is bounded by the cell-size knob, not by the corpus. Not part
  * of the driver contract.
  *
  * Usage: `runMain graft.SemProbe <sfDir>`.
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Tables.embeddingsHot(spark, sfDir)
    val n = corpus.count()
    println(s"[semprobe] corpus=$n embeddings")
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val plan = df
      plan.write.format("noop").mode("overwrite").save() // warm
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        plan.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[semprobe] $label%-28s $best%.3f s")
      spark.catalog.clearCache()
    }
    time("kCells=8 (oracle-fixed)")(
      Dedup.semanticDedup(corpus, kCells = 8, rounds = 2, tau = 0.3))
    time("scaled (cell<=2000)")(
      Dedup.semanticDedupScaled(corpus, rounds = 2, tau = 0.3))
    spark.stop()
  }
}
