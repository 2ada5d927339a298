package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off diagnostic: same built headline plans, measured under BOTH
  * timing protocols in one JVM — interleaved round-robin reps vs
  * per-query blocked best-of-N — to quantify any locality cost of
  * interleaving (run order A, B, A to cancel JIT drift). Not part of the
  * driver contract. */
object BenchCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    def save(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime(); save(df); (System.nanoTime() - t0) / 1e9
    }

    val built = Registry.headlines.map { case (n, q) => n -> q.build(spark, sfDir) }
    for (_ <- 1 to 3) built.foreach { case (_, df) => save(df) }

    def interleaved(reps: Int): Map[String, Double] = {
      val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
      for (_ <- 1 to reps) { System.gc(); built.foreach { case (n, df) => acc(n) ::= time(df) } }
      built.map { case (n, _) => n -> acc(n).min }.toMap
    }
    def blocked(reps: Int): Map[String, Double] =
      built.map { case (n, df) =>
        System.gc()
        n -> (1 to reps).map(_ => time(df)).min
      }.toMap

    def show(tag: String, m: Map[String, Double]): Unit =
      println(f"[$tag] total=${m.values.sum}%.3f " +
        built.map { case (n, _) => f"$n=${m(n)}%.3f" }.mkString(" "))

    show("interleaveA", interleaved(5))
    show("blockedA   ", blocked(4))
    show("interleaveB", interleaved(5))
    show("blockedB   ", blocked(4))
    spark.stop()
  }
}
