package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Variance probe for ref_exports_pipeline_e2e (VERDICT r5 #2: warm reps
  * ranged 0.38–2.4 s within one BENCH_r05 run). Runs the query N times in
  * Bench's session shape and prints per-rep wall time alongside the JVM GC
  * time/count delta for that rep, so a GC-bound slow rep is directly
  * visible. Not part of the driver contract.
  */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gcStats(): (Long, Long) = {
      val beans = ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionTimeMs).sum, beans.map(_.getCollectionCount).sum)
    }
    implicit class GcBean(b: java.lang.management.GarbageCollectorMXBean) {
      def getCollectionTimeMs: Long = b.getCollectionTime
    }

    val df = Registry.byName("ref_exports_pipeline_e2e").build(spark, sfDir)
    println(s"[e2eprobe] heap=${Runtime.getRuntime.maxMemory() / (1 << 20)}m sf=$sfDir")
    for (_ <- 1 to 3) df.write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      val (gt0, gc0) = gcStats()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (gt1, gc1) = gcStats()
      println(f"[e2eprobe] rep $r%2d wall=$wall%.3f gc_ms=${gt1 - gt0}%4d gcs=${gc1 - gc0}%2d")
    }
    spark.stop()
  }
}
