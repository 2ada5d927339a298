package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Diagnostic sibling of [[Bench]]: same session config and run protocol,
  * but per query reports where the wall-clock goes — DataFrame build
  * (analysis), query-execution planning, and execution — plus job/stage/task
  * counts from a listener. Not part of the driver contract; run manually
  * when chasing bench overhead.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val stageTimeMs = new AtomicLong(0)
    val verbose = sys.env.contains("PROBE_STAGES")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        val ms = (for (s <- sc.stageInfo.submissionTime; c <- sc.stageInfo.completionTime)
          yield c - s).getOrElse(0L)
        stageTimeMs.addAndGet(ms)
        if (verbose)
          println(f"[stage] id=${sc.stageInfo.stageId}%3d tasks=${sc.stageInfo.numTasks}%3d " +
            f"ms=$ms%5d ${sc.stageInfo.name.takeWhile(_ != '\n').take(90)}")
      }
    })

    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); stageTimeMs.set(0)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[probe] $name%-28s build=${(t1 - t0) / 1e6}%7.1fms exec=${(t2 - t1) / 1e6}%7.1fms " +
        f"jobs=${jobs.get}%2d stages=${stages.get}%2d tasks=${tasks.get}%4d stageMs=${stageTimeMs.get}%5d")
    }

    val passes = sys.env.getOrElse("PROBE_PASSES", "4").toInt
    for (i <- 1 to passes) {
      println(s"--- pass $i ---")
      Registry.headlines.foreach { case (name, q) => run(name, q.build) }
    }
    spark.stop()
  }
}
