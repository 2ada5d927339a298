package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage empirical profiler (optimization guide §1.1/§7.1):
  * `runMain graft.StageProbe <sfDir> <name> [reps]` runs one registered
  * query in the bench's session shape, then prints, for ONE steady-state
  * rep, every job and stage with wall time, task count, executor CPU sum
  * and shuffle bytes — the "which stage is the time going to" answer the
  * Spark UI would give, as text. Not part of the driver contract.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("ref_exports_pipeline_e2e")
    val reps = args.lift(2).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    case class StageRow(jobId: Int, stageId: Int, nTasks: Int, wallMs: Long,
      execRunMs: Long, execCpuMs: Long, shufReadB: Long, shufWriteB: Long,
      inputB: Long, nodeName: String)
    val rows = mutable.ArrayBuffer[StageRow]()
    val stageToJob = mutable.Map[Int, Int]()
    val jobStart = mutable.Map[Int, Long]()
    val jobEnd = mutable.Map[Int, Long]()
    var record = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        if (record) {
          js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
          jobStart(js.jobId) = js.time
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (record) jobEnd(je.jobId) = je.time
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (record) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          val wall = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s).getOrElse(-1L)
          rows += StageRow(
            stageToJob.getOrElse(si.stageId, -1), si.stageId, si.numTasks,
            wall, tm.executorRunTime, tm.executorCpuTime / 1000000,
            tm.shuffleReadMetrics.totalBytesRead,
            tm.shuffleWriteMetrics.bytesWritten,
            tm.inputMetrics.bytesRead,
            si.name.linesIterator.next().take(80))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val df = Registry.byName(name).build(spark, sfDir)
    def run(): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (_ <- 1 to 3) run() // warm-up + cache fill
    val walls = (1 to reps).map(_ => run())
    // Steady-state recorded rep (after min is known, record one more).
    record = true
    val recWall = run()
    record = false
    spark.sparkContext.removeSparkListener(listener)

    println(f"[stageprobe] $name sf=$sfDir warm_min=${walls.min}%.3f " +
      f"warm=${walls.map(w => f"$w%.3f").mkString(",")} recorded=$recWall%.3f")
    val byJob = rows.groupBy(_.jobId).toSeq.sortBy(_._1)
    byJob.foreach { case (jobId, ss) =>
      val jw = (for { s <- jobStart.get(jobId); e <- jobEnd.get(jobId) }
        yield e - s).getOrElse(-1L)
      println(f"[stageprobe] job $jobId wall=${jw}ms stages=${ss.size}")
      ss.sortBy(_.stageId).foreach { s =>
        println(f"[stageprobe]   stage ${s.stageId}%4d tasks=${s.nTasks}%3d " +
          f"wall=${s.wallMs}%5dms run=${s.execRunMs}%5dms cpu=${s.execCpuMs}%5dms " +
          f"sr=${s.shufReadB}%9dB sw=${s.shufWriteB}%9dB in=${s.inputB}%10dB ${s.nodeName}")
      }
    }
    spark.stop()
  }
}
