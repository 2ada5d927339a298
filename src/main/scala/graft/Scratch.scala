package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicInteger

/** Throwaway experiment harness (not part of the driver contract). */
object Scratch {
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

    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    // A query with a genuine shuffle: groupBy over parquet.
    val df = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      .repartition(1).sortWithinPartitions("l_returnflag")

    for (i <- 1 to 3) {
      stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      noop(df) // SAME Dataset object each time
      val dtMs = (System.nanoTime() - t0) / 1e6 // before the listener-drain sleep
      Thread.sleep(300) // let listener events drain
      println(f"[scratch] same-df save #$i: stages=${stages.get} tasks=${tasks.get} " +
        f"$dtMs%7.1fms")
    }
    spark.stop()
  }
}
