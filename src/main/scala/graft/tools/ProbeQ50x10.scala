package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnose the q50-family scored-pairs stage shape at an inflated
  * rung under Bench's session settings (local[$SPARK_GRAFT_CPUS], AQE
  * on): wall time plus the POST-EXECUTION plan, whose AQEShuffleRead
  * nodes show how many partitions the CPU-heavy bucket-explode stage
  * actually ran with.
  *
  *   sbt "runMain graft.tools.ProbeQ50x10 [dataDir]"
  */
object ProbeQ50x10 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/scale10/data")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val si = e.stageInfo
          val m = si.taskMetrics
          println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%4d " +
            f"run=${m.executorRunTime / 1000.0}%8.1fs " +
            f"cpu=${m.executorCpuTime / 1e9}%8.1fs " +
            f"gc=${m.jvmGCTime / 1000.0}%7.1fs " +
            f"fetchWait=${m.shuffleReadMetrics.fetchWaitTime / 1000.0}%6.1fs " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  " +
            si.name.take(60))
        }
      })
    val t0 = System.nanoTime()
    val df = graft.queries.ClusterMemo.scoredPairsPlan(spark, d)
    df.write.format("noop").mode("overwrite").save()
    println(f"[q50x10] scoredPairsPlan wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(1000)
    spark.stop()
  }
}
