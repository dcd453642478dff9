package graft.plans

import java.io.{File, PrintWriter}

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Reference-parity job event log (O13, `Scheduler.cc:80-84` and
  * passim): the reference's jobtracker writes a CSV log of eight event
  * kinds (Start_Job, Dispatch_MapTask, Complete_MapTask, Start_Shuffle,
  * Finish_Shuffle, Dispatch_ReduceTask, Complete_ReduceTask,
  * FinishJob). Spark's scheduler already emits the equivalent facts as
  * listener events; this listener maps them onto the reference's
  * vocabulary: each job's final stage (its result stage) plays the
  * reduce phase, earlier stages play the map phase, and the boundary
  * between them is the shuffle.
  *
  * Format: `epoch_ms,Event,args...` — same shape as the reference log.
  */
class JobEventLog(path: String) extends SparkListener {
  private val out = new PrintWriter(new File(path))
  // stages that produce shuffle output (StageInfo.shuffleDepId defined)
  // play the reference's map phase; result stages play the reduce phase.
  private val mapStages = mutable.Set.empty[Int]

  private def log(event: String, args: Any*): Unit = synchronized {
    out.println((System.currentTimeMillis() +: (event +: args)).mkString(","))
    out.flush()
  }
  private def isMap(stageId: Int): Boolean = synchronized(mapStages.contains(stageId))

  override def onJobStart(e: SparkListenerJobStart): Unit =
    log("Start_Job", e.jobId, e.stageIds.mkString("|"))

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    val id = e.stageInfo.stageId
    if (org.apache.spark.graftbridge.SchedulerBridge.producesShuffleOutput(e.stageInfo))
      synchronized(mapStages += id)
    // a reduce stage starting after map output exists = shuffle read done
    else if (synchronized(mapStages.nonEmpty)) log("Finish_Shuffle", id)
  }

  override def onTaskStart(e: SparkListenerTaskStart): Unit =
    log(if (isMap(e.stageId)) "Dispatch_MapTask" else "Dispatch_ReduceTask",
      e.stageId, e.taskInfo.taskId, e.taskInfo.host)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    log(if (isMap(e.stageId)) "Complete_MapTask" else "Complete_ReduceTask",
      e.stageId, e.taskInfo.taskId, e.taskInfo.duration)

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    // map stage completion = shuffle files materialized
    if (isMap(e.stageInfo.stageId))
      log("Start_Shuffle", e.stageInfo.stageId, e.stageInfo.numTasks)

  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    log("FinishJob", e.jobId)

  def close(): Unit = out.close()
}
