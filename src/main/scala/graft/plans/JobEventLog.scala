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
  * vocabulary: shuffle-producing stages play the map phase, others the
  * reduce phase, and the boundary between them is the shuffle.
  *
  * Scoping: the reference's "job" corresponds to one SQL *execution*,
  * not one Spark job — under AQE each stage can run as its own job, so
  * map/reduce bookkeeping is keyed by `spark.sql.execution.id` (falling
  * back to a per-job key for non-SQL RDD jobs). Without that scoping, a
  * map stage from one query would make later shuffle-free queries log
  * spurious Finish_Shuffle events.
  *
  * Format: `epoch_ms,Event,args...` — same shape as the reference log.
  */
class JobEventLog(path: String) extends SparkListener {
  private val out = new PrintWriter(new File(path))
  private val mapStages    = mutable.Set.empty[Int]
  private val stageToScope = mutable.Map.empty[Int, String]
  private val scopesWithMap = mutable.Set.empty[String]
  private var announcedPairs: Option[Long] = None

  /** O12→O13 bridge: callers that know the exact pre-combine
    * intermediate pair count (the reference MPI_Reduce-sums it with no
    * combiner — `Worker.cc:94-99`, `Scheduler.cc:134-139`) announce it
    * here; the next Start_Shuffle line carries it. Without an
    * announcement the line carries the stage's shuffle-write record
    * count — the pairs that actually cross Spark's shuffle, which is
    * the post-map-side-combine number.
    */
  def announceIntermediatePairs(n: Long): Unit = synchronized { announcedPairs = Some(n) }

  private def log(event: String, args: Any*): Unit = synchronized {
    out.println((System.currentTimeMillis() +: (event +: args)).mkString(","))
    out.flush()
  }
  private def isMap(stageId: Int): Boolean = synchronized(mapStages.contains(stageId))

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val scope = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
      .map("exec-" + _)
      .getOrElse("job-" + e.jobId)
    synchronized(e.stageIds.foreach(sid => stageToScope(sid) = scope))
    log("Start_Job", e.jobId, e.stageIds.mkString("|"))
  }

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    val id = e.stageInfo.stageId
    if (org.apache.spark.graftbridge.SchedulerBridge.producesShuffleOutput(e.stageInfo))
      synchronized { mapStages += id; stageToScope.get(id).foreach(scopesWithMap += _) }
    // a reduce stage starting after ITS execution produced map output =
    // shuffle read beginning for that query
    else if (synchronized(stageToScope.get(id).exists(scopesWithMap.contains)))
      log("Finish_Shuffle", id)
  }

  override def onTaskStart(e: SparkListenerTaskStart): Unit =
    log(if (isMap(e.stageId)) "Dispatch_MapTask" else "Dispatch_ReduceTask",
      e.stageId, e.taskInfo.taskId, e.taskInfo.host)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    log(if (isMap(e.stageId)) "Complete_MapTask" else "Complete_ReduceTask",
      e.stageId, e.taskInfo.taskId, e.taskInfo.duration)

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    // map stage completion = shuffle files materialized. Reference
    // format (`Scheduler.cc:134-139`): `epoch_ms,Start_Shuffle,<total
    // KV count>` — one argument, the global intermediate pair count.
    if (isMap(e.stageInfo.stageId)) {
      val kvCount = synchronized { val a = announcedPairs; announcedPairs = None; a }
        .getOrElse(Option(e.stageInfo.taskMetrics)
          .map(_.shuffleWriteMetrics.recordsWritten).getOrElse(-1L))
      log("Start_Shuffle", kvCount)
    }

  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    log("FinishJob", e.jobId)

  override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
    // SQL execution finished → drop that scope's bookkeeping
    case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
      val scope = "exec-" + e.executionId
      synchronized {
        val stages = stageToScope.collect { case (sid, sc) if sc == scope => sid }
        stages.foreach { sid => stageToScope -= sid; mapStages -= sid }
        scopesWithMap -= scope
      }
    case _ => ()
  }

  def close(): Unit = out.close()
}
