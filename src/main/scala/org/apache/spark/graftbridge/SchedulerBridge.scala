package org.apache.spark.graftbridge

import org.apache.spark.scheduler.StageInfo

/** `StageInfo.shuffleDepId` is `private[spark]`; expose the one bit the
  * event-log listener needs: whether a stage produces shuffle output
  * (i.e. plays the MapReduce map phase).
  */
object SchedulerBridge {
  def producesShuffleOutput(si: StageInfo): Boolean = si.shuffleDepId.isDefined
}
