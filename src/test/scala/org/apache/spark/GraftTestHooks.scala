package org.apache.spark

/** Test-only access to `SparkContext.checkpointDir` (private[spark]):
  * ClusterSpec flips the shared session into reliable-checkpoint mode
  * and must restore the local-mode default afterwards — there is no
  * public unset. */
object GraftTestHooks {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
