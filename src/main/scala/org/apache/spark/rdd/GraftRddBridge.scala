package org.apache.spark.rdd

/** `RDD.isLocallyCheckpointed` is `private[rdd]`; the bench hygiene pass
  * needs it to know which persisted RDDs it must NOT unpersist —
  * unpersisting a locally-checkpointed RDD frees nothing recomputable and
  * only logs a "cannot be recomputed" WARN per RDD into the artifact
  * tail. Same minimal-bridge pattern as
  * [[org.apache.spark.sql.GraftColumnBridge]].
  */
object GraftRddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
