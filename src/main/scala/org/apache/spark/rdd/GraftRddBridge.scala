package org.apache.spark.rdd

/** Bridge to RDD.isLocallyCheckpointed (private[rdd]): BlockJanitor must
  * distinguish localCheckpoint block sets (safe to unpersist at a query
  * boundary — they are graft-owned pins) from CacheManager-owned persisted
  * RDDs (owned by Dataset.persist, must be left alone). Same pattern as
  * graftbridge.ColumnBridge: the ONLY file that needs this package.
  */
object GraftRddBridge {
  def isLocallyCheckpointed(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
