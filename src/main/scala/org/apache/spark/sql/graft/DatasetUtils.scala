package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Small Dataset plumbing that needs sql-internal access. */
object DatasetUtils {

  /** Free the cached blocks behind a localCheckpoint'd Dataset. Its plan
    * is a LogicalRDD over the checkpointed (block-cached) RDD, which
    * `Dataset.unpersist` never touches. No-op for non-checkpointed plans.
    */
  def freeCheckpointBlocks(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
