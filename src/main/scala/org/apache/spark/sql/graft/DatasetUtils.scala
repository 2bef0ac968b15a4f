package org.apache.spark.sql.graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Small Dataset plumbing that needs sql-internal access. */
object DatasetUtils extends org.apache.spark.internal.Logging {

  /** Free the cached blocks behind a localCheckpoint'd Dataset. Its plan
    * is a LogicalRDD over the checkpointed (block-cached) RDD, which
    * `Dataset.unpersist` never touches. No-op for non-checkpointed plans.
    */
  def freeCheckpointBlocks(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The reliable-checkpoint directory behind a `Dataset.checkpoint(true)`
    * result (None for localCheckpoint / non-checkpointed plans).
    */
  def checkpointFile(df: Dataset[_]): Option[String] =
    df.queryExecution.analyzed.collectFirst {
      case lr: LogicalRDD if lr.rdd.getCheckpointFile.isDefined =>
        lr.rdd.getCheckpointFile.get
    }

  /** Delete a checkpoint's files — the cleanup half of the
    * PeriodicRDDCheckpointer pattern (Spark never deletes reliable
    * checkpoints on its own unless the whole context is torn down).
    */
  def deleteCheckpointFile(path: String, df: Dataset[_]): Unit = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    // a swallowed failure here leaks rdd-* checkpoint dirs unbounded in
    // production with no signal — log it (matching PeriodicRDDCheckpointer)
    try p.getFileSystem(conf).delete(p, true)
    catch {
      case e: java.io.IOException =>
        logWarning(
          s"Failed to delete checkpoint $path " +
            "(checkpoint directory will leak until manual cleanup)", e)
    }
  }
}
