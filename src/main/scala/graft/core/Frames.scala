package graft.core

import org.apache.spark.sql.DataFrame

/** Small DataFrame plumbing shared across operators. */
object Frames {

  /** localCheckpoint unless `df` already IS one: iterative operators cut
    * their input's lineage exactly once, and a caller that already
    * materialized the frame (the funnel's shared-frequency-table shape,
    * or a query fn that probes a scalar off the edge list before calling
    * the loop) must not pay a second materialization of identical data.
    */
  def checkpointOnce(df: DataFrame): DataFrame =
    if (df.queryExecution.logical
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]) df
    else df.localCheckpoint(true)
}
