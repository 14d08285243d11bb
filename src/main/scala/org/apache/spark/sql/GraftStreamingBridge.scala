package org.apache.spark.sql

/** Probe-only access to streaming internals for the stream plan sweep
  * (StreamPlanAuditSpec): micro-batch executions never reach
  * `QueryExecutionListener` (they run under a bare
  * `SQLExecution.withNewExecutionId`, not a named Dataset action), so
  * the only structural handle on the plan a trigger ACTUALLY executed
  * is the live query's `lastExecution` — an `IncrementalExecution`,
  * which is a `QueryExecution` with the per-batch state-store rewrites
  * applied. */
object GraftStreamingBridge {
  import org.apache.spark.sql.execution.QueryExecution
  import org.apache.spark.sql.execution.streaming.runtime.{StreamExecution, StreamingQueryWrapper}

  /** (runId, batchId, execution) of a live streaming query's most
    * recently planned micro-batch, if one has executed yet. Callers
    * poll while the query is active and dedup on (runId, batchId). */
  def lastExecution(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Option[(String, Long, QueryExecution)] = {
    val se: Option[StreamExecution] = q match {
      case w: StreamingQueryWrapper => Option(w.streamingQuery)
      case s: StreamExecution => Some(s)
      case _ => None
    }
    se.flatMap(s => Option(s.lastExecution)
      .map(ie => (s.runId.toString, ie.currentBatchId, ie: QueryExecution)))
  }
}
