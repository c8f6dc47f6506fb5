package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface needed to expose custom
  * Catalyst expressions as Columns in Spark 4.x (where Column wraps a
  * ColumnNode, not an Expression). Lives in the sql package by necessity;
  * the engine's own code stays in graft.*.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Clone `spark` (shared context/catalog, copied session state) and set
    * `key`=`value` on the clone only. This is the per-QUERY conf scoping
    * primitive: a Dataset re-homed onto the clone plans and executes under
    * the overridden conf while the parent session keeps its default —
    * `SQLExecution` propagates the conf of the Dataset's OWN session at
    * action time, so the override travels with the returned frame and
    * never leaks into sibling queries.
    */
  def sessionWithConf(spark: SparkSession, key: String, value: String): SparkSession = {
    val c = spark.asInstanceOf[classic.SparkSession].cloneSession()
    c.conf.set(key, value)
    c
  }

  /** Re-home `df`'s logical plan onto `session` (see [[sessionWithConf]]). */
  def rehome(session: SparkSession, df: Dataset[Row]): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession],
      df.queryExecution.logical)

  /** Execute `df`'s EXACT physical plan (no extra count aggregate, no
    * row decoding) the way a real Dataset action does: with the frame's
    * OWN session active and its conf propagated through SQLExecution.
    * A bare `df.queryExecution.toRdd.count()` — the natural way to drive
    * a plan in a profiler — skips that wrapper, so planning reads the
    * conf of whatever session is ambiently active on the thread and a
    * [[sessionWithConf]]-scoped override never engages. Profiler/bench
    * mains drive plans through this so they measure what `count()` /
    * `collect()` / `write` would run.
    */
  def runExactPlan(df: Dataset[Row]): Long = {
    val qe = df.queryExecution
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(df.sparkSession)
    // Restore the EXACT prior thread state: when no session was active
    // before the call, clear rather than leave the frame's (possibly
    // conf-scoped clone) session ambiently active — later planning on
    // this thread would otherwise silently run under the scoped conf.
    try execution.SQLExecution.withNewExecutionId(qe, None) {
      qe.toRdd.count()
    } finally prev match {
      case Some(s) => SparkSession.setActiveSession(s)
      case None    => SparkSession.clearActiveSession()
    }
  }

  /** RDD ids a (materialized) localCheckpoint pinned into the block
    * manager for `df` — read from the Dataset's OWN plan (the LogicalRDD
    * nodes a checkpoint leaves behind), so a caller that frees blocks
    * later can free EXACTLY this frame's blocks. The global
    * `getPersistentRDDs`-diff alternative races with concurrent streams:
    * any other query persisting inside the diff window gets its RDD
    * captured and unpersisted by a stranger — and a localCheckpointed RDD
    * has truncated lineage, so dropping its blocks CRASHES the victim's
    * later access rather than recomputing.
    */
  def checkpointedRddIds(df: Dataset[Row]): Seq[Int] =
    df.queryExecution.analyzed.collect {
      case r: execution.LogicalRDD => r.rdd.id
    }

  /** Deterministically drain the async listener bus — the replacement for
    * sleep-and-hope when reading task metrics accumulated by a listener
    * right after a job completes (the last tasks' events may still be in
    * flight on the AsyncEventQueue when the action returns).
    */
  def drainListenerBus(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
