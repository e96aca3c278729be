package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Release ledger for operator-persisted intermediates.
  *
  * Several operators persist a shared intermediate (the inverted shingle
  * index, the tf table) because multiple branches of the returned plan
  * consume it; the returned DataFrame is lazy, so the operator itself can
  * never unpersist — only the caller knows when the terminal action has
  * run. Without a release path a long-lived session (a notebook, a
  * streaming driver, a multi-query service) accumulates pinned cache
  * blocks until executor storage memory evicts working data.
  *
  * Operators register every persist here; callers release with
  * [[Intermediates.release]] after their terminal action (Bench's
  * clearCache between queries is the blunt equivalent; this is the
  * surgical one — it drops ONLY operator intermediates, never caches the
  * caller created). Registration holds the DataFrame reference per
  * session until released; entries are tiny (plan objects), and release
  * also forgets them.
  */
object Intermediates {

  private val registry = new ConcurrentHashMap[SparkSession, java.util.List[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release.
    * First registration for a session also arms a context listener that
    * evicts the session's entry at application end, so a long-lived
    * multi-session process can never retain stopped sessions through the
    * registry even when a caller forgets release() (Verify releases per
    * query; Bench's clearCache covers its children).
    */
  private[graft] def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    registry.computeIfAbsent(df.sparkSession, s => {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          registry.remove(s)
      })
      java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())
    }).add(df)
    df
  }

  /** Unpersist every operator intermediate registered for `spark`.
    * Call after the terminal action on the operator's result; blocking so
    * the storage memory is actually free on return.
    */
  def release(spark: SparkSession): Unit = {
    val dfs = registry.remove(spark)
    if (dfs != null) dfs.forEach(df => df.unpersist(blocking = true))
  }

  /** Number of live registered intermediates for `spark` (spec hook). */
  def registered(spark: SparkSession): Int = {
    val dfs = registry.get(spark)
    if (dfs == null) 0 else dfs.size()
  }
}
