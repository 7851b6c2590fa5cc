package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Session-scoped delivery of `Dataset.observe` metrics to in-process
  * handlers — the shared plumbing behind [[Similarity]]'s skew warning
  * and [[Components]]'s convergence counter.
  *
  * `ensure` registers at most ONE QueryExecutionListener per
  * (session, prefix): every observed metric whose name starts with
  * `prefix` is dispatched to `handler` when its query completes.
  * Sessions are weak keys so a stopped-and-dropped SparkSession stays
  * collectable (a strong set would pin every session and its
  * SessionState for the JVM lifetime in long-lived multi-session
  * drivers); the map is synchronized because WeakHashMap is not
  * thread-safe. Handlers run on the listener bus thread — keep them
  * cheap and non-blocking. */
private[graft] object MetricListener {

  private val registered =
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]()

  def ensure(spark: SparkSession, prefix: String)
            (handler: (String, Row) => Unit): Unit = {
    val isNew = registered.synchronized {
      var set = registered.get(spark)
      if (set == null) {
        set = new java.util.HashSet[String]()
        registered.put(spark, set)
      }
      set.add(prefix)
    }
    if (isNew)
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith(prefix)) handler(name, row)
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
  }
}
