package graft.utils

import scala.collection.concurrent.TrieMap

/** Query profiling + TTL result cache, mirroring
  * de_polars/utils/performance.py (QueryProfiler :11-137, CacheManager
  * :140-281). Driver-side utilities — they wrap the *submission* of a
  * query, not its distributed execution.
  */
object Performance {

  final case class QueryStats(
      count: Long, totalSec: Double, minSec: Double, maxSec: Double,
      failures: Long) {
    def avgSec: Double = if (count == 0) 0.0 else totalSec / count
    def successRate: Double =
      if (count + failures == 0) 1.0 else count.toDouble / (count + failures)
  }

  /** Per-name wall-clock stats (performance.py:11-137). */
  final class QueryProfiler {
    private val stats = TrieMap.empty[String, QueryStats]

    def profile[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      try {
        val out = f
        record(name, (System.nanoTime() - t0) / 1e9, failed = false)
        out
      } catch {
        case e: Throwable =>
          record(name, (System.nanoTime() - t0) / 1e9, failed = true)
          throw e
      }
    }

    /** Listener entry point (see [[ProfilingListener]]). */
    def recordExternal(name: String, sec: Double, failed: Boolean): Unit =
      record(name, sec, failed)

    private def record(name: String, sec: Double, failed: Boolean): Unit =
      stats.updateWith(name) {
        case Some(s) =>
          Some(if (failed) s.copy(failures = s.failures + 1)
          else QueryStats(s.count + 1, s.totalSec + sec,
            math.min(s.minSec, sec), math.max(s.maxSec, sec), s.failures))
        case None =>
          Some(if (failed) QueryStats(0, 0, Double.MaxValue, 0, 1)
          else QueryStats(1, sec, sec, sec, 0))
      }

    def snapshot: Map[String, QueryStats] = stats.readOnlySnapshot().toMap
    def reset(): Unit = stats.clear()
  }

  /** Plan-level metrics hook (SURVEY.md §4 profiler row): a
    * QueryExecutionListener feeding the profiler with per-query execution
    * wall time, keyed by a caller-set tag (the `spark.graft.queryTag`
    * SESSION conf — listener callbacks run on the bus thread, so a
    * thread-local property would not be visible) or the plan's top node.
    * Attach once per session. */
  final class ProfilingListener(profiler: QueryProfiler)
      extends org.apache.spark.sql.util.QueryExecutionListener {
    import org.apache.spark.sql.execution.QueryExecution

    private def tag(qe: QueryExecution): String =
      qe.sparkSession.conf.getOption("spark.graft.queryTag")
        .getOrElse(qe.executedPlan.nodeName)

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      profiler.recordExternal(tag(qe), durationNs / 1e9, failed = false)

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      profiler.recordExternal(tag(qe), 0.0, failed = true)
  }

  /** TTL cache keyed by normalized SQL (performance.py:140-281; default TTL
    * 300 s per performance.py:143). Values should be SMALL collected
    * results, never DataFrames backed by live plans.
    *
    * `normalizeKeys = false` keys on the RAW string — for non-SQL callers
    * ([[graft.pricing.CachingPricingSource]]) whose keys are
    * case-sensitive identifiers; the SQL-shaped lowercase/whitespace
    * normalization would alias distinct lookups there. */
  final class TtlCache[V](ttlSeconds: Long = 300,
      clock: () => Long = System.currentTimeMillis,
      normalizeKeys: Boolean = true) {
    // value is (expiresAtMillis, V) — per-entry expiry so callers can
    // cache some results (e.g. negative lookups) for less than the
    // cache-wide TTL
    private val store = TrieMap.empty[String, (Long, V)]

    def key(sql: String): String =
      if (normalizeKeys) sql.trim.toLowerCase.replaceAll("\\s+", " ") else sql

    def getOrElseUpdate(sql: String)(compute: => V): V =
      getOrElseUpdateWithTtl(sql)((compute, ttlSeconds))

    /** Like [[getOrElseUpdate]], but `compute` also chooses the entry's
      * own TTL (seconds) — so a caller can inspect the computed value and
      * give transient/negative results a much shorter life than the
      * cache-wide default ([[graft.pricing.CachingPricingSource]]: a
      * live-API failure surfacing as None must not pin a missing price
      * for the full maxAgeDays). */
    def getOrElseUpdateWithTtl(sql: String)(compute: => (V, Long)): V = {
      val k = key(sql)
      val now = clock()
      store.get(k) match {
        case Some((exp, v)) if now < exp => v
        case _ =>
          val (v, ttl) = compute
          store.put(k, (now + ttl * 1000, v))
          v
      }
    }

    def invalidate(): Unit = store.clear()
    def size: Int = { prune(); store.size }
    private def prune(): Unit = {
      val now = clock()
      store.filterInPlace { case (_, (exp, _)) => now < exp }
    }
  }
}
