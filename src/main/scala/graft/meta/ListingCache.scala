package graft.meta

import org.apache.spark.sql.Row

/** TTL'd readdir memo — the engine-side analog of the reference's
  * `ListStatusCache` (fuse/src/uring_fuse/uring_fs/list_cache.rs:4-27),
  * which serves readdir from a path-keyed map and is kept fresh by the
  * create path (uring_fs/mod.rs:195-200 appends the new name on create).
  *
  * Differences, both deliberate: entries expire after `ttlMillis` (the
  * reference's cache never expires — safe only because one process owns
  * the tree; an analytics engine can't assume that), and mutation
  * INVALIDATES the affected directory instead of patching it (a dropped
  * entry re-materializes from the catalog snapshot, so the cache can
  * never drift from the source of truth).
  *
  * The clock is injectable so specs can step time deterministically.
  */
final class ListingCache(
    ttlMillis: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(rows: Seq[Row], at: Long)
  private val cache = scala.collection.concurrent.TrieMap.empty[Long, Entry]
  // epoch fences in-flight misses: a listing computed before an
  // invalidation must NOT be inserted after it (it reflects the
  // pre-mutation catalog and would serve stale rows for a full TTL)
  private val epoch = new java.util.concurrent.atomic.AtomicLong(0L)

  private val hitCount = new java.util.concurrent.atomic.LongAdder
  private val missCount = new java.util.concurrent.atomic.LongAdder
  def hits: Long = hitCount.sum()
  def misses: Long = missCount.sum()

  /** Serve `readdir(parent)` from the cache when a live entry exists;
    * otherwise run the catalog listing and memoize it. Pagination is
    * applied to the cached full listing (the cache stores whole
    * directories, like the reference's path→names map). */
  def readdir(cat: InodeCatalog, parent: Long, offset: Int = 0,
      limit: Int = Int.MaxValue): Seq[Row] = {
    val now = clock()
    val live = cache.get(parent).filter(now - _.at < ttlMillis)
    val rows = live match {
      case Some(e) =>
        hitCount.increment()
        e.rows
      case None =>
        missCount.increment()
        val epochAtStart = epoch.get()
        val fresh = cat.readdir(parent).collect().toSeq
        if (epoch.get() == epochAtStart) cache.put(parent, Entry(fresh, now))
        fresh
    }
    rows.slice(offset, math.min(rows.size, offset.toLong + limit).toInt)
  }

  /** Drop one directory's listing (create/rename/unlink touched it). */
  def invalidate(parent: Long): Unit = {
    epoch.incrementAndGet()
    cache.remove(parent)
  }

  /** Drop everything (opaque catalog mutation). */
  def invalidateAll(): Unit = {
    epoch.incrementAndGet()
    cache.clear()
  }
}
