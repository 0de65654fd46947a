package graft.ext

/** Keyed build-at-most-once memo for side-effectful per-JVM artifacts
  * (parquet paths written to fixed locations, persisted serving
  * frames). `TrieMap.getOrElseUpdate` alone is NOT atomic: two
  * concurrent first calls for one key would both run the builder —
  * for a path store that means overlapping overwrite writes to the
  * same directory, for a frame store a leaked duplicate persisted
  * copy. Here the CELL is registered first via `putIfAbsent` (atomic)
  * and the builder runs inside the winning cell's `lazy val`, so the
  * losing thread BLOCKS on the winner's build instead of duplicating
  * it — one build per key, ever, no loser cleanup needed.
  *
  * A builder that THROWS does not poison the key: the failed cell is
  * REMOVED from the map (conditionally, so a concurrent success is
  * never evicted), and the next call installs a fresh cell with its
  * OWN builder closure. Without the removal, lazy-val retry would
  * re-run the FIRST caller's closure forever — including anything it
  * captured (e.g. a SparkSession that has since been stopped). The
  * at-most-once guarantee is for SUCCESSFUL builds; after a failure,
  * retrying callers may each run a build, which is the desired
  * transient-failure behavior.
  */
private[graft] final class BuildOnce[K, V] {
  private final class Cell(body: () => V) { lazy val value: V = body() }
  private val cells = scala.collection.concurrent.TrieMap.empty[K, Cell]

  /** The value for `key`, building it (at most once across threads)
    * if absent. */
  def apply(key: K)(build: => V): V = {
    val cell = new Cell(() => build)
    val winner = cells.putIfAbsent(key, cell).getOrElse(cell)
    try winner.value
    catch { case t: Throwable => cells.remove(key, winner); throw t }
  }

  /** Drop entries whose key matches `p` (e.g. keys bound to stopped
    * SparkSessions). Entries mid-build are dropped from the MAP only;
    * their in-flight builder still completes for the thread inside it. */
  def evict(p: K => Boolean): Unit = cells.filterInPlace((k, _) => !p(k))
}
