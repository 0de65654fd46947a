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
  * OWN builder closure. The cell memoizes its outcome as an explicit
  * one-shot `Try` rather than a `lazy val`: a failed lazy val stays
  * UNINITIALIZED, so a thread already blocked on the winner's monitor
  * would re-run the WINNER's captured closure (including anything it
  * captured, e.g. a SparkSession that has since been stopped) and race
  * a freshly-installed cell's builder — two concurrent overwrites of
  * one fixed path, exactly what this class exists to prevent. With the
  * one-shot Try, blocked waiters OBSERVE the winner's failure, evict
  * the dead cell, and loop back through the map with their own
  * builder. The at-most-once guarantee is for SUCCESSFUL builds; after
  * a failure, retrying callers may each run a build (serialized
  * through fresh cells), which is the desired transient-failure
  * behavior.
  */
private[graft] final class BuildOnce[K, V] {
  private final class Cell(body: () => V) {
    private var outcome: Option[scala.util.Try[V]] = None
    /** Runs the builder exactly once; every later (or concurrently
      * blocked) caller gets the memoized outcome — including Failure,
      * which is never re-run through THIS cell. */
    def run(): scala.util.Try[V] = synchronized {
      if (outcome.isEmpty) outcome = Some(scala.util.Try(body()))
      outcome.get
    }
  }
  private val cells = scala.collection.concurrent.TrieMap.empty[K, Cell]

  /** The value for `key`, building it (at most once across threads)
    * if absent. */
  @annotation.tailrec
  def apply(key: K)(build: => V): V = {
    val cell = new Cell(() => build)
    val winner = cells.putIfAbsent(key, cell).getOrElse(cell)
    winner.run() match {
      case scala.util.Success(v) => v
      case scala.util.Failure(t) =>
        cells.remove(key, winner)
        // our own build failed → propagate; someone else's failed →
        // retry through the map with OUR builder (fresh cell)
        if (winner eq cell) throw t else apply(key)(build)
    }
  }

  /** Drop entries whose key matches `p` (e.g. keys bound to stopped
    * SparkSessions). Entries mid-build are dropped from the MAP only;
    * their in-flight builder still completes for the thread inside it. */
  def evict(p: K => Boolean): Unit = cells.filterInPlace((k, _) => !p(k))
}
