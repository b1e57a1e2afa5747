package graft

/** Pid-free scratch directories for gate fixtures (persisted stores,
  * staged streaming replays, CSV/JSON fixture spills).
  *
  * The path is a FIXED function of (name, input dir): every writer uses
  * `mode("overwrite")` or wipes the directory first, so re-runs reclaim
  * the same directory instead of accumulating pid-stamped copies across
  * bench/verify runs (the pid-suffixed scheme leaked one copy per
  * process because `overwrite` never saw the previous run's path).
  *
  * Concurrency: two PROCESSES writing the same (name, inputDir) at once
  * would collide — accepted, because Verify/Bench run queries
  * sequentially in one JVM and the fixtures are derived data a re-run
  * regenerates. In-JVM, query execution is single-threaded per gate.
  */
object Scratch {
  def dir(name: String, inputDir: String): String =
    "/tmp/graft_scratch/" + name + "_" +
      inputDir.replaceAll("[^A-Za-z0-9.]", "_")

  /** [[dir]], wiped first — for fixtures that must not see a previous
    * run's state (streaming checkpoints, multi-file stores written
    * per-batch rather than with one overwrite). */
  def fresh(name: String, inputDir: String): String = {
    val d = dir(name, inputDir)
    deleteRecursively(java.nio.file.Paths.get(d))
    d
  }

  /** Depth-first recursive delete, closing the walk stream (an
    * unclosed `Files.walk` leaks a directory handle per call). No-op
    * when the path does not exist. Shared by every fixture-wiping
    * path (here and [[graft.streaming.StagedReplay]]). */
  def deleteRecursively(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
}
