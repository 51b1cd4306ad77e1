package graft

/** Filesystem helpers shared by the staging/caching sites (streaming
  * input staging, checkpoint cleanup, the persisted IVF index).
  *
  * Deliberately free of shutdown-hook registration and any other
  * class-init side effects: cleanup hooks reference this object, and an
  * object whose clinit itself registers a hook throws
  * IllegalStateException("Shutdown in progress") if its FIRST touch
  * happens inside a running shutdown hook — which is exactly when
  * cleanup code runs in a test JVM that never initialized the bigger
  * objects.
  */
object Fs {

  def rmTree(path: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(path)
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      val all = try stream.iterator().asScala.toSeq finally stream.close()
      all.sortBy(-_.getNameCount).foreach(p => Files.deleteIfExists(p))
    }
  }

  /** rmTree for a just-stopped streaming query's checkpoint: RocksDB
    * state-store providers are unloaded by an ASYNC maintenance task
    * that can still write under the checkpoint dir briefly after
    * `query.stop()` returns, so a single walk-and-delete races it
    * (DirectoryNotEmptyException / vanished entries). Retry a few
    * times; the final attempt is best-effort — a leaked tmpfs temp dir
    * is reclaimed at JVM exit and is strictly better than failing the
    * query that already produced its result.
    */
  def rmTreeRetry(path: String, attempts: Int = 4): Unit = {
    var i = 0
    var done = false
    while (!done && i < attempts) {
      i += 1
      try { rmTree(path); done = true }
      catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException =>
          if (i < attempts) Thread.sleep(100)
      }
    }
  }
}
