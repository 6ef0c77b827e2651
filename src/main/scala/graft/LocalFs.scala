package graft

/** Local-filesystem staging helpers shared by the query registry, the
  * streaming harness, and specs — one copy of the walk-and-delete
  * idiom instead of three drifting inline versions.
  */
object LocalFs {

  /** Recursively delete `p` (no-op when absent); the walk stream is
    * closed so repeated harness runs don't leak file handles.
    */
  def deleteRec(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p))
      scala.util.Using.resource(java.nio.file.Files.walk(p)) { w =>
        w.sorted(java.util.Comparator.reverseOrder())
          .forEach(x => { java.nio.file.Files.deleteIfExists(x); () })
      }

  def deleteRec(p: String): Unit = deleteRec(java.nio.file.Paths.get(p))
}
