package graft

/** JVM-exit cleanup for harness temp directories (drained stream output,
  * the bucketed/partitioned layout demonstrations): one shutdown hook,
  * one shared list — repeated registrations don't stack hooks, and
  * repeated harness runs don't accumulate dead multi-hundred-MB copies
  * of the fixtures in /tmp. Deletion happens at exit, not eagerly,
  * because every registered dir backs DataFrames/catalog tables that
  * live for the rest of the session. */
object TempDirs {

  private val dirs = scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]

  private lazy val installHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => dirs.synchronized {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
      }
      dirs.foreach(p => del(p.toFile))
    }))

  def cleanupOnExit(p: java.nio.file.Path): Unit = {
    installHook
    dirs.synchronized { dirs += p; () }
  }
}
