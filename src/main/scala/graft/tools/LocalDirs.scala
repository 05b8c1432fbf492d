package graft.tools

/** RAM-backed spark.local.dir management for the bench/profile
  * tools. tmpfs shuffle dirs remove disk writeback from measurements
  * (see Bench's scaladoc), but they are RAM: a SIGKILLed JVM (OOM
  * killer, timeout) leaks its shuffle files in /dev/shm, and those
  * leaked bytes then SHRINK the memory available to every later run
  * — round 11 found 90 GB of dead shuffle files from killed sf10
  * profiles, which in turn OOM-killed the sf1 sweep. Two rules fix
  * the cycle: every process gets its OWN pid-suffixed dir, and every
  * startup sweeps sibling dirs whose owning pid is no longer alive. */
object LocalDirs {

  private def rmTree(f: java.io.File): Unit = graft.core.Fs.rmTree(f)

  /** A fresh /dev/shm local dir for this process (falls back to
    * java.io.tmpdir when /dev/shm is absent), after reaping any
    * sibling dirs left by dead processes — including the legacy
    * un-suffixed names earlier rounds used. */
  def ramLocalDir(tool: String): String = {
    val base = java.nio.file.Paths.get("/dev/shm")
    if (!java.nio.file.Files.isDirectory(base))
      return System.getProperty("java.io.tmpdir")
    val prefix = s"graft-$tool-local-"
    val legacy = Set(s"graft-$tool-local")
    val kids = base.toFile.listFiles()
    if (kids != null) kids.foreach { f =>
      val n = f.getName
      if (legacy(n)) rmTree(f)
      else if (n.startsWith(prefix)) {
        val pid = n.stripPrefix(prefix)
        val alive = pid.nonEmpty && pid.forall(_.isDigit) &&
          java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"/proc/$pid"))
        if (!alive) rmTree(f)
      }
    }
    s"/dev/shm/$prefix${ProcessHandle.current().pid()}"
  }
}
