package graft.core

/** The one recursive-delete helper for scratch trees — index scratch
  * dirs, streaming checkpoints, RAM-backed local dirs. It had drifted
  * into three byte-identical private copies (AnnIndexIO,
  * StreamingQueries, LocalDirs); everything now points here. */
object Fs {
  def rmTree(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(rmTree)
    f.delete(): Unit
  }
}
