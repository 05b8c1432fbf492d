package graft.core

/** Run independent Spark jobs on their own driver threads (guide
  * §2.6 "overlap independent jobs"): the scheduler happily runs
  * several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially. The warm
  * index builds are exactly the shape that benefits: each build has
  * driver-side phases (planning, collect-based phases, checkpoint
  * bookkeeping) during which executors idle, and a concurrent
  * sibling's tasks back-fill those gaps. Joins all threads, then
  * rethrows the first failure — the sequential contract (a failing
  * build fails the warm) is preserved. */
object Par {
  def run(jobs: Seq[() => Unit]): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = jobs.map(j => new Thread(() =>
      try j() catch { case t: Throwable => errs.add(t) }))
    ts.foreach(_.start()); ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}
