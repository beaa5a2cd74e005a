package graft.ops

/** Run independent driver ACTIONS concurrently (guide §2.6: Spark
  * happily runs several jobs at once inside one application — actions
  * are only sequential because the driver calls them sequentially).
  * The stored-index mutations each land 2-3 independent tables
  * (postings/df/stats, codes/tomb) before their commit marker; running
  * the writes back-to-back left the tail of each job's last tasks
  * holding the whole session idle. All tasks are joined before return
  * — the caller's marker-last commit discipline is unchanged — and the
  * first failure rethrows its ORIGINAL exception, so require()
  * messages and idempotence behavior survive the pool. */
private[ops] object Par {
  def all(tasks: (() => Unit)*): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futs = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw (if (e.getCause != null) e.getCause else e)
        }
      }
    } finally pool.shutdown()
  }
}
