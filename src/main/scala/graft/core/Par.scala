package graft.core

/** Overlap INDEPENDENT driver-side actions (guide §2.6: "actions are
  * only sequential because your driver code calls them sequentially").
  * A multi-table maintenance op (index publish = 5 component commits,
  * a takedown = one deletion per surface) spends most of its wall time
  * in per-action fixed overhead — job scheduling, file listing, commit
  * protocol — while the cluster sits idle between actions; and at
  * scale each action's straggler tail leaves executors idle that the
  * next action's tasks could back-fill. Spark's scheduler runs
  * concurrent jobs FIFO inside one application, which is exactly the
  * back-fill behaviour wanted here.
  *
  * Safety: callers must pass tasks with NO data dependencies and no
  * write-write conflict (distinct VersionedTable roots — the commit
  * protocol itself is atomic per table). [[Scratch]] pinning scopes
  * are propagated to the worker threads so a parallel task that
  * materializes scratch inside a ModelCache training scope still pins
  * correctly (scope sets are synchronized).
  */
object Par {

  /** Run every task, wait for all, return results in order. Serial
    * when there is only one task (no pool overhead). The first failed
    * task's exception propagates after every task has settled — a
    * failed sibling must not leave another task's commit racing a
    * caller that thinks the op is dead. */
  def run[T](tasks: Seq[() => T]): Seq[T] = {
    if (tasks.isEmpty) return Nil
    if (tasks.size == 1) return Seq(tasks.head())
    val scopes = Scratch.currentScopes
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(tasks.size, 8))
    try {
      val futures = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = Scratch.withScopes(scopes)(t())
        })
      }
      // collect all outcomes before throwing: every sibling settles.
      // Driver-thread interruption is NOT an ordinary task failure:
      // swallowing it would clear the interrupt flag and keep blocking
      // on every remaining future, deferring cancellation until all
      // parallel Spark actions finish. Cancel the siblings and
      // propagate the interruption itself.
      val outcomes = futures.map { f =>
        try Right(f.get())
        catch {
          case e: InterruptedException =>
            futures.foreach(_.cancel(true))
            Thread.currentThread().interrupt()
            throw e
          case e: java.util.concurrent.ExecutionException =>
            Left(e.getCause)
          case e: Throwable => Left(e)
        }
      }
      outcomes.collectFirst { case Left(e) => throw e }
      outcomes.map(_.toOption.get)
    } finally {
      pool.shutdown()
      ()
    }
  }

  /** Two-task convenience preserving static types. */
  def run2[A, B](a: () => A, b: () => B): (A, B) = {
    val r = run[Any](Seq(a, b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
