package graft

/** Wall-clock phase logging for the composed streaming queries, off by
  * default (`-Dgraft.phase.log=true` enables). The bench's per-query
  * seconds say WHICH composition is expensive; this says WHERE inside it
  * the time goes (staging, per-batch fold, snapshot I/O, drain waits) —
  * the measure-first loop of the optimization guide applied to queries
  * whose cost is a composition of driver-side phases rather than one
  * Catalyst plan.
  */
object Phase {
  private val on = java.lang.Boolean.getBoolean("graft.phase.log")
  def enabled: Boolean = on
  def apply[A](name: String)(body: => A): A =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      try body
      finally System.err.println(
        f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
}
