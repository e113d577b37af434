package graft.util

import java.util.concurrent.atomic.AtomicLong

/** Session-wide counter of stored-artifact (re)builds — the `_stored`
  * queries (LSH band index, IVF quantizer) are write-once per
  * (corpus, params), and their whole point is that steady-state
  * invocations PROBE the artifact instead of building it. The bench
  * snapshots this counter around its timed reps: a build landing inside
  * a timed window means the warm-up didn't cover the bench SF (the
  * round-5 failure mode: 26.9 s medians on a query whose probe floor is
  * ~6.6 s) and is reported in bench.json rather than silently inflating
  * the median. */
object Artifacts {
  val builds = new AtomicLong

  def recordBuild(what: String): Unit = {
    builds.incrementAndGet()
    System.err.println(s"[graft] stored artifact BUILD: $what")
  }
}
