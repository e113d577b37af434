package graft.util

/** The reference's performance-report text surface (M1–M3), reproduced
  * in its exact format — header, fixed-width per-collection table,
  * overall block ("Tugas 2/IDX Financial Report/idx_transform.py:53-74",
  * written to performance_report.txt at :387-397). Our "collections" are
  * the bench queries; documents = result rows, time = the measured
  * median, velocity = rows/sec — the same docs/sec accounting the
  * reference tracks per collection (:36-41).
  */
object PerfReport {

  /** `stats`: (name, resultRows, seconds) per query, in run order. */
  def render(stats: Seq[(String, Long, Double)]): String = {
    val sb = new StringBuilder
    sb ++= "===== PERFORMANCE REPORT =====\n\n"
    sb ++= "COLLECTION STATISTICS:\n"
    sb ++= "-" * 70 + "\n"
    sb ++= f"${"Collection"}%-20s ${"Documents"}%-12s ${"Time (s)"}%-12s ${"Velocity (docs/s)"}%-20s%n"
    sb ++= "-" * 70 + "\n"
    stats.foreach { case (name, docs, secs) =>
      val velocity = if (secs > 0) docs / secs else 0.0
      sb ++= f"$name%-20s $docs%-12d $secs%.2fs${" "}%-8s $velocity%.2f%n"
    }
    val totalDocs = stats.map(_._2).sum
    val totalTime = stats.map(_._3).sum
    val overall = if (totalTime > 0) totalDocs / totalTime else 0.0
    sb ++= "\nOVERALL STATISTICS:\n"
    sb ++= "-" * 70 + "\n"
    sb ++= f"Total documents processed: $totalDocs%d%n"
    sb ++= f"Total execution time: $totalTime%.2f seconds%n"
    sb ++= f"Overall velocity: $overall%.2f documents/second%n"
    sb ++= "-" * 70 + "\n"
    sb.result()
  }
}
