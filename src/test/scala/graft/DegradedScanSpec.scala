package graft

import java.nio.file.Files
import graft.operators.MonitorOps

/** Degraded-mode scans (S10/S12): the monitor's DB-down fallbacks —
  * recover state from the filesystem alone (monitor:1084-1097, 166-186). */
class DegradedScanSpec extends SparkSpec {

  private def tree(pairs: String*): String = {
    val root = Files.createTempDirectory("degraded")
    pairs.foreach { rel =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, "x".getBytes)
    }
    root.toString
  }

  test("diskWalkExposures recovers the exposure inventory from the tree") {
    val root = tree(
      "20240101/c0/DECam_00000001.fits.fz",
      "20240101/c1/DECam_00000005.fits.fz",
      "20240101/c1/notes.txt", // non-matching name → ignored
      "20240102/c0/DECam_00000009.fits.fz")
    val rows = MonitorOps.diskWalkExposures(spark, root)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows == Map(
      "20240101" -> ((2L, 1L, 5L)),
      "20240102" -> ((1L, 9L, 9L))))
  }

  test("latestLogFile equals the per-level string-max descent") {
    val root = tree(
      "2023/12/accept_20231231.log",
      "2024/02/accept_20240201.log",
      "2024/11/accept_20241101.log",
      "2024/11/accept_20241115.log")
    val latest = MonitorOps.latestLogFile(spark, root).head().getString(0)
    assert(latest == s"$root/2024/11/accept_20241115.log", latest)
  }
}
