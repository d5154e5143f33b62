package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the harness scan-split rule
  * (`clamp(max(total/1024, largestFile/256), 1 MB, 128 MB)`) at the
  * measured regime boundaries, so a future tweak that silently changes a
  * regime shows up here before it shows up as a 2× bench drift.
  * The regimes themselves are measured in BASELINE.md (round-18 A/B):
  * small scales want 1 MB splits for parallelism; large files want
  * bounded tasks-per-file because per-task parquet footer re-parse cost
  * grows with the file.
  */
class SplitRuleSpec extends AnyFunSuite {
  private val MB = 1L << 20

  test("empty / unreadable dir falls back to the 1 MB floor") {
    assert(Tables.splitBytesFor(Nil) == 1 * MB)
  }

  test("sf0.1-shaped input (600 MB total, 170 MB largest) stays at the 1 MB floor") {
    // total/1024 = 0.6 MB, largest/256 = 0.66 MB — both under the floor
    val sizes = Seq(170L * MB, 160L * MB, 120L * MB, 80L * MB, 70L * MB)
    assert(Tables.splitBytesFor(sizes) == 1 * MB)
  }

  test("sf10-shaped input (1.8 GB total, 1.1 GB largest) is in the wash zone (~4 MB)") {
    val sizes = Seq(1100L * MB, 400L * MB, 300L * MB)
    val split = Tables.splitBytesFor(sizes)
    // largest/256 = 4.3 MB dominates total/1024 = 1.8 MB
    assert(split == 1100L * MB / 256)
    assert(split > 4 * MB && split < 5 * MB)
  }

  test("sf100-shaped input (17 GB total, 11 GB largest) bounds tasks-per-file at ~256") {
    val sizes = Seq(11L * 1024 * MB, 3L * 1024 * MB, 3L * 1024 * MB)
    val split = Tables.splitBytesFor(sizes)
    assert(split == 11L * 1024 * MB / 256) // 44 MB
    // ~256 tasks for the largest file, not the ~11k the old 1 MB rule made
    assert((11L * 1024 * MB + split - 1) / split <= 257)
  }

  test("huge input converges to Spark's 128 MB default, never past it") {
    val sizes = Seq(1024L * 1024 * MB) // a 1 TB file
    assert(Tables.splitBytesFor(sizes) == 128 * MB)
  }
}
