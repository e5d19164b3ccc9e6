package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Peaks

/** Port of test/sql/ts_peaks.test: the detect_peaks parameter surface
  * (min_distance, min_prominence, smooth_first, smooth_nbasis) and the
  * PeakDetectionResult shape (peaks, n_peaks, inter_peak_distances,
  * mean_period).
  */
class PeaksContractSpec extends AnyFunSuite {

  private val zigzag = Array(1.0, 3.0, 2.0, 5.0, 3.0, 7.0, 4.0, 6.0, 3.0, 8.0, 2.0, 4.0)

  test("full result exposes peaks, distances and mean period (:14-59)") {
    val r = Peaks.detectPeaksFull(zigzag)
    assert(r.nPeaks >= 1 && r.peaks.length == r.nPeaks)
    assert(r.interPeakDistances.length == r.nPeaks - 1)
    assert(!r.meanPeriod.isNaN)
    // peaks at local maxima: 1(3), 3(5), 5(7), 7(6), 9(8)
    assert(r.peaks.map(_.index) == Seq(1, 3, 5, 7, 9))
    assert(r.interPeakDistances.forall(_ == 2.0))
    assert(r.meanPeriod == 2.0)
  }

  test("min_distance thins to the more prominent peaks (:19-23)") {
    val r = Peaks.detectPeaksFull(zigzag, minDistance = Some(3.0))
    assert(r.nPeaks < 5)
    r.peaks.sliding(2).foreach(w =>
      if (w.length == 2) assert(w(1).index - w(0).index >= 3))
  }

  test("min_prominence filters shallow peaks (:25-29)") {
    val all = Peaks.detectPeaksFull(zigzag, minProminence = Some(0.0))
    val strict = Peaks.detectPeaksFull(zigzag, minProminence = Some(3.5))
    assert(strict.nPeaks < all.nPeaks)
    assert(strict.peaks.forall(_.prominence >= 3.5))
  }

  test("smooth_first suppresses jitter peaks (:31-35)") {
    // slow wave with fast jitter: unsmoothed finds many, smoothed finds few
    val wavy = Array.tabulate(64)(i =>
      math.sin(2 * math.Pi * i / 32.0) * 5.0 + (if (i % 2 == 0) 0.4 else -0.4))
    val rough = Peaks.detectPeaksFull(wavy)
    val smooth = Peaks.detectPeaksFull(wavy, smoothFirst = true, smoothNbasis = Some(8))
    assert(smooth.nPeaks >= 1 && smooth.nPeaks <= rough.nPeaks / 4,
      s"rough=${rough.nPeaks} smooth=${smooth.nPeaks}")
  }

  test("minimum 3 points (:peaks.rs:141)") {
    intercept[IllegalArgumentException](Peaks.detectPeaks(Array(1.0, 2.0)))
  }
}
