package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.Changepoint

/** Port of test/sql/ts_changepoints.test: the BOCPD scalar contract — output
  * array shapes, constant-series behavior, GH#50 boundary conditions (first/
  * last observations never artificially flagged), minimum input length, and
  * detection of a planted level shift.
  */
class ChangepointContractSpec extends AnyFunSuite {

  private val shift = Array(1.0, 1.0, 1.0, 1.0, 10.0, 10.0, 10.0, 10.0)
  private val flat = Array.fill(8)(5.0)
  private val noisy = Array(50.1, 50.2, 50.3, 50.1, 50.4, 50.2, 50.3, 50.1)

  test("output arrays match input length (:14-41)") {
    val r = Changepoint.bocpd(shift, 250.0)
    assert(r.isChangepoint.length == 8)
    assert(r.probability.length == 8)
  }

  test("constant series has no changepoints (:46-51)") {
    val r = Changepoint.bocpd(flat, 250.0)
    assert(r.isChangepoint.forall(!_))
  }

  test("first and last observations never flagged (GH#50, :53-105)") {
    Seq(flat, noisy, shift).foreach { xs =>
      val r = Changepoint.bocpd(xs, 250.0)
      assert(!r.isChangepoint.head, xs.mkString(","))
      assert(!r.isChangepoint.last, xs.mkString(","))
    }
  }

  test("stable-series probabilities stay low away from the start (:88-99)") {
    val r = Changepoint.bocpd(flat, 250.0)
    assert(r.probability(4) < 0.1)
    assert(r.probability(7) < 0.1)
  }

  test("minimum input is 3 points; 3 identical points → no changepoints (:120-160)") {
    intercept[Exception](Changepoint.bocpd(Array(5.0), 250.0))
    intercept[Exception](Changepoint.bocpd(Array(5.0, 10.0), 250.0))
    val r = Changepoint.bocpd(Array(5.0, 5.0, 5.0), 250.0)
    assert(r.isChangepoint.length == 3 && r.isChangepoint.forall(!_))
  }

  test("planted level shift is detected at the break") {
    val long = Array.fill(30)(1.0) ++ Array.fill(30)(10.0)
    val r = Changepoint.bocpd(long, 250.0)
    // a changepoint is flagged within 2 positions of the true break (30)
    assert(r.isChangepoint.zipWithIndex.exists { case (b, i) => b && math.abs(i - 30) <= 2 },
      r.isChangepoint.zipWithIndex.filter(_._1).map(_._2).mkString(","))
  }
}
