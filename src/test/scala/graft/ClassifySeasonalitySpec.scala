package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kernels.SeasonalityExt

/** Port of test/sql/ts_classify_seasonality.test: the classification enums
  * follow the reference vocabulary (SeasonalType seasonality.rs:99-108,
  * AmplitudeModulationType :266-275) and the planted fixtures land in the
  * right classes.
  */
class ClassifySeasonalitySpec extends AnyFunSuite {

  private val timingVocab = Set("stable_seasonal", "variable_timing",
    "intermittent_seasonal", "non_seasonal")
  private val modulationVocab = Set("stable", "emerging", "fading",
    "oscillating", "non_seasonal")

  // [10,20,30,40]×4 — exact period-4 sawtooth (ts_classify_seasonality.test:14)
  private val sawtooth: Array[Double] =
    Array.tabulate(16)(i => Seq(10.0, 20.0, 30.0, 40.0)(i % 4))

  test("sawtooth classifies stable_seasonal with stable amplitude (:14-87)") {
    val c = SeasonalityExt.classify(sawtooth, 4)
    assert(c.is_seasonal)
    assert(c.timing_classification == "stable_seasonal")
    assert(c.modulation_type == "stable")
    assert(c.has_stable_timing)
    assert(timingVocab.contains(c.timing_classification))
    assert(modulationVocab.contains(c.modulation_type))
  }

  test("flat series classifies non_seasonal") {
    val flat = Array.tabulate(16)(i => 5.0 + 0.001 * i)
    val c = SeasonalityExt.classify(flat, 4)
    assert(!c.is_seasonal)
    assert(c.timing_classification == "non_seasonal")
    assert(c.modulation_type == "non_seasonal")
  }

  test("growing amplitude classifies emerging modulation") {
    // wave whose amplitude doubles across cycles
    val grow = Array.tabulate(48)(i => 10.0 + (1.0 + i / 8.0) * math.sin(2 * math.Pi * i / 8.0))
    val c = SeasonalityExt.classify(grow, 8)
    assert(c.is_seasonal)
    assert(c.modulation_type == "emerging", c.modulation_type)
    val am = SeasonalityExt.amplitudeModulation(grow, 8)
    assert(am.has_modulation && am.modulation_type == "emerging")
  }

  test("shrinking amplitude classifies fading modulation") {
    val fade = Array.tabulate(48)(i => 10.0 + (7.0 - i / 8.0) * math.sin(2 * math.Pi * i / 8.0))
    val am = SeasonalityExt.amplitudeModulation(fade, 8)
    assert(am.modulation_type == "fading", am.modulation_type)
  }

  test("strength and timing thresholds are honored (:94-110)") {
    // weak wave under deterministic jitter: seasonal at the default 0.3
    // threshold, non_seasonal once the threshold is raised above its strength
    val weak = Array.tabulate(32)(i =>
      10.0 + 0.5 * math.sin(2 * math.Pi * i / 4.0) + math.sin(i * 2.17) * 0.45)
    val lenient = SeasonalityExt.classify(weak, 4, strengthThreshold = 0.05)
    val strict = SeasonalityExt.classify(weak, 4, strengthThreshold = 0.999)
    assert(lenient.is_seasonal)
    assert(!strict.is_seasonal && strict.timing_classification == "non_seasonal")
  }
}
