package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bench.ScalingStats
import graft.bench.ScalingStats.Round

/** Pins the scaling-bench estimator math against the pathological host
 *  windows recorded in bench/BENCH_local_r*.json (see BASELINE.md).
 *  Ceiling 1.05 and floor 0.85 match the Bench defaults. */
class ScalingStatsSpec extends AnyFunSuite {
  private val Ceil = 1.05
  private val Floor = 0.85

  test("a throttled-N round fabricating >1.0 efficiency is implausible " +
       "and cannot poison the median (BENCH_r03 round 2)") {
    // r03: N 189.8s/4N 52.8s (0.898 clean), then N 542.1s/4N 47.2s (2.87)
    val rounds = Seq(
      Round(189.8, 52.8, 1940, 7071),
      Round(542.1, 47.2, 1834, 7071))
    val st = ScalingStats.composites(rounds, Ceil, Floor)
    assert(st.plausible == Seq(rounds.head))
    assert(st.pairedMedian === 0.898 +- 0.001)
    // best-of still uses BOTH rounds' raw times: min N 189.8, min 4N 47.2
    assert(st.bestOf === 189.8 / 47.2 / 4.0 +- 1e-9)
  }

  test("best-of is selection-free: a calibration discard never removes " +
       "a per-level minimum (run4's fastest-N round)") {
    // run4: the fastest N leg (137.1s) sat in a calibration-dirty round;
    // an earlier estimator draft discarded it and INFLATED best-of
    val rounds = Seq(
      Round(154.3, 51.7, 1933, 6018), // calib-clean
      Round(137.1, 41.9, 1587, 6446)) // N bracket 18% under peak -> dirty
    val st = ScalingStats.composites(rounds, Ceil, Floor)
    assert(st.clean == Seq(rounds.head))
    // the dirty round's times still set both minima
    assert(st.bestOf === 137.1 / 41.9 / 4.0 +- 1e-9)
  }

  test("a mid-run throttle invisible to bracketing calibrations is " +
       "caught by the in-run p10 (run8 round 1 vs run9 rules)") {
    // run8 r1: brackets at peak, yet the 4N leg ran 35% slower than the
    // same config minutes later. With in-run p10s the round is dirty.
    val rounds = Seq(
      Round(265.7, 102.5, 1863, 7207, inrunN = 426, inrun4N = 244),
      Round(231.2, 76.4, 1800, 7153, inrunN = 399, inrun4N = 367))
    val st = ScalingStats.composites(rounds, Ceil, Floor)
    assert(st.clean == Seq(rounds(1)))
    assert(st.pairedMedian === rounds(1).eff +- 1e-9)
  }

  test("in-run p10s compare per level, not globally: structurally lower " +
       "4N bursts do not void clean rounds") {
    // 4N bursts sit ~20% under N bursts even on a quiet host (Spark's own
    // overhead threads); a global peak would discard every 4N leg
    val rounds = Seq(
      Round(230.0, 70.0, 1900, 7400, inrunN = 420, inrun4N = 340),
      Round(232.0, 71.0, 1880, 7350, inrunN = 425, inrun4N = 335))
    val st = ScalingStats.composites(rounds, Ceil, Floor)
    assert(st.clean.size == 2)
  }

  test("bonus attempts extend the per-level minima and in-run peaks but " +
       "never join the paired median") {
    val rounds = Seq(
      Round(240.0, 80.0, 1900, 7400, inrunN = 420, inrun4N = 400))
    // a bonus 4N attempt faster than any paired leg, with a clean trace
    val st = ScalingStats.composites(rounds, Ceil, Floor,
      bonus4N = Seq((70.0, 410.0)))
    assert(st.bestOf === 240.0 / 70.0 / 4.0 +- 1e-9)
    assert(st.medianBase == rounds) // median untouched by the bonus
    // a THROTTLED bonus raises the 4N in-run peak enough to dirty the
    // paired round? No: peaks only rise with FASTER traces, and a dirty
    // bonus (low p10) cannot lower anyone's classification
    val st2 = ScalingStats.composites(rounds, Ceil, Floor,
      bonus4N = Seq((95.0, 150.0)))
    assert(st2.clean == rounds)
    assert(st2.bestOf === rounds.head.eff +- 1e-9) // 95s is not a minimum
  }

  test("missing in-run samples (-1) never disqualify a round") {
    val rounds = Seq(
      Round(240.0, 75.0, 1900, 7400), // no trace at all
      Round(245.0, 76.0, 1890, 7380, inrunN = 420, inrun4N = 400))
    val st = ScalingStats.composites(rounds, Ceil, Floor)
    assert(st.clean.size == 2)
  }

  private implicit class Approx(a: Double) {
    def ===(b: ApproxTarget): Boolean = math.abs(a - b.v) <= b.eps
  }
  private case class ApproxTarget(v: Double, eps: Double)
  private implicit class TargetOps(v: Double) {
    def +-(eps: Double): ApproxTarget = ApproxTarget(v, eps)
  }
}
