package graft.bench

/**
 * Pure estimator math for the two-level scaling bench (see BASELINE.md,
 * "Estimator (round-4 form)"). Factored out of the Bench main so the
 * methodology itself is unit-testable: the specs replay the recorded
 * pathological windows (a throttled round fabricating >1.0 "efficiency",
 * a calibration discard that would inflate best-of, a mid-run throttle
 * invisible to bracketing calibrations) and pin the intended behavior.
 *
 * Two composites with different robustness mechanics:
 *  - bestOf: min time per level over ALL attempts (paired rounds + bonus
 *    attempts). Selection-free — host throttling only ever slows a run,
 *    so it can never fabricate a per-level minimum, and no discard rule
 *    can bias it in either direction.
 *  - pairedMedian: median of per-round N/(4·4N) ratios, which ARE
 *    poisoned by either side of a round being throttled — computed over
 *    rounds that pass three auditable checks: (a) ratio at or below the
 *    physical ceiling; (b) both bracketing pure-compute calibrations
 *    within `floor` of the run's peak at that thread count; (c) both
 *    in-run trace p10s within `floor` of the PER-LEVEL in-run peak
 *    (bursts compete with Spark's own overhead threads, so their level
 *    sits lower at higher parallelism — only same-level comparisons
 *    isolate host throttling from our own load profile).
 */
object ScalingStats {

  /** One paired round: leg times, bracketing calibrations (Mops), and
   *  in-run trace p10s (Mops; -1 = no samples). */
  final case class Round(nSec: Double, n4Sec: Double,
                         calibN: Double, calib4N: Double,
                         inrunN: Double = -1.0, inrun4N: Double = -1.0) {
    def eff: Double = nSec / n4Sec / 4.0
  }

  final case class Composites(bestOf: Double, pairedMedian: Double,
                              medianBase: Seq[Round], discarded: Seq[Round],
                              plausible: Seq[Round], clean: Seq[Round])

  def plausible(rounds: Seq[Round], ceiling: Double): Seq[Round] =
    rounds.filter(_.eff <= ceiling)

  /** Rounds eligible for the median: plausible AND bracket-clean AND
   *  in-run-clean. Peaks evolve as attempts accumulate, so classification
   *  is always against the CURRENT maxima; bonus attempts contribute
   *  their in-run p10s to the per-level peaks. */
  def calibClean(rounds: Seq[Round], ceiling: Double, floor: Double,
                 bonusInrunN: Seq[Double] = Nil,
                 bonusInrun4N: Seq[Double] = Nil): Seq[Round] = {
    if (rounds.isEmpty) return Nil
    val maxN = rounds.map(_.calibN).max
    val max4N = rounds.map(_.calib4N).max
    val inrunPeakN = (rounds.map(_.inrunN) ++ bonusInrunN)
      .filter(_ > 0).maxOption.getOrElse(-1.0)
    val inrunPeak4N = (rounds.map(_.inrun4N) ++ bonusInrun4N)
      .filter(_ > 0).maxOption.getOrElse(-1.0)
    def inrunOk(v: Double, peak: Double): Boolean =
      v <= 0 || peak <= 0 || v >= floor * peak
    plausible(rounds, ceiling).filter(r =>
      r.calibN >= floor * maxN && r.calib4N >= floor * max4N &&
        inrunOk(r.inrunN, inrunPeakN) && inrunOk(r.inrun4N, inrunPeak4N))
  }

  /** Both composites from the raw data. `bonusN`/`bonus4N` are
   *  (sec, inrunP10) single-level attempts: they extend the per-level
   *  minima and in-run peaks but never join the paired median. The
   *  median base falls back clean -> plausible -> all so a fully
   *  throttled window still reports SOMETHING (flagged by
   *  clean.isEmpty), and discarded = rounds excluded from that base. */
  def composites(rounds: Seq[Round], ceiling: Double, floor: Double,
                 bonusN: Seq[(Double, Double)] = Nil,
                 bonus4N: Seq[(Double, Double)] = Nil): Composites = {
    require(rounds.nonEmpty, "no rounds")
    val bestN = (rounds.map(_.nSec) ++ bonusN.map(_._1)).min
    val best4N = (rounds.map(_.n4Sec) ++ bonus4N.map(_._1)).min
    val bestOf = bestN / best4N / 4.0
    val pl = plausible(rounds, ceiling)
    val clean = calibClean(rounds, ceiling, floor,
      bonusN.map(_._2), bonus4N.map(_._2))
    val medBase = if (clean.nonEmpty) clean
                  else if (pl.nonEmpty) pl else rounds
    val effs = medBase.map(_.eff).sorted
    val med =
      if (effs.size % 2 == 1) effs(effs.size / 2)
      else (effs(effs.size / 2 - 1) + effs(effs.size / 2)) / 2.0
    Composites(bestOf, med, medBase, rounds.diff(medBase), pl, clean)
  }
}
