"""Offline GUIDED-quality proxy for the beyond-reference samplers
(VERDICT r3 #2): analytic-score diffusion + a toy-CLIP guidance loss with a
known optimum, driven through the REAL make_guided_step machinery — see
tools/guided_quality_proxy.py for the construction and PERF.md ('Guided
quality proxy') for the measured table.

These tests pin the advertised claims quantitatively:
- `--dpm-solver` at a ddim50 budget lands CLOSER to the guided-ODE truth
  than the reference-default ddim250 (the "ddim50 ~ ddim250 quality" claim,
  with margin), and far closer than ddim at the same budget;
- `--fast-guidance`'s deviation is a bounded SEMANTIC gap (it solves a
  different guided dynamics): its error does not shrink with budget, but it
  still reaches the guidance optimum and stays near the data prior.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def table():
    import guided_quality_proxy as gqp

    return gqp.compute_table()


@pytest.mark.slow
class TestGuidedQualityProxy:
    def test_dpm50_matches_ddim250_quality(self, table):
        dpm50 = table["dpm@50 (--dpm-solver)"]["rms_vs_truth"]
        ddim250 = table["ddim250 (reference default)"]["rms_vs_truth"]
        # measured 0.0027 vs 0.0040 — dpm at 1/5 the budget is at least as
        # close to the guided truth as the reference default
        assert dpm50 <= 1.2 * ddim250, table

    def test_dpm50_far_better_than_ddim50(self, table):
        dpm50 = table["dpm@50 (--dpm-solver)"]["rms_vs_truth"]
        ddim50 = table["ddim50"]["rms_vs_truth"]
        # measured 0.0027 vs 0.0247 (~9x): second order at equal budget
        assert dpm50 < 0.35 * ddim50, table

    def test_fast_guidance_gap_is_semantic_not_discretization(self, table):
        f250 = table["fast@250 (--fast-guidance)"]["rms_vs_truth"]
        f50 = table["fast@50 (--fast-guidance)"]["rms_vs_truth"]
        ddim250 = table["ddim250 (reference default)"]["rms_vs_truth"]
        # the fast arm's distance to the full-gradient truth barely moves
        # with budget (0.081 vs 0.085) and dwarfs ddim250's discretization
        # error — it is a different dynamics, as documented
        assert f250 > 3.0 * ddim250, table
        assert abs(f250 - f50) < 0.5 * f250, table

    def test_fast_guidance_still_reaches_the_objective(self, table):
        truth = table["truth (ddim1000)"]
        f250 = table["fast@250 (--fast-guidance)"]
        # guidance optimum reached (measured 0.0027 vs truth 0.0022) and the
        # samples stay plausible under the data prior (measured 0.94 vs 1.07)
        assert f250["clip_objective"] < 3.0 * max(truth["clip_objective"], 1e-3), table
        assert abs(f250["prior_fit"] - 1.0) < 0.3, table

    def test_all_arms_produce_finite_metrics(self, table):
        for arm, m in table.items():
            for k, v in m.items():
                assert v == v and abs(v) < 1e6, (arm, k, v)
