"""Offline GUIDED-quality proxy for the beyond-reference samplers and the
reference's three advertised perf flags (VERDICT r3 #2, r4 #3):
analytic-score diffusion + a NONLINEAR toy-CLIP tower (fixed random
conv/tanh tower — the r4 linear projection's convex landscape could not
exhibit CLIP-like multimodality), driven through the REAL sample_loop —
see tools/guided_quality_proxy.py for the construction and PERF.md
('Guided quality proxy') for the measured tables.

These tests pin the advertised claims quantitatively:
- `--dpm-solver` at a ddim50 budget lands CLOSER to the guided-ODE truth
  than the reference-default ddim250 (the "ddim50 ~ ddim250 quality" claim,
  with margin), and far closer than ddim at the same budget;
- `--fast-guidance`'s deviation is a bounded SEMANTIC gap (it solves a
  different guided dynamics): its error does not shrink with budget, and
  with the nonlinear tower it reaches a measurably WORSE guidance optimum
  (0.74 vs 0.54) while staying near the data prior;
- the reference's perf flags (/root/reference/README.md:149-169):
  `--progressive-cutout` is nearly free, `--reduce-clip` is a modest
  tradeoff, and `--cached-cutouts` moves the endpoint the most (guidance
  overfits its one fixed crop set) — the first quality numbers anywhere
  for these flags.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


@pytest.fixture(scope="module")
def table():
    import guided_quality_proxy as gqp

    return gqp.compute_table()


@pytest.fixture(scope="module")
def flag_table():
    import guided_quality_proxy as gqp

    return gqp.compute_flag_table()


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


@pytest.mark.slow
class TestPerfFlagQuality:
    """The reference advertises --reduce-clip / --progressive-cutout /
    --cached-cutouts as speed/quality tradeoffs (README.md:149-169) but
    publishes no quality numbers; this pins the measured tradeoffs
    (baseline = ddim250, all flags off; measured r5: progressive 0.0032,
    reduce 0.0372, cached 0.0907 rms from the default endpoint)."""

    def test_progressive_cutout_nearly_free(self, flag_table):
        m = flag_table["--progressive-cutout"]
        base = flag_table["baseline ddim250 (flags off)"]
        # measured 0.0032 rms — far below the visible-change scale (prior
        # std is 0.5) — and the guidance objective is unchanged
        assert m["rms_vs_baseline"] < 0.02, flag_table
        assert abs(m["clip_objective"] - base["clip_objective"]) < 0.05 * base["clip_objective"], flag_table

    def test_reduce_clip_bounded_tradeoff(self, flag_table):
        m = flag_table["--reduce-clip"]
        base = flag_table["baseline ddim250 (flags off)"]
        # measured 0.0372 rms / +6% objective: a real but modest cost for
        # skipping 20% of steps and 3/4 of mid-run guidance evaluations
        assert m["rms_vs_baseline"] < 0.08, flag_table
        assert m["clip_objective"] < 1.25 * base["clip_objective"], flag_table

    def test_cached_cutouts_is_the_costliest_flag(self, flag_table):
        """Fixed coords let guidance overfit one crop set: cached-cutouts
        moves the endpoint MORE than either other flag (measured 0.0907 vs
        0.0372/0.0032) and degrades the held-out-crop objective most. The
        reference README does not warn about this."""
        cached = flag_table["--cached-cutouts"]
        red = flag_table["--reduce-clip"]
        prog = flag_table["--progressive-cutout"]
        base = flag_table["baseline ddim250 (flags off)"]
        assert cached["rms_vs_baseline"] > red["rms_vs_baseline"], flag_table
        assert cached["rms_vs_baseline"] > prog["rms_vs_baseline"], flag_table
        assert cached["clip_objective"] > base["clip_objective"], flag_table

    def test_flags_stay_near_prior(self, flag_table):
        # none of the flags should push samples off the data manifold
        for arm, m in flag_table.items():
            assert abs(m["prior_fit"] - 1.0) < 0.3, (arm, m)
