#!/usr/bin/env python
"""Offline guided-quality proxy for the beyond-reference samplers (VERDICT r3 #2).

Real checkpoints are unreachable here (zero egress), so the quality claims
behind `--dpm-solver` ("ddim50 budgets near ddim250 quality") and
`--fast-guidance` ("quality differs; re-validate") need an offline,
quantitative stand-in. This harness builds a GUIDED toy system where
everything is analytic except the solver under test, then drives it through
the REAL product machinery (diffusion.sampler.make_guided_step — the same
condition_score path, the same fast_guidance detach, the same DPM-Solver++
update the CLI uses):

- analytic diffusion model: x0 ~ N(MU, S2·I) admits the exact eps-prediction
  in closed form (same construction as tests/test_dpm.py), so there is no
  network-approximation error — every deviation is solver error;
- toy "CLIP" guidance with a known optimum: a fixed random linear projection
  P plays the CLIP image tower; the loss is the real pipeline's geometry —
  spherical distance between the L2-normalized projection of the blended
  x_in (pred_xstart·fac + x·(1−fac), the cond_fn blend, cgd/cgd.py:177-179)
  and a unit target embedding, scaled by a guidance weight.

Ground truth = the reference-semantics guided probability-flow ODE (full
gradient THROUGH the model, DDIM eta=0) at 1000 steps. Each arm starts from
identical noise; the guided ODE is deterministic, so the truth endpoint is
well-defined per seed.

Metrics per arm (mean over a batch of seeds):
- rms_vs_truth : RMS distance of the final sample to the truth endpoint —
  discretization error of the same dynamics (meaningful for ddim/dpm, which
  solve the SAME ODE at different budgets; fast_guidance solves a different
  guided dynamics, so its number measures the semantic gap, not just
  discretization);
- clip_objective: the toy-CLIP spherical distance at the final sample — did
  guidance reach its optimum;
- prior_fit    : mean squared Mahalanobis deviation under the data prior
  N(MU, S2) — a realism proxy (guidance overdriving the prior shows up
  here).

Run:  python tools/guided_quality_proxy.py        # prints the PERF.md table
Used by tests/test_guided_quality.py to pin the headline claims.
"""

from __future__ import annotations

import os
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MU, S2 = 0.3, 0.25
STEPS = 1000
SHAPE = (4, 8, 8, 3)  # 4 independent noise seeds
CGS = 40.0  # strong enough that guidance visibly moves the endpoint


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build_system():
    import jax.numpy as jnp

    from cgd_tpu.diffusion import make_diffusion

    d_full = make_diffusion(STEPS, "linear", None, learn_sigma=False)
    abar1000 = np.asarray(d_full.coeffs.alphas_cumprod, np.float64)

    def model_fn(params, x, t_model, rng, y):
        # exact eps-prediction for x0 ~ N(MU, S2·I) (tests/test_dpm.py:68-76)
        a = jnp.asarray(abar1000, jnp.float32)[t_model.astype(jnp.int32)]
        a = a.reshape(a.shape + (1,) * (x.ndim - 1))
        post = ((1.0 - a) * MU + jnp.sqrt(a) * S2 * x) / ((1.0 - a) + a * S2)
        return (x - jnp.sqrt(a) * post) / jnp.sqrt(jnp.maximum(1.0 - a, 1e-12))

    rs = np.random.RandomState(11)
    proj = (rs.randn(*SHAPE[1:], 16) / np.sqrt(np.prod(SHAPE[1:]))).astype(np.float32)
    target = rs.randn(16).astype(np.float32)
    target /= np.linalg.norm(target)
    return model_fn, proj, target


def _make_builder(diffusion, proj, target):
    import jax.numpy as jnp

    from cgd_tpu.diffusion.sampler import GuidanceFns

    sqrt_om = np.asarray(diffusion.sqrt_one_minus_alphas_cumprod)

    def builder(meta):
        def loss_fn(params, rng, x, out, ref_t):
            fac = jnp.asarray(sqrt_om)[ref_t]
            x_in = out.pred_xstart * fac + x * (1.0 - fac)
            emb = jnp.einsum("bhwc,hwcd->bd", x_in, jnp.asarray(proj))
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
            )
            # spherical_dist_loss geometry (guidance/losses.py)
            dist = jnp.square(2.0 * jnp.arcsin(
                jnp.linalg.norm(emb - jnp.asarray(target), axis=-1) / 2.0
            ))
            return CGS * dist.sum()

        return GuidanceFns(loss_fn, lambda g: g)

    return builder


def _run_arm(n_steps: int, mode: str, model_fn, proj, target, x_start):
    """mode: 'ddim' | 'dpm' | 'fast' (fast = detached guidance over ddim)."""
    import jax
    import jax.numpy as jnp

    from cgd_tpu.diffusion import make_diffusion
    from cgd_tpu.diffusion.sampler import SamplerConfig, StepMeta, make_guided_step

    d = make_diffusion(STEPS, "linear", f"ddim{n_steps}", learn_sigma=False)
    builder = _make_builder(d, proj, target)
    cfg = SamplerConfig(
        use_ddim=True,
        fast_guidance=(mode == "fast"),
        dpm_solver=(mode == "dpm"),
    )
    step = make_guided_step(d, model_fn, builder(StepMeta(0, True, 1)), cfg)

    S = d.num_timesteps
    ts = np.arange(S - 1, -1, -1, dtype=np.int32)
    ref_ts = ts.copy()  # skip=0: reference bookkeeping == true t indices
    zeros_noise = None  # eta=0 / dpm: deterministic

    @jax.jit
    def run(x):
        if mode == "dpm":
            tps = np.concatenate([ts[:1], ts[:-1]]).astype(np.int32)
            fis = np.zeros(S, np.bool_)
            fis[0] = True

            def body(carry, per):
                x, x0p = carry
                t, rt, tp, fi = per
                x, _p, _y, x0p = step(
                    {}, x, t, rt, None, jax.random.PRNGKey(0),
                    dpm_state=(x0p, tp, fi),
                )
                return (x, x0p), ()

            (x, _), _ = jax.lax.scan(
                body, (x, jnp.zeros_like(x)), (ts, ref_ts, tps, fis)
            )
            return x

        def body(x, per):
            t, rt = per
            x, _p, _y = step({}, x, t, rt, None, jax.random.PRNGKey(0))
            return x, ()

        x, _ = jax.lax.scan(body, x, (ts, ref_ts))
        return x

    return np.asarray(run(x_start))


def _metrics(final: np.ndarray, truth: np.ndarray, proj, target) -> Dict[str, float]:
    emb = np.einsum("bhwc,hwcd->bd", final, proj)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
    dist = np.square(2.0 * np.arcsin(
        np.clip(np.linalg.norm(emb - target, axis=-1) / 2.0, 0.0, 1.0)
    ))
    return {
        "rms_vs_truth": float(np.sqrt(np.mean((final - truth) ** 2))),
        "clip_objective": float(np.mean(dist)),
        "prior_fit": float(np.mean((final - MU) ** 2 / S2)),
    }


def compute_table() -> Dict[str, Dict[str, float]]:
    import jax
    import jax.numpy as jnp

    model_fn, proj, target = _build_system()
    x_start = jnp.asarray(
        np.random.RandomState(5).randn(*SHAPE).astype(np.float32)
    )

    log("computing guided truth (ddim1000, full gradient)...")
    truth = _run_arm(1000, "ddim", model_fn, proj, target, x_start)

    arms = [
        ("ddim250 (reference default)", 250, "ddim"),
        ("ddim50", 50, "ddim"),
        ("dpm@50 (--dpm-solver)", 50, "dpm"),
        ("dpm@25", 25, "dpm"),
        ("fast@250 (--fast-guidance)", 250, "fast"),
        ("fast@50 (--fast-guidance)", 50, "fast"),
    ]
    table = {}
    for name, n, mode in arms:
        log(f"running {name} ...")
        final = _run_arm(n, mode, model_fn, proj, target, x_start)
        table[name] = _metrics(final, truth, proj, target)
    table["truth (ddim1000)"] = _metrics(truth, truth, proj, target)
    return table


def main():
    # tiny analytic graphs: force the local CPU backend (the axon TPU tunnel
    # pays a remote compile round-trip per arm for no benefit; note
    # JAX_PLATFORMS=cpu in the env is ignored here — CLAUDE.md)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    table = compute_table()
    w = max(len(k) for k in table)
    print(f"| {'arm':<{w}} | rms_vs_truth | clip_objective | prior_fit |")
    print(f"|{'-' * (w + 2)}|--------------|----------------|-----------|")
    for name, m in table.items():
        print(
            f"| {name:<{w}} | {m['rms_vs_truth']:<12.4f} "
            f"| {m['clip_objective']:<14.4f} | {m['prior_fit']:<9.3f} |"
        )


if __name__ == "__main__":
    main()
