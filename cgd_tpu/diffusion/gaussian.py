"""Gaussian diffusion process: pure-functional, jit-first.

Reimplements (TPU-native, NHWC, channels-last) the mathematical contract of
guided_diffusion's ``GaussianDiffusion``/``SpacedDiffusion`` as used by the
reference (SURVEY.md §2b; reference call sites cgd/cgd.py:177,250-262,
cgd/script_util.py:316).

Design notes (why this is not a port):
- Everything here is a pure function of ``(coeffs arrays, x, t, model_out)``;
  the samplers `lax.scan` over steps with these fused into one XLA computation.
- Images are NHWC float (channels last) — the TPU-preferred conv layout.
- Per-timestep coefficients are gathered with scalar dynamic-slices; under a
  scan over a *static* respaced index array XLA constant-folds the gathers.
- The learned-sigma channel split follows the ADM convention: model emits
  2*C channels, first C = epsilon, last C = variance-interpolation logits.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from cgd_tpu.diffusion.respace import space_timesteps
from cgd_tpu.diffusion.schedules import ScheduleCoefficients, get_named_beta_schedule


def _bcast(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather arr[t] (t: scalar or [B]) and right-pad dims for NHWC broadcast."""
    vals = jnp.asarray(arr)[t]
    if jnp.ndim(vals) == 0:
        return vals
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


class PMeanVariance(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray
    eps: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """A (possibly respaced) diffusion process.

    ``coeffs`` are over the *spaced* process (num_timesteps == len(timestep_map)).
    ``timestep_map`` maps spaced index -> original timestep (for the model's
    time embedding); ``rescale_timesteps`` multiplies by 1000/original_T
    (512px checkpoints only, per data/diffusion_model_flags.py:66,107 in the
    reference).
    """

    coeffs: ScheduleCoefficients
    timestep_map: np.ndarray  # int32 [S] spaced->original
    original_num_steps: int
    rescale_timesteps: bool = False
    learn_sigma: bool = True

    @property
    def num_timesteps(self) -> int:
        return self.coeffs.num_timesteps

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        # Read directly by guidance blending (reference: cgd/cgd.py:177).
        return self.coeffs.sqrt_one_minus_alphas_cumprod

    # -- model-time mapping ------------------------------------------------
    def model_time(self, t: jnp.ndarray) -> jnp.ndarray:
        """Spaced index -> value fed to the model's timestep embedding."""
        mapped = jnp.asarray(self.timestep_map, dtype=jnp.int32)[t]
        if self.rescale_timesteps:
            return mapped.astype(jnp.float32) * (1000.0 / self.original_num_steps)
        return mapped.astype(jnp.float32)

    # -- forward process ---------------------------------------------------
    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        c = self.coeffs
        nd = x_start.ndim
        return (
            _bcast(c.sqrt_alphas_cumprod, t, nd) * x_start
            + _bcast(c.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    # -- reverse process ---------------------------------------------------
    def predict_xstart_from_eps(self, x: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
        c = self.coeffs
        nd = x.ndim
        return (
            _bcast(c.sqrt_recip_alphas_cumprod, t, nd) * x
            - _bcast(c.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def predict_eps_from_xstart(self, x: jnp.ndarray, t: jnp.ndarray, x0: jnp.ndarray) -> jnp.ndarray:
        c = self.coeffs
        nd = x.ndim
        return (
            _bcast(c.sqrt_recip_alphas_cumprod, t, nd) * x - x0
        ) / _bcast(c.sqrt_recipm1_alphas_cumprod, t, nd)

    def q_posterior_mean(self, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        c = self.coeffs
        nd = x_t.ndim
        return (
            _bcast(c.posterior_mean_coef1, t, nd) * x_start
            + _bcast(c.posterior_mean_coef2, t, nd) * x_t
        )

    def p_mean_variance(
        self,
        model_output: jnp.ndarray,
        x: jnp.ndarray,
        t: jnp.ndarray,
        clip_denoised: bool = False,
        denoised_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    ) -> PMeanVariance:
        """Split learned-sigma output, predict x0, form posterior mean/variance.

        ``model_output``: [B,H,W,2C] if learn_sigma else [B,H,W,C]; x: [B,H,W,C].
        """
        c = self.coeffs
        nd = x.ndim
        ch = x.shape[-1]
        if self.learn_sigma:
            eps = model_output[..., :ch]
            var_logits = model_output[..., ch:]
            min_log = _bcast(c.posterior_log_variance_clipped, t, nd)
            max_log = _bcast(c.log_betas, t, nd)
            frac = (var_logits.astype(jnp.float32) + 1.0) / 2.0
            log_variance = frac * max_log + (1.0 - frac) * min_log
            variance = jnp.exp(log_variance)
        else:
            eps = model_output
            # FIXED_LARGE, matching guided_diffusion's create_gaussian_diffusion
            # choice when learn_sigma=False: betas, with posterior_variance[1]
            # substituted at t=0 (where beta_0's posterior variance is 0).
            if len(c.betas) > 1:
                var_arr = np.append(c.posterior_variance[1], c.betas[1:])
            else:
                var_arr = c.posterior_variance
            variance = _bcast(var_arr.astype(np.float32), t, nd) * jnp.ones_like(x)
            log_variance = jnp.log(jnp.maximum(variance, 1e-20))

        eps = eps.astype(jnp.float32)
        pred_xstart = self.predict_xstart_from_eps(x, t, eps)
        if denoised_fn is not None:
            pred_xstart = denoised_fn(pred_xstart)
        if clip_denoised:
            pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
        mean = self.q_posterior_mean(pred_xstart, x, t)
        return PMeanVariance(mean, variance, log_variance, pred_xstart, eps)

    # -- conditioned reverse steps ------------------------------------------
    def p_sample_step(
        self,
        out: PMeanVariance,
        x: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
        cond_grad: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Ancestral step. ``cond_grad`` follows the fork's
        condition_mean_with_grad: new_mean = mean + variance * grad."""
        mean = out.mean
        if cond_grad is not None:
            mean = mean + out.variance * cond_grad.astype(jnp.float32)
        nonzero = (t != 0).astype(jnp.float32)
        nonzero = nonzero.reshape(nonzero.shape + (1,) * (x.ndim - nonzero.ndim))
        return mean + nonzero * jnp.exp(0.5 * out.log_variance) * noise

    def dpm_solver2m_step(
        self,
        out: PMeanVariance,
        x: jnp.ndarray,
        t: jnp.ndarray,
        t_prev: jnp.ndarray,
        first: jnp.ndarray,
        x0_prev: jnp.ndarray,
        cond_grad: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """DPM-Solver++(2M) multistep update (data prediction, deterministic).

        Beyond the reference (it only has ancestral + DDIM): a second-order
        solver for the probability-flow ODE reaches a given discretization
        error in roughly sqrt() the steps of DDIM, so respace budgets like
        ddim50 land near ddim250 quality. Lu et al. 2022 (DPM-Solver++),
        eq. (4.2)/(4.3), multistep variant.

        Guidance enters exactly like :meth:`ddim_sample_step`
        (condition_score, cgd/cgd.py fork semantics): eps' = eps -
        sqrt(1-abar)*grad, x0 re-predicted from eps'. The update then works
        entirely in the guided data prediction:

            lam    = log(alpha/sigma)           (half-log-SNR)
            h      = lam_s - lam_t              (target s = t-1 level)
            r      = (lam_t - lam_prev) / h
            D      = (1 + 1/(2r)) x0_t - 1/(2r) x0_prev
            x_s    = (sigma_s/sigma_t) x_t - alpha_s (e^{-h} - 1) D

        ``first`` (per-step bool/0-1 scalar) selects the first-order update
        D = x0_t (no previous prediction exists yet); the final step (t==0)
        also runs first-order — the standard lower_order_final stabilizer.
        Deliberate deviation from the standard formulation (ADVICE r3):
        upstream DPM-Solver++ gates lower_order_final on small budgets
        (num_steps < 15); here it applies at EVERY budget so the scanned
        step stays shape/branch-static under jit. Cost: one second-order
        step becomes first-order at large budgets — O(h^2) on the final
        (smallest-h) hop, negligible, and strictly on the stable side.
        First-order DPM++ is algebraically identical
        to DDIM eta=0 (pinned by tests/test_dpm.py).

        Returns ``(x_next, x0_guided)``; callers carry ``x0_guided`` as the
        next step's ``x0_prev``.
        """
        c = self.coeffs
        nd = x.ndim
        pred_xstart = out.pred_xstart
        abar_t = _bcast(c.alphas_cumprod, t, nd)
        if cond_grad is not None:
            eps = self.predict_eps_from_xstart(x, t, pred_xstart)
            eps = eps - jnp.sqrt(1.0 - abar_t) * cond_grad.astype(jnp.float32)
            pred_xstart = self.predict_xstart_from_eps(x, t, eps)
        x0 = pred_xstart.astype(jnp.float32)

        def lam(abar):
            # half-log-SNR; the 1-abar clamp only engages at the final
            # target level (abar_prev[0] == 1), where sigma_s==0 makes the
            # x_t term vanish and e^{-h} underflow to 0 regardless
            return 0.5 * (jnp.log(abar) - jnp.log(jnp.maximum(1.0 - abar, 1e-20)))

        abar_s = _bcast(c.alphas_cumprod_prev, t, nd)
        abar_p = _bcast(c.alphas_cumprod, t_prev, nd)
        lam_t, lam_s, lam_p = lam(abar_t), lam(abar_s), lam(abar_p)
        h = lam_s - lam_t

        first = jnp.asarray(first)
        fo = jnp.logical_or(first.astype(bool), t == 0)  # [B] or scalar
        fo = fo.reshape(fo.shape + (1,) * (nd - fo.ndim))
        # r is garbage on first-order steps (t_prev carries no meaning);
        # keep it finite so the unselected where-branch stays NaN-free
        r = jnp.where(fo, 1.0, (lam_t - lam_p) / h)
        # Extrapolation guard: the reference checkpoints' uniform-in-t
        # respacing grids grow their log-SNR gaps toward t=0 (the last hop
        # of a 16-step grid spans lam 1.5 -> 4.6 while the previous spans
        # 0.7), so the raw backward-difference weight h/(2*h_prev) can
        # exceed 2 and over-extrapolate badly. Clamp it to 0.5 — its exact
        # value on a uniform-log-SNR grid. Measured on the analytic-score
        # ODE (tests/test_dpm.py): unclamped is WORSE than DDIM at 16 steps
        # (0.156 vs 0.086 rms); clamped is 6x better (0.014) and 27x better
        # at 32 steps, and the clamp never engages on shrinking-gap grids.
        coef = jnp.minimum(1.0 / (2.0 * r), 0.5)
        d = jnp.where(fo, x0, (1.0 + coef) * x0 - coef * x0_prev.astype(jnp.float32))

        sigma_t = jnp.sqrt(1.0 - abar_t)
        sigma_s = jnp.sqrt(jnp.maximum(1.0 - abar_s, 0.0))
        alpha_s = jnp.sqrt(abar_s)
        x_next = (sigma_s / sigma_t) * x - alpha_s * jnp.expm1(-h) * d
        return x_next, x0

    def ddim_sample_step(
        self,
        out: PMeanVariance,
        x: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
        cond_grad: Optional[jnp.ndarray] = None,
        eta: float = 0.0,
    ) -> jnp.ndarray:
        """DDIM step with the fork's condition_score_with_grad semantics:
        eps' = eps - sqrt(1-abar)*grad, x0 re-predicted from eps'."""
        c = self.coeffs
        nd = x.ndim
        pred_xstart = out.pred_xstart
        if cond_grad is not None:
            abar = _bcast(c.alphas_cumprod, t, nd)
            eps = self.predict_eps_from_xstart(x, t, pred_xstart)
            eps = eps - jnp.sqrt(1.0 - abar) * cond_grad.astype(jnp.float32)
            pred_xstart = self.predict_xstart_from_eps(x, t, eps)
        else:
            eps = self.predict_eps_from_xstart(x, t, pred_xstart)

        abar = _bcast(c.alphas_cumprod, t, nd)
        abar_prev = _bcast(c.alphas_cumprod_prev, t, nd)
        sigma = (
            eta
            * jnp.sqrt((1.0 - abar_prev) / (1.0 - abar))
            * jnp.sqrt(1.0 - abar / abar_prev)
        )
        mean_pred = (
            pred_xstart * jnp.sqrt(abar_prev)
            + jnp.sqrt(jnp.maximum(1.0 - abar_prev - sigma**2, 0.0)) * eps
        )
        nonzero = (t != 0).astype(jnp.float32)
        nonzero = nonzero.reshape(nonzero.shape + (1,) * (x.ndim - nonzero.ndim))
        return mean_pred + nonzero * sigma * noise


def make_diffusion(
    steps: int = 1000,
    noise_schedule: str = "linear",
    timestep_respacing: Union[str, Sequence[int], None] = None,
    rescale_timesteps: bool = False,
    learn_sigma: bool = True,
) -> GaussianDiffusion:
    """Factory: named schedule + respacing -> GaussianDiffusion.

    Respacing recomputes betas over the kept subset exactly like
    SpacedDiffusion: beta~_i = 1 - abar_i/abar_{i-1} (SURVEY.md §2b respace).
    Computed in float64 then cast, for parity with the reference's NumPy path.
    """
    base_betas = get_named_beta_schedule(noise_schedule, steps)
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = str(steps)
    kept = space_timesteps(steps, timestep_respacing)

    base_alphas_cumprod = np.cumprod(1.0 - np.asarray(base_betas, dtype=np.float64))
    last_alpha_cumprod = 1.0
    new_betas = []
    for i in kept:
        new_betas.append(1.0 - base_alphas_cumprod[i] / last_alpha_cumprod)
        last_alpha_cumprod = base_alphas_cumprod[i]
    coeffs = ScheduleCoefficients.from_betas(np.array(new_betas, dtype=np.float64))
    return GaussianDiffusion(
        coeffs=coeffs,
        timestep_map=np.asarray(kept, dtype=np.int32),
        original_num_steps=steps,
        rescale_timesteps=rescale_timesteps,
        learn_sigma=learn_sigma,
    )
