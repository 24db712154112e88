"""Guided sampling loops: one fused jitted step, chunked lax.scan driver.

TPU-native replacement for the reference's
``p_sample_loop_progressive`` / ``ddim_sample_loop_progressive`` with the
crowsonkb-fork kwargs ``skip_timesteps``, ``init_image``, ``randomize_class``,
``cond_fn_with_grad`` (contract per SURVEY.md §2b gaussian_diffusion row;
reference call site cgd/cgd.py:250-262).

Design:
- The *guided step* = UNet forward + p_mean_variance + jax.grad(guidance loss)
  + conditioned update, traced into ONE XLA computation (the north-star
  requirement, SURVEY.md §7).
- The driver scans over contiguous chunks of the respaced schedule and emits
  pred_xstart at chunk boundaries (save_frequency semantics) — host transfers
  happen only at emission points, never inside the scan.
- Static per-step metadata (guidance on/off for --reduce-clip, cutout count
  for --progressive-cutout) is resolved *before* tracing; steps with different
  static shapes land in different scan segments, each compiled once.
- RNG: jax.random, folded per (step, purpose). Parity with torch RNG streams
  is statistical, not bitwise (SURVEY.md §7 hard parts #2).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgd_tpu.diffusion.gaussian import GaussianDiffusion, PMeanVariance  # noqa: F401 (PMeanVariance re-exported for guidance typing)


class StepMeta(NamedTuple):
    """Static (trace-time) description of one sampler step."""

    t: int  # spaced timestep index
    guided: bool  # run CLIP guidance this step? (--reduce-clip gate)
    cutn: int  # cutouts this step (--progressive-cutout)


def build_step_plan(
    num_timesteps: int,
    skip_timesteps: int = 0,
    reduce_clip: bool = False,
    progressive_cutout: bool = False,
    num_cutouts: int = 16,
) -> List[StepMeta]:
    """Resolve the reference's dynamic per-step Python gating into a static
    plan (reference: cgd/cgd.py:157-175).

    Semantics replicated exactly, including the `current_timestep` off-by-skip
    quirk (SURVEY.md §3.1): the reference tracks
    ``current_timestep = T-1 - consumed`` which only equals the sampler's
    actual t when skip_timesteps == 0. ``progress_pct`` below uses the
    reference's bookkeeping, not the true t, for parity.
    """
    total = num_timesteps
    indices = list(range(total - skip_timesteps))[::-1]  # actual sampler t's
    plan: List[StepMeta] = []
    for consumed, t in enumerate(indices):
        # Reference quirk: its `current_timestep` starts at T-1 and decrements
        # per consumed sample; cond_fn for step k sees T-1-k.
        ref_current = total - 1 - consumed
        progress_pct = (total - ref_current) / total
        guided = True
        if reduce_clip and progress_pct < 0.7:
            step_in_phase = int((progress_pct - 0.2) * total)
            if step_in_phase % 4 != 0:
                guided = False
        if progressive_cutout:
            if progress_pct < 0.3:
                cutn = max(4, num_cutouts // 4)
            elif progress_pct < 0.7:
                cutn = max(8, num_cutouts // 2)
            else:
                cutn = num_cutouts
        else:
            cutn = num_cutouts
        plan.append(StepMeta(t=t, guided=guided, cutn=cutn))
    return plan


# model_fn(params, x, t_model_float, rng, y) -> model output [B,H,W,2C].
# ``params`` is an explicit pytree argument (NEVER a closure capture: weights
# closed over a jitted function become inlined HLO constants — a 400MB
# literal graph that takes minutes to trace and forever to compile).
ModelFn = Callable[..., jnp.ndarray]


class GuidanceFns(NamedTuple):
    """Guidance = scalar loss + gradient post-transform.

    loss_fn(params, rng, x, out: PMeanVariance, ref_t) -> scalar, or
    (scalar, log_dict) where log_dict maps names to f32 scalars for
    observability (fetched at segment boundaries on backends without host
    callbacks). The guided step differentiates loss(x, out(x)) w.r.t. x
    THROUGH the UNet forward — matching the fork's cond_fn_with_grad
    semantics where pred_xstart is on the tape (SURVEY.md §2b:
    p_sample_with_grad re-enables grad on x before p_mean_variance).
    grad_transform(grad) -> grad or (grad, log_dict) (e.g. the use_magnitude
    RMS clamp + its Magnitude scalar, cgd/cgd.py:229-232).
    """

    loss_fn: Callable[..., jnp.ndarray]
    grad_transform: Callable[[jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    use_ddim: bool
    eta: float = 0.0
    clip_denoised: bool = False
    randomize_class: bool = False
    num_classes: int = 1000
    # NOT reference semantics: detach the p_mean_variance output inside the
    # guidance loss, so the gradient flows through the cutouts/CLIP path only
    # and XLA dead-code-eliminates the UNet backward (~45% of the guided-step
    # cost at 256px). This is the classic pre-fork CLIP-guidance formulation
    # (cond_fn sees a detached ``out``) vs the fork's cond_fn_with_grad
    # (/root/reference/cgd/cgd.py:260 + p_sample_with_grad). Opt-in;
    # quality should be re-validated with real weights before production use.
    fast_guidance: bool = False
    # Beyond the reference: DPM-Solver++(2M) second-order multistep update
    # (gaussian.dpm_solver2m_step) instead of DDIM/ancestral — comparable
    # sample quality at ~4-5x fewer respaced steps (convergence order pinned
    # by tests/test_dpm.py against an analytic-score model). Deterministic;
    # eta/use_ddim are ignored when set. Opt-in (NOT reference semantics).
    dpm_solver: bool = False


def make_guided_step(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    guidance: Optional[GuidanceFns],
    cfg: SamplerConfig,
    with_log: bool = False,
):
    """Build the fused single-step function: UNet forward + p_mean_variance +
    value_and_grad of the guidance loss (one traced computation — forward is
    shared between the gradient tape and the sampling update).

    Returns step(params, x, t: int32 scalar, ref_t: int32 scalar, y, rng)
      -> (x_next, pred_xstart, y_next), or with ``with_log``
      -> (x_next, pred_xstart, y_next, log_dict) where log_dict holds the
      guidance's f32 observability scalars ("Total Loss" etc.; empty when
      unguided). ``params`` is the model/guidance weight pytree, threaded as
      a jit argument (see ModelFn note).
    ``ref_t`` is the reference-bookkeeping timestep used by the guidance
    blend's `fac` lookup (cgd/cgd.py:177 quirk, SURVEY.md §3.1).
    """

    def step(params, x, t, ref_t, y, rng, noise_override=None, dpm_state=None):
        # dpm_state (cfg.dpm_solver only): (x0_prev, t_prev, first) — the
        # previous step's guided x0 prediction plus the static per-step
        # schedule context the 2M multistep update needs; the step then
        # returns the guided x0 as an extra output for the caller to carry.
        r_model, r_noise, r_class, r_guide = jax.random.split(rng, 4)
        if cfg.randomize_class and y is not None:
            y = jax.random.randint(r_class, y.shape, 0, cfg.num_classes)

        t_batch = jnp.full((x.shape[0],), t, dtype=jnp.int32)

        def forward(x_):
            model_out = model_fn(params, x_, diffusion.model_time(t_batch), r_model, y)
            return diffusion.p_mean_variance(
                model_out, x_, t_batch, clip_denoised=cfg.clip_denoised
            )

        log = {}
        if guidance is not None:

            def loss_and_out(x_):
                out = forward(x_)
                out_g = jax.tree.map(jax.lax.stop_gradient, out) if cfg.fast_guidance else out
                res = guidance.loss_fn(params, r_guide, x_, out_g, ref_t)
                loss, llog = res if isinstance(res, tuple) else (res, {})
                return loss, (out, llog)

            grads, (out, log) = jax.grad(loss_and_out, has_aux=True)(x)
            res = guidance.grad_transform(-grads)  # negative gradient
            if isinstance(res, tuple):
                grad, glog = res
                log = {**log, **glog}
            else:
                grad = res
        else:
            out = forward(x)
            grad = None

        if noise_override is not None:
            # recorded-noise escape hatch for bit-exact golden comparisons
            # against the torch reference (SURVEY.md §7 hard parts #2)
            noise = noise_override
        else:
            noise = jax.random.normal(r_noise, x.shape, dtype=jnp.float32)
        if cfg.dpm_solver:
            x0_prev, t_prev, first = dpm_state
            tp_batch = jnp.full((x.shape[0],), t_prev, dtype=jnp.int32)
            x_next, x0g = diffusion.dpm_solver2m_step(
                out, x, t_batch, tp_batch, first, x0_prev, grad
            )
            if with_log:
                return x_next, out.pred_xstart, y, x0g, log
            return x_next, out.pred_xstart, y, x0g
        if cfg.use_ddim:
            x_next = diffusion.ddim_sample_step(out, x, t_batch, noise, grad, eta=cfg.eta)
        else:
            x_next = diffusion.p_sample_step(out, x, t_batch, noise, grad)
        if with_log:
            return x_next, out.pred_xstart, y, log
        return x_next, out.pred_xstart, y

    return step


def segment_plan(
    plan: List[StepMeta],
    save_frequency: int,
    final_frame_parity: bool = True,
    skip_timesteps: int = 0,
) -> Tuple[List[Tuple[int, List[StepMeta]]], set]:
    """Split the static step plan into scan segments of identical meta
    (guided, cutn), each ending at a save point. Save at consumed-step k
    where k % save_frequency == 0 => segment boundaries *after* each step
    whose index hits the save rule (reference save cadence:
    cgd/cgd.py:176-197). Returns ([(start_index, [StepMeta,...]), ...],
    save_at). Pure plan arithmetic — shared by sample_loop and the
    trace-time tooling so measurements can't drift from the product's
    segmentation."""
    save_at = set()
    for k in range(len(plan)):
        if k % save_frequency == 0:
            save_at.add(k)
    if not final_frame_parity or skip_timesteps == 0:
        save_at.add(len(plan) - 1)

    segments = []
    k = 0
    n = len(plan)
    while k < n:
        seg = [plan[k]]
        j = k + 1
        while (
            j < n
            and plan[j].guided == plan[k].guided
            and plan[j].cutn == plan[k].cutn
            and (j - 1) not in save_at  # previous step was not a save point
        ):
            seg.append(plan[j])
            j += 1
        segments.append((k, seg))
        k = j
    return segments, save_at


def _img_tap_plan(seg_len: int, shape, itemsize: int) -> Tuple[int, int]:
    """(stride, n_taps) bounding the HBM the per-step wandb image taps may
    stack per segment. Two [seg_len, *shape] buffers for a final-frame-only
    run (save_frequency=250, one 250-step segment) at 512px f32 would be
    ~1.5 GB that non-wandb runs never allocate — so cap the tap buffers at
    CGD_TPU_IMG_TAP_MB (default 192 MiB: a 25-step segment at 512px f32 is
    ~158 MiB) and decimate to one tap (the last step) per stride window
    when a segment would exceed it. At the default save_frequency=25
    segments the stride stays 1 up to 512px: every guided step is tapped,
    the reference cadence (cgd/cgd.py:180-186)."""
    budget = int(os.environ.get("CGD_TPU_IMG_TAP_MB", "192")) << 20
    per_step = 2 * int(np.prod(shape)) * itemsize
    stride = max(1, -(-per_step * seg_len // max(budget, per_step)))
    n_taps = -(-seg_len // stride)
    return stride, n_taps


def sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: ModelFn,
    guidance_builder,
    params,
    shape: Tuple[int, ...],
    rng: jax.Array,
    cfg: SamplerConfig,
    *,
    skip_timesteps: int = 0,
    init_image: Optional[jnp.ndarray] = None,
    reduce_clip: bool = False,
    progressive_cutout: bool = False,
    num_cutouts: int = 16,
    save_frequency: int = 1,
    y_init: Optional[jnp.ndarray] = None,
    progress_cb: Optional[Callable[[int], None]] = None,
    noise_override=None,  # [n_steps, *shape]: recorded per-step noise (goldens)
    init_noise=None,  # [*shape]: recorded starting noise
    final_frame_parity: bool = False,
    loss_sink: Optional[Callable[[int, dict], None]] = None,
    image_sink: Optional[Callable[[list, "np.ndarray", "np.ndarray"], None]] = None,
    state_sink: Optional[Callable[[int, dict], None]] = None,
    resume: Optional[dict] = None,
    seg_cache: Optional[dict] = None,  # cross-call segment-executable cache:
    # a dict the CALLER keys by full run configuration (api.py's
    # _seg_cache_for) so a repeat-config generation in the same process
    # reuses the previous run's jitted/AOT segment functions — ZERO
    # re-tracing/lowering (the dominant warm-start host cost, PERF.md r5).
    # Safe only because everything per-run is a jit ARGUMENT (params incl.
    # prompt targets, ts/ref_ts, rng keys, dpm state); the closures baked
    # into a segment fn depend only on the caller's cache key. None = a
    # fresh private dict (the single-generation case, exactly the old
    # behavior).
    x_sharding=None,  # jax.sharding.Sharding for the carried sample (mesh
    # runs: batch over 'data', replicated over 'cut' — api.py threads
    # parallel.mesh.batch_sharding here). Applied to the initial x and to
    # resumed state so the scan's carry enters with the intended layout
    # instead of committed to one device.
) -> Iterator[Tuple[int, jnp.ndarray]]:
    """Run the full guided sampling schedule, yielding (consumed_step_index,
    pred_xstart, x_t) at the reference's save points: every ``save_frequency``
    steps plus the final step (cgd/cgd.py:265-270 contract; x_t enables the
    reference's noisy/denoised/blended wandb triptych, cgd/cgd.py:180-186).

    ``final_frame_parity`` replicates the reference's final-frame quirk
    (cgd/cgd.py:268): the "always save the last step" condition is
    ``current_timestep == -1``, with current_timestep counting down from the
    FULL schedule length — so with skip_timesteps > 0 it never fires and the
    final frame is only saved if it happens to land on a save_frequency
    multiple. False (the fix) always saves the final step.

    Steps between save points with identical static metadata run inside a
    single lax.scan; a new (guided, cutn) phase or a save point starts a new
    segment. Segments are compiled per (length, meta) signature and cached
    by jit, so e.g. save_frequency=1 compiles one 1-step scan per distinct
    meta and reuses it across all steps.

    ``loss_sink(seg_start, logs)``: loss observability without host
    callbacks (some tunneled PJRT backends reject them — CLAUDE.md trap #4):
    guided steps stack their loss scalars as scan outputs, and the sink is
    called after each segment with {name: np.ndarray[seg_len]} fetched at
    the segment boundary (reference logs per step: cgd/cgd.py:234-238).

    ``image_sink(step_ks, noisy, preds)``: per-guided-step image
    observability the same way — the reference logs its wandb triptych
    (noisy sample / denoised prediction / blend) EVERY guided step
    (cgd/cgd.py:180-186). Guided segments stack each step's incoming x_t
    and pred_xstart into carried slot buffers ([n_taps, *shape] each),
    fetched once per segment — per-step cadence with zero extra
    device->host syncs. ``step_ks`` lists the absolute step index of each
    tap. HBM for the taps is bounded by CGD_TPU_IMG_TAP_MB (_img_tap_plan):
    a segment long enough to blow the budget (save_frequency >> 25 at
    512px) is decimated to the last step of each stride window; at the
    default save_frequency=25 every guided step is tapped.

    ``state_sink(next_seg, {"x", "y"})`` / ``resume``: mid-run sampling-state
    checkpointing (beyond the reference — long 512px/1000-step runs on
    preemptible TPUs continue instead of restarting). The sink receives the
    carried sample (and class vector) after every scan segment; ``resume``
    = {"next_seg", "x", "y"} fast-forwards to that segment boundary.
    Per-segment RNG keys are all split up front from the run seed, so a
    resumed run replays the remaining segments BIT-EXACTLY equal to the
    uninterrupted run (pinned by tests/test_sampler.py).
    """
    plan = build_step_plan(
        diffusion.num_timesteps, skip_timesteps, reduce_clip, progressive_cutout, num_cutouts
    )

    rng, r_init = jax.random.split(rng)
    if init_noise is not None:
        x = jnp.asarray(init_noise, jnp.float32)
    else:
        x = jax.random.normal(r_init, shape, dtype=jnp.float32)
    if skip_timesteps > 0:
        base = jnp.zeros(shape, jnp.float32) if init_image is None else init_image
        t0 = jnp.full((shape[0],), plan[0].t, dtype=jnp.int32)
        x = diffusion.q_sample(base, t0, x)
    elif init_image is not None:
        t0 = jnp.full((shape[0],), plan[0].t, dtype=jnp.int32)
        x = diffusion.q_sample(init_image, t0, x)
    if x_sharding is not None:
        x = jax.device_put(x, x_sharding)

    y = y_init

    # split plan into segments (segment_plan): same static meta
    # (guided, cutn), ending at save points; built up front (pure python) so
    # per-segment RNG keys can be split in ONE device op — eager splits
    # inside the loop would cost a remote round trip per segment on
    # tunneled TPU backends
    segments, save_at = segment_plan(
        plan, save_frequency, final_frame_parity, skip_timesteps
    )

    # jit cache keyed by (segment_len, guided, cutn)
    scan_cache = seg_cache if seg_cache is not None else {}
    has_noise = noise_override is not None
    dpm = cfg.dpm_solver

    def seg_inputs(seg: List[StepMeta], seg_start: int):
        ts = jnp.asarray([m.t for m in seg], dtype=jnp.int32)
        ref_ts = jnp.asarray(
            [diffusion.num_timesteps - 1 - (seg_start + i) for i in range(len(seg))],
            dtype=jnp.int32,
        )
        if has_noise:
            nz = jnp.asarray(
                noise_override[seg_start : seg_start + len(seg)], jnp.float32
            )
        else:
            nz = jnp.zeros((len(seg),) + (1,) * len(shape), jnp.float32)  # unused
        if not dpm:
            return ts, ref_ts, nz, ()
        # DPM-Solver++(2M) schedule context: the previous step's t (for the
        # half-log-SNR ratio r) and a first-order flag on the run's very
        # first step only — both per-element inputs, NOT static, so segments
        # of equal (length, guided, cutn) still share one compiled graph
        tps = jnp.asarray(
            [plan[max(seg_start + i - 1, 0)].t for i in range(len(seg))],
            dtype=jnp.int32,
        )
        fis = jnp.asarray(
            [seg_start + i == 0 for i in range(len(seg))], dtype=jnp.bool_
        )
        return ts, ref_ts, nz, (tps, fis)

    def build_seg_fn(meta: StepMeta):
        # NOTE (r5 measured negative, tools/trace_time.py --no-share A/B):
        # jit-wrapping this inner step to share its traced jaxpr across
        # segment signatures does NOT cut first-run host cost — tracing is
        # shared but MLIR lowering of the inner pjit is redone per outer
        # module, and lowering dominates (256px: 12.9 s plain vs 13.7 s
        # shared; 512px: 18.3 vs 19.6). Cross-RUN reuse is the real lever
        # (seg_cache above: zero re-trace for a repeat-config generation).
        guidance = guidance_builder(meta) if meta.guided else None
        step = make_guided_step(
            diffusion, model_fn, guidance, cfg, with_log=loss_sink is not None
        )

        emit_images = image_sink is not None and meta.guided

        def scan_fn(params, img_stride):
            def body(carry, per_step):
                if dpm:
                    x, x0p, y, rng, _last, bufs = carry
                    t, ref_t, nz_k, i, tp, fi = per_step
                else:
                    x, y, rng, _last, bufs = carry
                    t, ref_t, nz_k, i = per_step
                x_noisy = x  # the step's incoming sample (wandb triptych)
                rng, r = jax.random.split(rng)
                res = step(
                    params, x, t, ref_t, y, r,
                    noise_override=nz_k if has_noise else None,
                    dpm_state=(x0p, tp, fi) if dpm else None,
                )
                if dpm:
                    if loss_sink is not None:
                        x, pred_x0, y, x0p, log = res
                    else:
                        (x, pred_x0, y, x0p), log = res, {}
                elif loss_sink is not None:
                    x, pred_x0, y, log = res
                else:
                    (x, pred_x0, y), log = res, {}
                # carry only the latest pred_x0 — stacking per-step ys
                # would write every step's x0 to HBM just to keep one
                # (log scalars are tiny: stacked as scan outputs; image
                # taps land in carried slot buffers only when an
                # image_sink asks for them, bounded by _img_tap_plan)
                if emit_images:
                    bn, bp = bufs
                    slot = i // img_stride  # last write in a window wins
                    bn = jax.lax.dynamic_update_index_in_dim(bn, x_noisy, slot, 0)
                    bp = jax.lax.dynamic_update_index_in_dim(
                        bp, pred_x0.astype(bp.dtype), slot, 0
                    )
                    bufs = (bn, bp)
                carry = (
                    (x, x0p, y, rng, pred_x0, bufs)
                    if dpm
                    else (x, y, rng, pred_x0, bufs)
                )
                return carry, {"log": log}

            return body

        @jax.jit
        def seg_fn(params, x, y, rng, ts, ref_ts, nz, *dpm_in):
            seg_len = ts.shape[0]
            if emit_images:
                stride, n_taps = _img_tap_plan(seg_len, x.shape, x.dtype.itemsize)
                bufs = (
                    jnp.zeros((n_taps,) + x.shape, x.dtype),
                    jnp.zeros((n_taps,) + x.shape, x.dtype),
                )
            else:
                stride, bufs = 1, ()
            idx = jnp.arange(seg_len, dtype=jnp.int32)
            if dpm:
                x0p, tps, fis = dpm_in
                init = (x, x0p, y, rng, jnp.zeros_like(x), bufs)
                (x, x0p, y, rng, last_pred, bufs), ys = jax.lax.scan(
                    scan_fn(params, stride), init, (ts, ref_ts, nz, idx, tps, fis)
                )
                ys = dict(ys, x0p=x0p)
            else:
                init = (x, y, rng, jnp.zeros_like(x), bufs)
                (x, y, rng, last_pred, bufs), ys = jax.lax.scan(
                    scan_fn(params, stride), init, (ts, ref_ts, nz, idx)
                )
            if emit_images:
                ys = dict(ys, imgs=bufs)
            return x, y, rng, last_pred, ys

        return seg_fn

    def run_segment(params, x, y, rng, seg: List[StepMeta], seg_start: int, x0p=None):
        meta_key = (len(seg), seg[0].guided, seg[0].cutn, has_noise)
        ts, ref_ts, nz, dpm_per = seg_inputs(seg, seg_start)
        extra = (x0p,) + dpm_per if dpm else ()
        if meta_key not in scan_cache:
            scan_cache[meta_key] = build_seg_fn(seg[0])
        fn = scan_cache[meta_key]
        try:
            return fn(params, x, y, rng, ts, ref_ts, nz, *extra)
        except Exception:
            if not isinstance(fn, jax.stages.Compiled):
                raise
            # an AOT-precompiled executable is pinned to the exact input
            # shardings/layouts it was lowered with; if a later segment's
            # carry comes back with a compiler-chosen resharding (possible
            # on multi-chip meshes), fall back to jit for this signature —
            # it re-specializes transparently like the lazy path always did
            scan_cache[meta_key] = build_seg_fn(seg[0])
            return scan_cache[meta_key](params, x, y, rng, ts, ref_ts, nz, *extra)

    seg_keys = jax.random.split(rng, max(len(segments), 1))

    # Parallel cold-start compilation: the sampler's step plan is fully
    # static, so every distinct segment signature — (length, guided, cutn);
    # e.g. save_frequency=F over one guidance phase yields lengths
    # {1, F, F-1} — is known before the first step runs. jit would compile
    # them SERIALLY as the run first reaches each one; AOT-lower each
    # distinct segment up front and .compile() them concurrently instead.
    # Measured (PERF.md round 3): XLA graph compile is mostly host-CPU
    # work even on the remote-compile axon backend, so the win needs spare
    # host cores — on the 1-core dev box a 256px ddim250 cold A/B came out
    # 481 s serial vs 519 s threaded (within tunnel variance, no win), so
    # the default requires >=4 host cores. CGD_TPU_PRECOMPILE=0 disables;
    # =1 forces (e.g. to cover the path in CPU tests).
    _pc = os.environ.get("CGD_TPU_PRECOMPILE")
    distinct = {}
    for (k, seg), r in zip(segments, seg_keys):
        mk = (len(seg), seg[0].guided, seg[0].cutn, has_noise)
        distinct.setdefault(mk, (seg, k, r))
    precompile = _pc == "1" or (
        _pc != "0"
        and len(distinct) > 1
        and jax.default_backend() != "cpu"
        and (os.cpu_count() or 1) >= 4
    )
    if precompile and len(distinct) > 0:
        from concurrent.futures import ThreadPoolExecutor

        y_ex = y if y is not None else jnp.zeros((shape[0],), jnp.int32)
        lowered = {}
        for mk, (seg, k, r) in distinct.items():
            if mk in scan_cache:
                continue  # warm cross-call cache (seg_cache): already built
            seg_fn = build_seg_fn(seg[0])
            ts, ref_ts, nz, dpm_per = seg_inputs(seg, k)
            extra = (jnp.zeros_like(x),) + dpm_per if dpm else ()
            # tracing/lowering is host-GIL work — serial; .compile() is the
            # remote call that parallelizes
            lowered[mk] = (
                seg_fn, seg_fn.lower(params, x, y_ex, r, ts, ref_ts, nz, *extra)
            )
        with ThreadPoolExecutor(max_workers=min(4, max(len(lowered), 1))) as ex:
            compiled = {
                mk: fut
                for mk, fut in zip(
                    lowered,
                    ex.map(lambda kv: kv[1].compile(), lowered.values()),
                )
            }
        # the AOT executable is directly callable with arrays matching the
        # lowered avals (same shapes/dtypes every segment) — store it in the
        # jit cache slot so run_segment dispatches straight to it
        scan_cache.update(compiled)

    start_seg = 0
    if resume is not None:
        # restore the carried state at a segment boundary; the per-segment
        # keys above only depend on the run seed, so replaying the remaining
        # segments reproduces the uninterrupted run bit-exactly
        start_seg = int(resume["next_seg"])
        if not 0 <= start_seg <= len(segments):
            raise ValueError(
                f"resume next_seg={start_seg} outside this plan's "
                f"{len(segments)} segments — different run configuration?"
            )
        if start_seg == len(segments):
            # the checkpoint was written after the final segment: the run it
            # belongs to already completed, so there is nothing left to
            # replay and the generator will yield no frames. Loud, not
            # silent — an empty output directory looks like a bug otherwise.
            import warnings

            warnings.warn(
                "resume checkpoint marks the run complete (next_seg == "
                f"{len(segments)}); nothing to resume — no frames will be "
                "written. The finished frames are in the original run's "
                "output directory.",
                stacklevel=2,
            )
        x = jnp.asarray(resume["x"], jnp.float32)
        if x_sharding is not None:
            x = jax.device_put(x, x_sharding)
        if resume.get("y") is not None:
            y = jnp.asarray(resume["y"], jnp.int32)

    # DPM-Solver++(2M) multistep state: the previous step's guided x0,
    # chained across segments (zeros before the first step, which runs
    # first-order anyway); checkpointed alongside x so dpm resumes stay
    # bit-exact
    x0p = jnp.zeros(shape, jnp.float32) if dpm else None
    if resume is not None and dpm:
        if resume.get("x0p") is None:
            raise ValueError(
                "resume checkpoint lacks the dpm_solver x0_prev state — "
                "was it written by a non-dpm run?"
            )
        x0p = jnp.asarray(resume["x0p"], jnp.float32)
    if dpm:
        if x_sharding is not None:
            x0p = jax.device_put(x0p, x_sharding)
    elif resume is not None and resume.get("x0p") is not None:
        # symmetric guard (ADVICE r3): a dpm checkpoint resumed into a
        # non-dpm loop would silently continue with different dynamics.
        # The api layer already refuses via run_meta; protect direct
        # sample_loop callers too.
        raise ValueError(
            "resume checkpoint carries dpm_solver x0_prev state but "
            "cfg.dpm_solver is False — resuming would silently change "
            "the sampling dynamics"
        )

    for si, ((k, seg), r) in enumerate(zip(segments, seg_keys)):
        if si < start_seg:
            continue  # already completed by the checkpointed run
        # y must be a concrete array for scan carry; use dummy when uncond
        y_in = y if y is not None else jnp.zeros((shape[0],), jnp.int32)
        x, y_out, _, pred_x0, ys = run_segment(params, x, y_in, r, seg, k, x0p)
        if dpm:
            x0p = ys["x0p"]
        logs = ys.get("log", {})
        if y is not None:
            y = y_out
        if loss_sink is not None and seg[0].guided and logs:
            # one device->host fetch per segment (the whole point: loss
            # observability without per-step host callbacks)
            loss_sink(k, {name: np.asarray(v) for name, v in logs.items()})
        if image_sink is not None and seg[0].guided:
            noisy, preds = ys["imgs"]
            stride, n_taps = _img_tap_plan(len(seg), x.shape, x.dtype.itemsize)
            tap_ks = [k + min((j + 1) * stride, len(seg)) - 1 for j in range(n_taps)]
            image_sink(tap_ks, np.asarray(noisy), np.asarray(preds))
        if state_sink is not None:
            # persist BEFORE yielding: a consumer killed mid-save still
            # resumes from the completed segment
            state_sink(si + 1, {
                "x": np.asarray(x),
                "y": None if y is None else np.asarray(y),
                "x0p": np.asarray(x0p) if dpm else None,
            })
        last_k = k + len(seg) - 1
        if last_k in save_at:
            yield last_k, pred_x0, x
        if progress_cb is not None:
            progress_cb(len(seg))
