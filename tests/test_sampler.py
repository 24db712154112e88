"""Sampler loop tests: step plan gating, save-frequency yield contract,
guided + unguided end-to-end on a tiny UNet (reference contract:
cgd/cgd.py:241-270 and the --reduce-clip/--progressive-cutout schedules,
cgd/cgd.py:157-175)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgd_tpu.diffusion import make_diffusion
from cgd_tpu.diffusion.sampler import (
    GuidanceFns,
    SamplerConfig,
    build_step_plan,
    make_guided_step,
    sample_loop,
)
from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet


def tiny_model(num_classes=None):
    cfg = UNetConfig(
        image_size=16,
        model_channels=32,
        num_res_blocks=1,
        attention_ds=(4,),
        channel_mult=(1, 2),
        num_head_channels=16,
        num_classes=num_classes,
    )
    params = init_unet(jax.random.PRNGKey(0), cfg)

    # tests close over the tiny weights (CPU; constant inlining is harmless
    # at this scale) but accept the sampler's params argument
    def model_fn(p, x, t_model, rng, y):
        return apply_unet(params, cfg, x, t_model, y)

    return model_fn


class TestStepPlan:
    def test_plain(self):
        plan = build_step_plan(10)
        assert [m.t for m in plan] == list(range(9, -1, -1))
        assert all(m.guided and m.cutn == 16 for m in plan)

    def test_skip(self):
        plan = build_step_plan(100, skip_timesteps=20)
        assert plan[0].t == 79 and plan[-1].t == 0 and len(plan) == 80

    def test_reduce_clip_gating(self):
        # Reference: with skip = 0.2T set by reduce_clip, cond_fn sees
        # ref_current starting at T-1; 20-70% band runs every 4th step.
        T = 100
        plan = build_step_plan(T, skip_timesteps=20, reduce_clip=True)
        # consumed index k -> ref_current = T-1-k, progress = (T-ref_current)/T
        for k, m in enumerate(plan):
            ref_current = T - 1 - k
            pct = (T - ref_current) / T
            if pct < 0.7:
                expected = int((pct - 0.2) * T) % 4 == 0
            else:
                expected = True
            assert m.guided == expected, (k, pct)
        # sanity: some steps gated off; steps past 70% reference-progress all
        # guided (with skip=0.2T the reference's progress counter only reaches
        # 0.8 by the last real step — the skip-offset quirk, SURVEY.md §3.1)
        assert any(not m.guided for m in plan)
        assert all(m.guided for m in plan[-10:])

    def test_progressive_cutout(self):
        T = 100
        plan = build_step_plan(T, progressive_cutout=True, num_cutouts=16)
        cutns = [m.cutn for m in plan]
        assert cutns[0] == 4 and cutns[-1] == 16
        assert set(cutns) == {4, 8, 16}
        # phase boundaries at 30%/70% of reference progress
        # pct = (k+1)/T: phase flips at pct 0.3 (k=29) and 0.7 (k=69)
        assert cutns[28] == 4 and cutns[29] == 8 and cutns[68] == 8 and cutns[69] == 16

    def test_progressive_cutout_floors(self):
        plan = build_step_plan(10, progressive_cutout=True, num_cutouts=8)
        assert min(m.cutn for m in plan) == 4  # max(4, 8//4)


class TestSampleLoop:
    def test_unguided_ddim_yields(self):
        model_fn = tiny_model()
        d = make_diffusion(steps=1000, timestep_respacing="ddim10")
        cfg = SamplerConfig(use_ddim=True)
        outs = list(
            sample_loop(
                d, model_fn, lambda meta: None, {}, (1, 16, 16, 3),
                jax.random.PRNGKey(0), cfg, save_frequency=4,
            )
        )
        ks = [o[0] for o in outs]
        assert ks == [0, 4, 8, 9]  # every 4th + final
        for _, x0, _xt in outs:
            assert x0.shape == (1, 16, 16, 3)
            assert bool(jnp.isfinite(x0).all())

    @pytest.mark.slow
    def test_guided_p_sample_with_class_randomization(self):
        model_fn = tiny_model(num_classes=10)
        d = make_diffusion(steps=1000, timestep_respacing="20")
        cfg = SamplerConfig(use_ddim=False, randomize_class=True, num_classes=10)

        def builder(meta):
            def loss_fn(p, rng, x, out, ref_t):
                # pull pred_xstart toward zero; grads flow through the UNet
                return 0.01 * jnp.sum(out.pred_xstart**2) + 0.001 * jnp.sum(x**2)

            return GuidanceFns(loss_fn, lambda g: g)

        outs = list(
            sample_loop(
                d, model_fn, builder, {}, (2, 16, 16, 3), jax.random.PRNGKey(1), cfg,
                save_frequency=10, y_init=jnp.zeros((2,), jnp.int32),
            )
        )
        assert [o[0] for o in outs] == [0, 10, 19]
        assert all(bool(jnp.isfinite(o[1]).all()) for o in outs)

    def test_skip_with_init_image(self):
        model_fn = tiny_model()
        d = make_diffusion(steps=1000, timestep_respacing="20")
        cfg = SamplerConfig(use_ddim=True)
        init = jnp.full((1, 16, 16, 3), 0.5)
        outs = list(
            sample_loop(
                d, model_fn, lambda m: None, {}, (1, 16, 16, 3), jax.random.PRNGKey(2),
                cfg, skip_timesteps=10, init_image=init, save_frequency=100,
            )
        )
        # 10 steps run; only k=0 and final k=9 saved
        assert [o[0] for o in outs] == [0, 9]

    def test_final_frame_parity_with_skip(self):
        """Reference quirk (cgd/cgd.py:268): with skip>0 the final frame is
        only saved when it lands on a save_frequency multiple."""
        model_fn = tiny_model()
        d = make_diffusion(steps=1000, timestep_respacing="20")
        cfg = SamplerConfig(use_ddim=True)
        kw = dict(save_frequency=100, skip_timesteps=10,
                  init_image=jnp.full((1, 16, 16, 3), 0.5))
        outs = list(sample_loop(
            d, model_fn, lambda m: None, {}, (1, 16, 16, 3),
            jax.random.PRNGKey(2), cfg, final_frame_parity=True, **kw,
        ))
        assert [o[0] for o in outs] == [0]  # k=9 dropped, as the reference does
        # with skip == 0 the parity flag changes nothing (condition fires)
        outs = list(sample_loop(
            d, model_fn, lambda m: None, {}, (1, 16, 16, 3),
            jax.random.PRNGKey(2), cfg, save_frequency=100, final_frame_parity=True,
        ))
        assert [o[0] for o in outs] == [0, 19]

    def test_deterministic_given_key(self):
        model_fn = tiny_model()
        d = make_diffusion(steps=1000, timestep_respacing="ddim10")
        cfg = SamplerConfig(use_ddim=True)
        r1 = list(sample_loop(d, model_fn, lambda m: None, {}, (1, 16, 16, 3), jax.random.PRNGKey(7), cfg, save_frequency=100))
        r2 = list(sample_loop(d, model_fn, lambda m: None, {}, (1, 16, 16, 3), jax.random.PRNGKey(7), cfg, save_frequency=100))
        np.testing.assert_allclose(np.asarray(r1[-1][1]), np.asarray(r2[-1][1]))

    def test_parallel_precompile_matches_serial(self, monkeypatch):
        """CGD_TPU_PRECOMPILE=1 AOT-compiles every distinct segment
        signature concurrently up front (cold-start parallelism on remote
        compile backends); the AOT executables must produce bit-identical
        trajectories to the lazily jit-compiled path. The config below
        (ddim12, save_frequency=4, reduce_clip for a guided/unguided mix)
        yields several distinct (length, guided) signatures."""
        model_fn = tiny_model()
        d = make_diffusion(steps=1000, timestep_respacing="ddim12")
        cfg = SamplerConfig(use_ddim=True)

        def builder(meta):
            def loss_fn(p, rng, x, out, ref_t):
                return 0.01 * jnp.sum(out.pred_xstart**2) + 0.001 * jnp.sum(x**2)

            return GuidanceFns(loss_fn, lambda g: g)

        kw = dict(save_frequency=4, reduce_clip=True)
        args = (d, model_fn, builder, {}, (1, 16, 16, 3))

        monkeypatch.setenv("CGD_TPU_PRECOMPILE", "0")
        serial = list(sample_loop(*args, jax.random.PRNGKey(3), cfg, **kw))
        monkeypatch.setenv("CGD_TPU_PRECOMPILE", "1")
        pre = list(sample_loop(*args, jax.random.PRNGKey(3), cfg, **kw))

        assert [o[0] for o in serial] == [o[0] for o in pre]
        for (_, a, ax), (_, b, bx) in zip(serial, pre):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(ax), np.asarray(bx))


class TestFastGuidance:
    """fast_guidance=True detaches the p_mean_variance output inside the
    guidance loss (classic pre-fork CLIP guidance; NOT the reference's
    cond_fn_with_grad). The model backward must contribute nothing: a loss
    built ONLY from out.pred_xstart yields zero gradient, while the x-path
    still guides."""

    def _step(self, loss_fn, fast):
        model_fn = tiny_model()
        d = make_diffusion(steps=1000, timestep_respacing="10")
        cfg = SamplerConfig(use_ddim=True, fast_guidance=fast)
        grads_seen = {}

        def grad_transform(g):
            grads_seen["g"] = g
            return g

        step = make_guided_step(d, model_fn, GuidanceFns(loss_fn, grad_transform), cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
        x1, px, _ = step({}, x, jnp.int32(5), jnp.int32(5), None, jax.random.PRNGKey(1))
        return np.asarray(grads_seen["g"]), np.asarray(x1)

    def test_model_path_gradient_is_cut(self):
        loss = lambda p, rng, x, out, ref_t: jnp.sum(out.pred_xstart**2)
        g_fast, _ = self._step(loss, fast=True)
        g_full, _ = self._step(loss, fast=False)
        assert np.abs(g_fast).max() == 0.0  # detached: no gradient at all
        assert np.abs(g_full).max() > 0.0   # parity mode backprops the UNet

    def test_x_path_still_guides(self):
        # blend-style loss: fac*pred_xstart + (1-fac)*x — x-path survives
        loss = lambda p, rng, x, out, ref_t: jnp.sum(
            (0.5 * out.pred_xstart + 0.5 * x) ** 2
        )
        g_fast, x1 = self._step(loss, fast=True)
        assert np.abs(g_fast).max() > 0.0
        assert np.isfinite(x1).all()


class TestCheckpointResume:
    """Mid-run sampling-state checkpointing (state_sink) + bit-exact resume:
    per-segment RNG keys derive only from the run seed, so restoring the
    carried x at a segment boundary replays the remaining segments exactly."""

    def _run(self, state_sink=None, resume=None, stop_after=None):
        d = make_diffusion(steps=100, timestep_respacing="10")

        def model_fn(params, x, t_model, rng, y):
            return jnp.concatenate([jnp.tanh(x), jnp.zeros_like(x)], -1)

        def builder(meta):
            def loss_fn(p, rng, x, out, ref_t):
                return 1e-3 * jnp.sum(out.pred_xstart**2)

            return GuidanceFns(loss_fn, lambda g: g)

        outs = []
        gen = sample_loop(
            d, model_fn, builder, {}, (1, 16, 16, 3), jax.random.PRNGKey(7),
            SamplerConfig(use_ddim=False),  # p-sample: per-step noise exercises
            save_frequency=3,               # the RNG-stream alignment claim
            state_sink=state_sink, resume=resume,
        )
        for i, item in enumerate(gen):
            outs.append(item)
            if stop_after is not None and i + 1 >= stop_after:
                gen.close()
                break
        return outs

    def test_resume_is_bit_exact(self):
        full = self._run()
        assert len(full) == 4  # save points 2,5,8,9 -> 4 segments

        snaps = {}
        interrupted = self._run(
            state_sink=lambda n, st: snaps.__setitem__(n, st), stop_after=2
        )
        assert len(interrupted) == 2 and snaps
        n0 = max(snaps)  # latest completed segment boundary

        resumed = self._run(resume={"next_seg": n0, **snaps[n0]})
        assert len(resumed) == len(full) - n0
        for (k1, p1, x1), (k2, p2, x2) in zip(full[-len(resumed):], resumed):
            assert k1 == k2
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
            np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))

    def test_resume_rejects_out_of_range_segment(self):
        with pytest.raises(ValueError, match="outside this plan"):
            self._run(resume={"next_seg": 99, "x": np.zeros((1, 16, 16, 3)), "y": None})

    def test_resume_rejects_dpm_state_in_non_dpm_loop(self):
        """Symmetric guard (ADVICE r3): a dpm checkpoint's x0_prev must not
        silently resume under non-dpm dynamics in direct sample_loop calls."""
        with pytest.raises(ValueError, match="dpm_solver is False"):
            self._run(resume={
                "next_seg": 1, "x": np.zeros((1, 16, 16, 3)), "y": None,
                "x0p": np.zeros((1, 16, 16, 3)),
            })
