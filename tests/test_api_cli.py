"""End-to-end API/CLI tests with tiny debug models (CGD_TPU_DEBUG_TINY):
generator yield contract, output tree, CLI flag surface
(reference contracts: cgd/cgd.py:266-270, cgd/script_util.py:93-101)."""

import os
import sys

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def tiny_env(monkeypatch, tmp_path):
    monkeypatch.setenv("CGD_TPU_DEBUG_TINY", "1")
    monkeypatch.chdir(tmp_path)


class TestAPI:
    @pytest.mark.slow
    def test_generator_contract(self, tmp_path):
        from cgd_tpu.api import clip_guided_diffusion

        gen = clip_guided_diffusion(
            prompts=["a b c"],
            image_size=64,
            timestep_respacing="ddim10",
            num_cutouts=2,
            save_frequency=4,
            batch_size=2,
            weights_mode="random",
            prefix_path=tmp_path / "out",
            progress=False,
            seed=3,
        )
        results = list(gen)
        # saves at consumed steps 0,4,8,9 x 2 batch entries
        assert len(results) == 8
        batch_idxs = [b for b, _ in results]
        assert batch_idxs == [0, 1, 0, 1, 0, 1, 0, 1]
        for b, path in results:
            assert os.path.exists(path)
            assert f"{os.sep}{b:02}{os.sep}" in path
        # path contract: <prefix>/a_b_c/<batch:02>/<step:04>.png
        assert results[0][1].endswith(os.path.join("a_b_c", "00", "0000.png"))
        assert results[-1][1].endswith(os.path.join("a_b_c", "01", "0009.png"))
        assert os.path.exists("current.png")

    def test_weight_sum_zero_raises(self, tmp_path):
        from cgd_tpu.api import clip_guided_diffusion

        gen = clip_guided_diffusion(
            prompts=["a:1.0", "b:-1.0"],
            image_size=64,
            timestep_respacing="ddim10",
            weights_mode="random",
            prefix_path=tmp_path / "out",
            progress=False,
        )
        with pytest.raises(RuntimeError, match="must not sum to 0"):
            next(gen)

    @pytest.mark.slow
    def test_init_image_and_skip(self, tmp_path):
        from PIL import Image

        from cgd_tpu.api import clip_guided_diffusion

        init = tmp_path / "init.png"
        Image.fromarray(np.full((32, 32, 3), 128, np.uint8)).save(init)
        gen = clip_guided_diffusion(
            prompts=["x"],
            image_size=64,
            timestep_respacing="ddim10",
            skip_timesteps=5,
            init_image=str(init),
            init_scale=100,
            num_cutouts=2,
            save_frequency=100,
            weights_mode="random",
            prefix_path=tmp_path / "out",
            progress=False,
        )
        results = list(gen)
        # strict parity (default): the reference's final-frame condition
        # (current_timestep == -1, cgd/cgd.py:268) never fires when skip>0,
        # so only step 0 is saved with save_frequency=100
        assert len(results) == 1

    @pytest.mark.slow
    def test_init_image_and_skip_no_parity_saves_final(self, tmp_path):
        from PIL import Image

        from cgd_tpu.api import clip_guided_diffusion

        init = tmp_path / "init.png"
        Image.fromarray(np.full((32, 32, 3), 128, np.uint8)).save(init)
        gen = clip_guided_diffusion(
            prompts=["x"],
            image_size=64,
            timestep_respacing="ddim10",
            skip_timesteps=5,
            init_image=str(init),
            num_cutouts=2,
            save_frequency=100,
            weights_mode="random",
            prefix_path=tmp_path / "out",
            progress=False,
            strict_parity=False,
        )
        results = list(gen)
        assert len(results) == 2  # step 0 + final step 4 (the fix)

    @pytest.mark.slow
    def test_init_image_with_offsets(self, tmp_path):
        """Reference latent bug (cgd/cgd.py:118 vs :252): square init resize
        + offset sample shape. strict_parity raises a clear error; the
        non-parity mode resizes the init to the offset shape and runs."""
        from PIL import Image

        from cgd_tpu.api import clip_guided_diffusion

        init = tmp_path / "init.png"
        Image.fromarray(np.full((32, 48, 3), 100, np.uint8)).save(init)
        common = dict(
            prompts=["x"], image_size=64, timestep_respacing="ddim10",
            skip_timesteps=5, init_image=str(init), num_cutouts=2,
            save_frequency=100, weights_mode="random",
            prefix_path=tmp_path / "out", progress=False, height_offset=16,
        )
        with pytest.raises(ValueError, match="strict_parity"):
            list(clip_guided_diffusion(**common))
        results = list(clip_guided_diffusion(**common, strict_parity=False))
        assert len(results) >= 1
        from PIL import Image as I

        w, h = I.open(results[0][1]).size
        assert (w, h) == (64, 80)


    @pytest.mark.slow
    def test_wandb_triptych_logs_every_guided_step(self, tmp_path, monkeypatch):
        """The wandb triptych must log once per GUIDED STEP (reference
        cadence, cgd/cgd.py:180-186), not once per save point — driven
        through the public API with a stubbed wandb module."""
        import sys
        import types

        logged = []

        class FakeRun:
            def log(self, d, **kw):
                logged.append(d)

            def finish(self):
                pass

        class FakeImage:
            def __init__(self, img, caption=""):
                self.caption = caption

        fake = types.ModuleType("wandb")
        fake.init = lambda **kw: FakeRun()
        fake.Image = FakeImage
        monkeypatch.setitem(sys.modules, "wandb", fake)

        from cgd_tpu.api import clip_guided_diffusion

        list(clip_guided_diffusion(
            prompts=["w"],
            image_size=64,
            timestep_respacing="ddim10",
            num_cutouts=2,
            save_frequency=4,
            weights_mode="random",
            prefix_path=tmp_path / "out",
            progress=False,
            wandb_project="fake-proj",
            seed=1,
        ))
        trip = [d for d in logged if any("Generations" in k for k in d)]
        assert len(trip) == 10  # one triptych per guided step, ddim10
        steps = [d["step"] for d in trip]
        assert steps == sorted(steps) and steps[0] == 0 and steps[-1] == 9
        imgs = next(v for k, v in trip[0].items() if "Generations" in k)
        assert [im.caption for im in imgs] == [
            "Noisy Sample", "Denoised Prediction", "Blended (what CLIP sees)",
        ]


class TestCLI:
    @pytest.mark.slow
    def test_full_flag_surface_smoke(self, tmp_path):
        from cgd_tpu.cli import main

        main([
            "-txts", "tiny smoke|style:0.2",
            "-size", "64", "-respace", "ddim10", "-cutn", "2",
            "-freq", "5", "--weights-mode", "random", "-dir", str(tmp_path / "o"),
            "-q", "-cutpow", "0.8", "-seed", "7", "-mag", "-sats", "10",
            "-cached_cutn", "-cutn_skip",
        ])
        pngs = []
        for root, _, files in os.walk(tmp_path / "o"):
            pngs += [f for f in files if f.endswith(".png")]
        assert sorted(pngs) == ["0000.png", "0005.png", "0009.png"]

    def test_dpm_solver_flag_e2e(self, tmp_path):
        # --dpm-solver rides the whole CLI path: multistep x0_prev carry
        # through segment chaining, save cadence, frame writing
        from cgd_tpu.cli import main

        main([
            "-txts", "tiny smoke", "-size", "64", "-respace", "ddim10",
            "-cutn", "2", "-freq", "5", "--weights-mode", "random",
            "-dir", str(tmp_path / "o"), "-q", "-seed", "3", "--dpm-solver",
        ])
        pngs = []
        for root, _, files in os.walk(tmp_path / "o"):
            pngs += [f for f in files if f.endswith(".png")]
        assert sorted(pngs) == ["0000.png", "0005.png", "0009.png"]

    @pytest.mark.slow
    def test_reduce_clip_flag(self, tmp_path):
        from cgd_tpu.cli import main

        main([
            "-txts", "r", "-size", "64", "-respace", "ddim25", "-cutn", "2",
            "-freq", "100", "--weights-mode", "random", "-dir", str(tmp_path / "o"),
            "-q", "-reduce",
        ])
        pngs = []
        for root, _, files in os.walk(tmp_path / "o"):
            pngs += [f for f in files if f.endswith(".png")]
        # reduce-clip skips 20% of 25 steps -> 20 steps run. Strict parity
        # (default): the reference's final-frame condition never fires with
        # skip>0, so only step 0 is saved at save_frequency=100.
        assert sorted(pngs) == ["0000.png"]

    @pytest.mark.slow
    def test_reduce_clip_no_parity_saves_final(self, tmp_path):
        from cgd_tpu.cli import main

        main([
            "-txts", "r", "-size", "64", "-respace", "ddim25", "-cutn", "2",
            "-freq", "100", "--weights-mode", "random", "-dir", str(tmp_path / "o"),
            "-q", "-reduce", "--no-strict-parity",
        ])
        pngs = []
        for root, _, files in os.walk(tmp_path / "o"):
            pngs += [f for f in files if f.endswith(".png")]
        assert sorted(pngs) == ["0000.png", "0019.png"]

    def test_parser_covers_reference_flags(self):
        from cgd_tpu.cli import build_parser

        p = build_parser()
        opts = {o for a in p._actions for o in a.option_strings}
        # every reference flag (cgd/cgd.py:290-357) must exist
        for flag in [
            "--prompts", "-txts", "--image_prompts", "-imgs", "--image_size", "-size",
            "--init_image", "-init", "--init_scale", "-is", "--skip_timesteps", "-skip",
            "--prefix", "-dir", "--checkpoints_dir", "-ckpts", "--batch_size", "-bs",
            "--clip_guidance_scale", "-cgs", "--tv_scale", "-tvs", "--range_scale", "-rs",
            "--sat_scale", "-sats", "--seed", "-seed", "--save_frequency", "-freq",
            "--diffusion_steps", "-steps", "--timestep_respacing", "-respace",
            "--num_cutouts", "-cutn", "--cutout_power", "-cutpow", "--clip_model", "-clip",
            "--uncond", "-uncond", "--noise_schedule", "-sched", "--dropout", "-drop",
            "--device", "-dev", "--wandb_project", "-proj", "--wandb_entity", "-ent",
            "--height_offset", "-ht", "--width_offset", "-wd", "--use_augs", "-augs",
            "--use_magnitude", "-mag", "--quiet", "-q", "--save-as-gif", "-gif",
            "--save-as-video", "-mp4", "--reduce-clip", "-reduce",
            "--progressive-cutout", "-cutn_skip", "--cached-cutouts", "-cached_cutn",
        ]:
            assert flag in opts, flag


class TestImagePrompts:
    @pytest.mark.slow
    def test_image_prompt_e2e(self, tmp_path):
        import numpy as np
        from PIL import Image

        from cgd_tpu.api import clip_guided_diffusion

        imgp = tmp_path / "prompt.png"
        Image.fromarray(
            (np.random.RandomState(0).rand(48, 40, 3) * 255).astype(np.uint8)
        ).save(imgp)
        gen = clip_guided_diffusion(
            prompts=["txt"],
            image_prompts=[f"{imgp}:0.5"],
            image_size=64,
            timestep_respacing="ddim10",
            num_cutouts=2,
            save_frequency=100,
            weights_mode="random",
            prefix_path=tmp_path / "out",
            progress=False,
        )
        results = list(gen)
        assert len(results) == 2

    def test_image_prompt_normalization_modes(self, tmp_path):
        """strict_parity replicates the reference's F.normalize (channel-L2)
        on image-prompt cutouts (cgd/clip_util.py:100); the fix uses CLIP
        mean/std. The two must produce different embeddings."""
        import jax

        from cgd_tpu.api import _encode_image_prompt
        from cgd_tpu.models.clip import init_clip
        from cgd_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionViTConfig
        from PIL import Image

        cfg = CLIPConfig(
            name="tiny", embed_dim=32,
            vision=VisionViTConfig(32, 8, 32, 2, 2),
            text=TextConfig(width=32, heads=2, layers=2),
        )
        params = init_clip(jax.random.PRNGKey(0), cfg)
        imgp = tmp_path / "p.png"
        Image.fromarray(
            (np.random.RandomState(1).rand(40, 40, 3) * 255).astype(np.uint8)
        ).save(imgp)
        rng = jax.random.PRNGKey(2)
        emb_parity, w1 = _encode_image_prompt(
            params, cfg, str(imgp), 0.5, 64, 4, rng, strict_parity=True
        )
        emb_fixed, w2 = _encode_image_prompt(
            params, cfg, str(imgp), 0.5, 64, 4, rng, strict_parity=False
        )
        assert w1 == w2 == [0.125] * 4
        assert np.isfinite(emb_parity).all() and np.isfinite(emb_fixed).all()
        assert np.abs(emb_parity - emb_fixed).max() > 1e-4


class TestLossObservability:
    @pytest.mark.slow
    def test_segment_boundary_loss_sink(self, tmp_path, monkeypatch, capsys):
        """--log-losses on callback-less backends (axon) pulls loss scalars
        as scan outputs at segment boundaries instead of disabling."""
        import cgd_tpu.api as api

        monkeypatch.setattr(api, "_host_callbacks_supported", lambda: False)
        gen = api.clip_guided_diffusion(
            prompts=["obs"],
            image_size=64,
            timestep_respacing="ddim10",
            num_cutouts=2,
            save_frequency=5,
            weights_mode="random",
            prefix_path=tmp_path / "out",
            progress=False,
            log_losses=True,
        )
        results = list(gen)
        assert len(results) == 3  # steps 0, 5, 9
        outp = capsys.readouterr().out
        # one loss line per guided step, with the reference's loss names
        lines = [l for l in outp.splitlines() if l.startswith("step ")]
        assert len(lines) == 10
        assert "Total Loss" in lines[0] and "CLIP Loss" in lines[0]
        assert "TV Loss" in lines[0] and "Range Loss" in lines[0]

    def test_sampler_loss_sink_direct(self):
        """sample_loop's loss_sink receives per-step stacked scalars."""
        import jax
        import jax.numpy as jnp

        from cgd_tpu.diffusion import make_diffusion
        from cgd_tpu.diffusion.sampler import (
            GuidanceFns,
            SamplerConfig,
            sample_loop,
        )

        d = make_diffusion(steps=100, timestep_respacing="10")

        def model_fn(params, x, t_model, rng, y):
            return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

        def builder(meta):
            def loss_fn(p, rng, x, out, ref_t):
                # small scale: an unbounded toy loss diverges the trajectory
                loss = 1e-6 * jnp.sum(out.pred_xstart**2)
                return loss, {"Total Loss": loss}

            return GuidanceFns(loss_fn, lambda g: g)

        seen = []
        outs = list(sample_loop(
            d, model_fn, builder, {}, (1, 16, 16, 3), jax.random.PRNGKey(0),
            SamplerConfig(use_ddim=True), save_frequency=4,
            loss_sink=lambda k, logs: seen.append((k, logs)),
        ))
        assert [o[0] for o in outs] == [0, 4, 8, 9]
        ks = [k for k, _ in seen]
        steps_logged = sum(len(l["Total Loss"]) for _, l in seen)
        assert steps_logged == 10 and ks[0] == 0
        assert all(np.isfinite(l["Total Loss"]).all() for _, l in seen)


    def test_sampler_image_sink_per_guided_step(self):
        """image_sink receives EVERY guided step's (x_t, pred_xstart) —
        the reference's wandb triptych cadence (cgd/cgd.py:180-186),
        delivered as stacked scan outputs fetched once per segment."""
        import jax
        import jax.numpy as jnp

        from cgd_tpu.diffusion import make_diffusion
        from cgd_tpu.diffusion.sampler import (
            GuidanceFns,
            SamplerConfig,
            sample_loop,
        )

        d = make_diffusion(steps=100, timestep_respacing="10")

        def model_fn(params, x, t_model, rng, y):
            return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

        def builder(meta):
            def loss_fn(p, rng, x, out, ref_t):
                loss = 1e-6 * jnp.sum(out.pred_xstart**2)
                return loss, {"Total Loss": loss}

            return GuidanceFns(loss_fn, lambda g: g)

        taps = []
        list(sample_loop(
            d, model_fn, builder, {}, (1, 16, 16, 3), jax.random.PRNGKey(0),
            SamplerConfig(use_ddim=True), save_frequency=4,
            image_sink=lambda ks, noisy, preds: taps.append((ks, noisy, preds)),
        ))
        # every one of the 10 guided steps tapped exactly once, in order
        steps = [int(s) for ks, _, _ in taps for s in ks]
        assert steps == list(range(10))
        for ks, noisy, preds in taps:
            assert noisy.shape[0] == len(ks)
            assert noisy.shape[1:] == (1, 16, 16, 3)
            assert preds.shape == noisy.shape
            assert np.isfinite(noisy).all() and np.isfinite(preds).all()

    def test_sampler_image_sink_decimates_over_budget(self, monkeypatch):
        """A segment whose stacked taps would exceed CGD_TPU_IMG_TAP_MB is
        decimated to the last step of each stride window instead of
        allocating the full [seg_len, *shape] pair in HBM (the
        final-frame-only 512px failure mode)."""
        import jax
        import jax.numpy as jnp

        from cgd_tpu.diffusion import make_diffusion
        from cgd_tpu.diffusion.sampler import (
            GuidanceFns,
            SamplerConfig,
            _img_tap_plan,
            sample_loop,
        )

        # the real failure shape: 250-step segment at 512px f32 (~1.5 GB
        # if stacked fully) must decimate under the default 128 MiB budget
        stride, n_taps = _img_tap_plan(250, (1, 512, 512, 3), 4)
        assert stride > 1 and n_taps == -(-250 // stride)
        assert 2 * n_taps * 512 * 512 * 3 * 4 <= 192 << 20  # fits the budget
        # default cadence stays per-step
        monkeypatch.delenv("CGD_TPU_IMG_TAP_MB", raising=False)
        assert _img_tap_plan(25, (1, 512, 512, 3), 4) == (1, 25)
        assert _img_tap_plan(25, (1, 256, 256, 3), 4) == (1, 25)

        d = make_diffusion(steps=100, timestep_respacing="10")

        def model_fn(params, x, t_model, rng, y):
            return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

        def builder(meta):
            def loss_fn(p, rng, x, out, ref_t):
                loss = 1e-6 * jnp.sum(out.pred_xstart**2)
                return loss, {"Total Loss": loss}

            return GuidanceFns(loss_fn, lambda g: g)

        monkeypatch.setenv("CGD_TPU_IMG_TAP_MB", "0")  # minimum budget
        taps = []
        list(sample_loop(
            d, model_fn, builder, {}, (1, 16, 16, 3), jax.random.PRNGKey(0),
            SamplerConfig(use_ddim=True), save_frequency=10**9,
            image_sink=lambda ks, noisy, preds: taps.append((ks, noisy, preds)),
        ))
        # one 10-step guided segment, budget floored at one step's bytes ->
        # stride 10: a single tap, the segment's LAST step
        all_ks = [int(s) for ks, _, _ in taps for s in ks]
        assert all_ks and all_ks[-1] == 9 and len(all_ks) < 10
        for ks, noisy, preds in taps:
            assert noisy.shape[0] == len(ks) and preds.shape == noisy.shape
            assert np.isfinite(noisy).all()


class TestTextEncoderReuse:
    def test_one_trace_for_n_prompts_and_repeat_calls(self):
        """Text prompts encode as ONE batched compiled call, and the jitted
        tower is reused across calls — round 2 re-wrapped jax.jit per
        prompt, paying a fresh trace/compile each time (VERDICT r2)."""
        import jax

        import cgd_tpu.api as api
        from cgd_tpu.models.clip import init_clip
        from cgd_tpu.models.clip.configs import (
            CLIPConfig,
            TextConfig,
            VisionViTConfig,
        )

        cfg = CLIPConfig(
            name="trace-test", embed_dim=32,
            vision=VisionViTConfig(32, 8, 32, 1, 1),
            text=TextConfig(vocab_size=512, width=32, heads=1, layers=1),
        )
        params = init_clip(jax.random.PRNGKey(0), cfg)
        tok = api._FallbackTokenizer(cfg.text.vocab_size)
        before = api._text_encoder_traces()
        e1 = api._encode_text_prompts(params, cfg, ["a x", "b y", "c z"], tok)
        assert e1.shape == (3, 32)
        e2 = api._encode_text_prompts(params, cfg, ["d", "e q", "f"], tok)
        assert e2.shape == (3, 32)
        assert api._text_encoder_traces() == before + 1


class TestSegmentExecutableReuse:
    def test_second_run_same_config_rebuilds_no_segments(self, tmp_path):
        """Cross-generation segment-executable reuse (r5): a repeat-config
        generation — new PROMPT, same everything else — must reuse the
        previous run's jitted segment functions (zero make_guided_step
        rebuilds: tracing/lowering the big scan graphs is the dominant
        per-request host cost in serve.py), and the new prompt's targets
        must still flow through the cached executable via the params pytree
        (same seed + different prompt => different final image)."""
        import jax
        from PIL import Image

        import cgd_tpu.api as api
        import cgd_tpu.diffusion.sampler as sampler

        api._SEG_CACHES.clear()
        calls = []
        orig = sampler.make_guided_step

        def counting(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        sampler.make_guided_step = counting
        try:
            def run(prompt, sub):
                return [
                    path for _b, path in api.clip_guided_diffusion(
                        prompts=[prompt], image_size=64,
                        timestep_respacing="ddim8", num_cutouts=2,
                        save_frequency=4, weights_mode="random",
                        prefix_path=tmp_path / sub, progress=False, seed=11,
                    )
                ]

            first = run("alpha glyph", "r1")
            n1 = len(calls)
            assert n1 > 0
            second = run("omega shard", "r2")
            assert len(calls) == n1, "repeat-config run rebuilt segment fns"
            assert len(api._SEG_CACHES) == 1  # one config -> one cache entry
            a = np.asarray(Image.open(first[-1]), np.float32)
            b = np.asarray(Image.open(second[-1]), np.float32)
            assert np.abs(a - b).max() > 0, (
                "new prompt produced the old prompt's image — targets are "
                "baked into the cached executable instead of riding params"
            )
        finally:
            sampler.make_guided_step = orig


class TestMeshConvRoute:
    def test_kill_switches_and_axon_default(self, monkeypatch):
        """Mesh runs default to the SPMD-wrapped Pallas convs, but the
        explicit env kill-switches must still win (they were silently
        bypassed before this test existed), and the axon remote-compile
        backend keeps XLA convs unless the user forces the kernel on."""
        import types

        from cgd_tpu.api import _mesh_conv_route

        def fake_mesh(platform_version):
            dev = types.SimpleNamespace(
                client=types.SimpleNamespace(platform_version=platform_version)
            )
            return types.SimpleNamespace(devices=np.array([dev], dtype=object))

        for k in ("CGD_TPU_PALLAS_CONV", "CGD_TPU_PALLAS_CONV_SPMD"):
            monkeypatch.delenv(k, raising=False)
        assert _mesh_conv_route(fake_mesh("cpu v1")) == "spmd"  # default
        # axon cannot call back into client-side partition callbacks
        assert _mesh_conv_route(fake_mesh("axon 1.0")) == ""
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")  # explicit force
        assert _mesh_conv_route(fake_mesh("axon 1.0")) == "spmd"
        # explicit kill-switches beat the mesh default
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "0")
        assert _mesh_conv_route(fake_mesh("cpu v1")) == ""
        monkeypatch.delenv("CGD_TPU_PALLAS_CONV")
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV_SPMD", "0")
        assert _mesh_conv_route(fake_mesh("cpu v1")) == ""


class TestCheckpointResumeAPI:
    @pytest.mark.slow
    def test_checkpoint_resume_bit_exact_final_frame(self, tmp_path):
        """--checkpoint / --resume: interrupt after the first save point,
        resume from the state file, and the final frame is bit-identical to
        the uninterrupted run (per-segment keys derive from the seed)."""
        from PIL import Image

        from cgd_tpu.api import clip_guided_diffusion

        common = dict(
            prompts=["resume test"], image_size=64, timestep_respacing="ddim10",
            num_cutouts=2, save_frequency=4, weights_mode="random",
            progress=False, seed=11,
        )
        full = list(clip_guided_diffusion(**common, prefix_path=tmp_path / "full"))

        ck = str(tmp_path / "state.npz")
        gen = clip_guided_diffusion(
            **common, prefix_path=tmp_path / "part", checkpoint_path=ck
        )
        next(gen)
        gen.close()  # interrupted run
        assert os.path.exists(ck) and not os.path.exists(ck + ".tmp")

        resumed = list(clip_guided_diffusion(
            **common, prefix_path=tmp_path / "res", resume_from=ck
        ))
        assert resumed  # only the remaining save points are re-emitted
        assert len(resumed) < len(full)
        a = np.asarray(Image.open(full[-1][1]))
        b = np.asarray(Image.open(resumed[-1][1]))
        np.testing.assert_array_equal(a, b)

    def test_resume_rejects_mismatched_config(self, tmp_path):
        """The meta guard refuses a checkpoint from a different run
        configuration instead of silently producing a different image."""
        from cgd_tpu.api import clip_guided_diffusion

        ck = tmp_path / "bad.npz"
        np.savez(ck, next_seg=1, x=np.zeros((1, 64, 64, 3), np.float32),
                 meta="{}")
        gen = clip_guided_diffusion(
            prompts=["x"], image_size=64, timestep_respacing="ddim10",
            num_cutouts=2, weights_mode="random", progress=False,
            prefix_path=tmp_path / "o", resume_from=str(ck),
        )
        with pytest.raises(ValueError, match="different run configuration"):
            next(gen)

    @pytest.mark.slow
    def test_resume_accepts_pre_r4_meta_without_unet_remat(self, tmp_path):
        """Checkpoints written before the remat decision joined run_meta lack
        the "unet_remat" key; for <512px graphs (old rule: remat only at
        >=512px) they are still bit-compatible and must resume rather than
        be refused (r4 advisor, low)."""
        import json

        from cgd_tpu.api import clip_guided_diffusion

        common = dict(
            prompts=["legacy resume"], image_size=64,
            timestep_respacing="ddim6", num_cutouts=2, save_frequency=3,
            weights_mode="random", progress=False, seed=7,
        )
        ck = str(tmp_path / "state.npz")
        gen = clip_guided_diffusion(
            **common, prefix_path=tmp_path / "part", checkpoint_path=ck
        )
        next(gen)
        gen.close()

        rec = dict(np.load(ck).items())
        meta = json.loads(str(rec["meta"]))
        assert meta.pop("unet_remat") is False  # 64px: no remat either rule
        rec["meta"] = json.dumps(meta, sort_keys=True)
        np.savez(ck, **rec)

        resumed = list(clip_guided_diffusion(
            **common, prefix_path=tmp_path / "res", resume_from=ck
        ))
        assert resumed  # legacy checkpoint accepted and run completed


class TestResumeAdoptsRecordedRemat:
    @pytest.mark.slow
    def test_resume_replays_checkpoints_remat_decision(self, tmp_path, monkeypatch):
        """A checkpoint written under CGD_TPU_REMAT=1 must resume in a
        process where the env is unset and the auto gate says no-remat: the
        resume adopts the RECORDED decision (replaying the same graph)
        instead of refusing with 'different run configuration'. This is what
        keeps checkpoints resumable across gate-policy changes (r4 -> r5
        opened the 512px no-remat envelope)."""
        from cgd_tpu.api import clip_guided_diffusion

        common = dict(
            prompts=["remat adopt"], image_size=64,
            timestep_respacing="ddim6", num_cutouts=2, save_frequency=3,
            weights_mode="random", progress=False, seed=9,
        )
        ck = str(tmp_path / "state.npz")
        monkeypatch.setenv("CGD_TPU_REMAT", "1")
        gen = clip_guided_diffusion(
            **common, prefix_path=tmp_path / "part", checkpoint_path=ck
        )
        next(gen)
        gen.close()
        monkeypatch.delenv("CGD_TPU_REMAT")

        resumed = list(clip_guided_diffusion(
            **common, prefix_path=tmp_path / "res", resume_from=ck
        ))
        assert resumed  # adopted the recorded remat=1 graph and completed


class TestRematGate:
    """api._resolve_remat — the r5 512px grid measured no-remat fastest at
    every point that statically fits (b<=4 x cutn16, b=1 x cutn32; linear
    scaling, no cliff — the r4 20 s/step probe did not reproduce over three
    repeats); remat engages only beyond the measured envelope."""

    def test_auto_rule(self, monkeypatch):
        from cgd_tpu.api import _resolve_remat

        monkeypatch.delenv("CGD_TPU_REMAT", raising=False)
        assert not _resolve_remat(256, 1, 16)   # <512px never remats
        assert not _resolve_remat(512, 1, 16)   # measured: 135.5 ms/step
        assert not _resolve_remat(512, 2, 16)   # measured: 270.6 (3 repeats)
        assert not _resolve_remat(512, 4, 16)   # measured: 565.1, 13.2 GiB
        assert not _resolve_remat(512, 1, 32)   # measured: 181.9, 8.3 GiB
        assert _resolve_remat(512, 5, 16)       # beyond the measured grid
        assert _resolve_remat(512, 1, 33)       # beyond the measured grid
        assert _resolve_remat(512, 2, 17)       # unmeasured corner: b>1+cutn>16
        assert not _resolve_remat(256, 8, 64)   # still <512px

    def test_env_override(self, monkeypatch):
        from cgd_tpu.api import _resolve_remat

        monkeypatch.setenv("CGD_TPU_REMAT", "1")
        assert _resolve_remat(64, 1, 2)
        monkeypatch.setenv("CGD_TPU_REMAT", "0")
        assert not _resolve_remat(512, 8, 64)

    def test_env_flip_same_args_takes_effect(self, monkeypatch):
        """Regression (r4 advisor, high): an lru_cache on _resolve_remat made
        a mid-process CGD_TPU_REMAT flip silently reuse the first decision
        for identical (size, batch, cutn) — the env must be re-read every
        call so back-to-back same-shape runs honor the override."""
        from cgd_tpu.api import _resolve_remat

        monkeypatch.setenv("CGD_TPU_REMAT", "0")
        assert not _resolve_remat(64, 1, 2)
        monkeypatch.setenv("CGD_TPU_REMAT", "1")
        assert _resolve_remat(64, 1, 2)
        monkeypatch.delenv("CGD_TPU_REMAT")
        assert not _resolve_remat(64, 1, 2)

    def test_remat_decision_is_in_run_meta(self, monkeypatch, tmp_path):
        """A checkpoint written under one remat decision must not resume
        under another (the graph — and the last bf16 ulp — differs)."""
        import inspect

        from cgd_tpu import api

        src = inspect.getsource(api.clip_guided_diffusion)
        assert '"unet_remat": use_remat' in src


class TestRematNumerics:
    @pytest.mark.slow
    def test_remat_on_off_agree(self, tmp_path, monkeypatch):
        """jax.checkpoint must not change the sampled image beyond fusion
        rounding: the remat gate (api._resolve_remat) flips the graph per
        operating point, so both variants must produce the same trajectory.
        Exact equality is not promised (XLA reschedules fusions); the
        final frames must agree to float32-accumulation tolerance."""
        from PIL import Image

        from cgd_tpu.api import clip_guided_diffusion

        frames = {}
        for force in ("0", "1"):
            monkeypatch.setenv("CGD_TPU_REMAT", force)
            gen = clip_guided_diffusion(
                prompts=["remat parity"],
                image_size=64,
                timestep_respacing="ddim6",
                num_cutouts=2,
                save_frequency=6,
                weights_mode="random",
                prefix_path=tmp_path / f"out{force}",
                progress=False,
                seed=11,
            )
            last = list(gen)[-1][1]
            frames[force] = np.asarray(Image.open(last), dtype=np.float32)
        diff = np.abs(frames["0"] - frames["1"])
        assert diff.max() <= 2.0, f"remat changed pixels by {diff.max()} (uint8 scale)"
