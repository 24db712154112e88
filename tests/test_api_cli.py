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
        assert len(results) == 2  # step 0 + final step 4


class TestCLI:
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
        # reduce-clip skips 20% of 25 steps -> 20 steps -> saves 0000 + final 0019
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
