"""Replicate/Cog serving adapter (reference surface: cog_predict.py:8-59).

Predictor with ``setup()`` (pre-download + warm caches) and ``predict()``
(web params -> generator of frame paths). Import-guarded so the module is
usable/testable without the cog package installed."""

from pathlib import Path

try:
    from cog import BasePredictor, Input
    from cog import Path as CogPath

    _HAS_COG = True
except ImportError:  # cog only exists inside the Replicate container
    _HAS_COG = False
    CogPath = Path

    class BasePredictor:  # minimal stand-in with the same hook names
        def setup(self):
            pass

    def Input(default=None, **kw):  # noqa: N802 (cog API name)
        return default


class ClipGuidedDiffusionPredictor(BasePredictor):
    def setup(self):
        """Pre-fetch the 256px uncond checkpoint + ViT-B/32 and warm the
        converted-weight cache (reference pre-downloads in setup,
        cog_predict.py:9-18 — note its 128/256 mismatch; we fetch what
        predict() actually uses)."""
        from cgd_tpu.weights import resolve_clip, resolve_unet

        resolve_clip("ViT-B/32")
        resolve_unet(256, class_cond=False)

    def predict(
        self,
        prompt: str = Input(default="an impressionist painting of a lighthouse"),
        respace: str = Input(default="ddim50"),
        init_image: Path = Input(default=None),
        num_cutouts: int = Input(default=16),
        clip_guidance_scale: int = Input(default=1000),
        tv_scale: int = Input(default=150),
        range_scale: int = Input(default=50),
        seed: int = Input(default=0),
    ):
        from cgd_tpu.api import clip_guided_diffusion

        skip = int(str(respace).replace("ddim", "")) // 2 if init_image else 0
        init_scale = 1000 if init_image else 0
        gen = clip_guided_diffusion(
            prompts=[prompt],
            image_size=256,
            class_cond=False,
            randomize_class=False,
            clip_model_name="ViT-B/32",
            timestep_respacing=str(respace),
            skip_timesteps=skip,
            init_image=str(init_image) if init_image else None,
            init_scale=init_scale,
            num_cutouts=num_cutouts,
            clip_guidance_scale=clip_guidance_scale,
            tv_scale=tv_scale,
            range_scale=range_scale,
            seed=seed,
            save_frequency=5,
            progress=False,
        )
        for _batch_idx, frame_path in gen:
            yield CogPath(frame_path)
