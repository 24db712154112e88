"""cgd_tpu — TPU-native CLIP-guided diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
afiaka87/clip-guided-diffusion (reference: /root/reference). The compute path is
pure-functional JAX (pjit/shard_map over device meshes, bf16 on the MXU with
fp32 normalization islands); nothing is a translation of the reference's torch
graph.

Public API mirrors the reference's Python API surface
(reference: cgd/cgd.py:19-283):

    from cgd_tpu import clip_guided_diffusion
    for batch_idx, frame_path in clip_guided_diffusion(prompts=["a photo"]):
        ...
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep `import cgd_tpu` light for subpackage users
    if name == "clip_guided_diffusion":
        from cgd_tpu.api import clip_guided_diffusion

        return clip_guided_diffusion
    raise AttributeError(f"module 'cgd_tpu' has no attribute {name!r}")
