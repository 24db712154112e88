"""CLIP checkpoint converter: OpenAI TorchScript .pt -> cgd_tpu param pytree.

Handles both TorchScript archives (the published OpenAI files, loaded via
torch.jit.load -> state_dict, per ext clip/clip.py load contract) and plain
state-dict .pt files. BatchNorms in the ModifiedResNet tower are folded into
inference scale/bias here (our tower stores no running stats — SURVEY.md §7).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cgd_tpu.models.clip.configs import CLIPConfig, VisionResNetConfig


def _t(w):
    return np.transpose(np.asarray(w, dtype=np.float32), (1, 0))


def _f32(w):
    return np.asarray(w, dtype=np.float32)


def _linear(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]), "bias": _f32(sd[f"{name}.bias"])}


def _ln(sd, name):
    return {"scale": _f32(sd[f"{name}.weight"]), "bias": _f32(sd[f"{name}.bias"])}


def _conv_hwio(sd, name):
    return {"kernel": np.transpose(_f32(sd[f"{name}.weight"]), (2, 3, 1, 0))}


def _bn_fold(sd, name, eps=1e-5):
    gamma = _f32(sd[f"{name}.weight"])
    beta = _f32(sd[f"{name}.bias"])
    mean = _f32(sd[f"{name}.running_mean"])
    var = _f32(sd[f"{name}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def _tx_block(sd, prefix):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "attn_qkv": {
            "kernel": _t(sd[f"{prefix}.attn.in_proj_weight"]),
            "bias": _f32(sd[f"{prefix}.attn.in_proj_bias"]),
        },
        "attn_out": _linear(sd, f"{prefix}.attn.out_proj"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "mlp_fc": _linear(sd, f"{prefix}.mlp.c_fc"),
        "mlp_proj": _linear(sd, f"{prefix}.mlp.c_proj"),
    }


def _convert_vit_visual(sd, n_layers):
    return {
        "conv1": {"kernel": np.transpose(_f32(sd["visual.conv1.weight"]), (2, 3, 1, 0))},
        "class_embedding": _f32(sd["visual.class_embedding"]),
        "positional_embedding": _f32(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": [_tx_block(sd, f"visual.transformer.resblocks.{i}") for i in range(n_layers)],
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": _f32(sd["visual.proj"]),
    }


def _bottleneck(sd, prefix):
    p = {
        "conv1": _conv_hwio(sd, f"{prefix}.conv1"),
        "bn1": _bn_fold(sd, f"{prefix}.bn1"),
        "conv2": _conv_hwio(sd, f"{prefix}.conv2"),
        "bn2": _bn_fold(sd, f"{prefix}.bn2"),
        "conv3": _conv_hwio(sd, f"{prefix}.conv3"),
        "bn3": _bn_fold(sd, f"{prefix}.bn3"),
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["down_conv"] = _conv_hwio(sd, f"{prefix}.downsample.0")
        p["down_bn"] = _bn_fold(sd, f"{prefix}.downsample.1")
    return p


def _convert_rn_visual(sd, cfg: VisionResNetConfig):
    params = {
        "conv1": _conv_hwio(sd, "visual.conv1"),
        "bn1": _bn_fold(sd, "visual.bn1"),
        "conv2": _conv_hwio(sd, "visual.conv2"),
        "bn2": _bn_fold(sd, "visual.bn2"),
        "conv3": _conv_hwio(sd, "visual.conv3"),
        "bn3": _bn_fold(sd, "visual.bn3"),
    }
    for li, n in enumerate(cfg.layers):
        params[f"layer{li + 1}"] = [
            _bottleneck(sd, f"visual.layer{li + 1}.{i}") for i in range(n)
        ]
    params["attnpool"] = {
        "positional_embedding": _f32(sd["visual.attnpool.positional_embedding"]),
        "q_proj": _linear(sd, "visual.attnpool.q_proj"),
        "k_proj": _linear(sd, "visual.attnpool.k_proj"),
        "v_proj": _linear(sd, "visual.attnpool.v_proj"),
        "c_proj": _linear(sd, "visual.attnpool.c_proj"),
    }
    return params


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPConfig):
    if cfg.is_vit:
        visual = _convert_vit_visual(sd, cfg.vision.layers)
    else:
        visual = _convert_rn_visual(sd, cfg.vision)
    text = {
        "token_embedding": _f32(sd["token_embedding.weight"]),
        "positional_embedding": _f32(sd["positional_embedding"]),
        "blocks": [
            _tx_block(sd, f"transformer.resblocks.{i}") for i in range(cfg.text.layers)
        ],
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _f32(sd["text_projection"]),
    }
    return {"visual": visual, "text": text}


def load_torch_clip_sd(pt_path: str) -> Dict[str, np.ndarray]:
    """Load a CLIP checkpoint (TorchScript archive or plain state dict) as a
    numpy state dict."""
    import torch

    try:
        model = torch.jit.load(pt_path, map_location="cpu")
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(pt_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return {k: (v.float().numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}


def convert_clip_checkpoint(pt_path: str, cfg: CLIPConfig):
    return convert_state_dict(load_torch_clip_sd(pt_path), cfg)
