"""ADM UNet checkpoint converter: torch state dict -> cgd_tpu param pytree.

Maps the published guided_diffusion checkpoint naming (time_embed.N /
input_blocks.N.M / middle_block.M / output_blocks.N.M / out.N; SURVEY.md §2b
unet row) onto our block-plan pytree. Layout transforms:

- conv  OIHW -> HWIO;  linear [out,in] -> [in,out];  GN weight/bias -> scale/bias
- attention qkv: torch stores a 1x1 conv1d [3C, C, 1]. Channel order differs
  by checkpoint: legacy order interleaves per head (h-major: [h][q|k|v][d]),
  new order (use_new_attention_order, 64px only) chunks q|k|v first
  ([q|k|v][h][d]). Our canonical dense layout is the NEW order; legacy
  weights are permuted here (SURVEY.md §7 hard parts #4).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cgd_tpu.models.unet import UNetConfig, block_plan


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"], dtype=np.float32)
    return {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": np.asarray(sd[f"{name}.bias"], dtype=np.float32),
    }


def _linear(sd, name):
    w = np.asarray(sd[f"{name}.weight"], dtype=np.float32)
    return {
        "kernel": np.transpose(w, (1, 0)),
        "bias": np.asarray(sd[f"{name}.bias"], dtype=np.float32),
    }


def _norm(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"], dtype=np.float32),
        "bias": np.asarray(sd[f"{name}.bias"], dtype=np.float32),
    }


def _qkv(sd, name, ch: int, num_heads: int, new_order: bool):
    """1x1 conv1d qkv -> dense kernel [C, 3C] in canonical (new) order."""
    w = np.asarray(sd[f"{name}.weight"], dtype=np.float32)  # [3C, C, 1]
    b = np.asarray(sd[f"{name}.bias"], dtype=np.float32)  # [3C]
    w = w[:, :, 0]
    d = ch // num_heads
    if not new_order:
        # legacy: rows are [h][qkv][d] -> permute to [qkv][h][d]
        w = w.reshape(num_heads, 3, d, ch).transpose(1, 0, 2, 3).reshape(3 * ch, ch)
        b = b.reshape(num_heads, 3, d).transpose(1, 0, 2).reshape(3 * ch)
    return {"kernel": np.transpose(w, (1, 0)), "bias": b}


def _proj1d(sd, name):
    w = np.asarray(sd[f"{name}.weight"], dtype=np.float32)[:, :, 0]  # [C,C,1]
    return {
        "kernel": np.transpose(w, (1, 0)),
        "bias": np.asarray(sd[f"{name}.bias"], dtype=np.float32),
    }


def _res_block(sd, prefix, cin, cout):
    p = {
        "in_norm": _norm(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "emb": _linear(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _norm(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        p["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return p


def _attn_block(sd, prefix, ch, cfg: UNetConfig):
    heads = cfg.heads_for(ch)
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "qkv": _qkv(sd, f"{prefix}.qkv", ch, heads, cfg.use_new_attention_order),
        "proj": _proj1d(sd, f"{prefix}.proj_out"),
    }


def _layer(sd, prefix, spec, cfg: UNetConfig):
    kind = spec[0]
    if kind == "res":
        return _res_block(sd, prefix, spec[1], spec[2])
    if kind == "attn":
        return _attn_block(sd, prefix, spec[1], cfg)
    if kind == "downsample":
        return {"conv": _conv(sd, f"{prefix}.op")}
    if kind == "upsample":
        return {"conv": _conv(sd, f"{prefix}.conv")}
    raise ValueError(kind)


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: UNetConfig):
    input_plan, middle_plan, output_plan, _ = block_plan(cfg)
    params = {
        "time_embed": [_linear(sd, "time_embed.0"), _linear(sd, "time_embed.2")],
        "conv_in": _conv(sd, "input_blocks.0.0"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
    }
    if cfg.num_classes is not None:
        params["label_emb"] = {
            "table": np.asarray(sd["label_emb.weight"], dtype=np.float32)
        }

    inp = []
    for i, blk in enumerate(input_plan):
        inp.append([_layer(sd, f"input_blocks.{i + 1}.{j}", s, cfg) for j, s in enumerate(blk)])
    params["input"] = inp

    params["middle"] = [
        _layer(sd, f"middle_block.{j}", s, cfg) for j, s in enumerate(middle_plan)
    ]

    out = []
    for i, blk in enumerate(output_plan):
        out.append([_layer(sd, f"output_blocks.{i}.{j}", s, cfg) for j, s in enumerate(blk)])
    params["output"] = out
    return params


def convert_unet_checkpoint(pt_path: str, cfg: UNetConfig):
    import torch

    sd = torch.load(pt_path, map_location="cpu")
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_state_dict(sd, cfg)
