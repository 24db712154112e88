"""Converter validation against the published checkpoint key layouts.

The real .pt files are not downloadable here (no network), so this is the
strongest available converter check: build synthetic state dicts under the
EXACT canonical key names and torch tensor layouts of guided_diffusion's
``UNetModel.state_dict()`` (time_embed.N / input_blocks.i.j.in_layers.0 /
... / out.2 — the naming loaded by the reference at
cgd/script_util.py:317) and of the OpenAI CLIP ``state_dict()``
(visual.conv1 / transformer.resblocks.i.attn.in_proj_weight / ... — loaded
via TorchScript at cgd/clip_util.py:59-64), then require:

1. conversion consumes EVERY key (nothing silently ignored beyond the
   documented allowlist of torch bookkeeping buffers),
2. no key is missing (conversion would KeyError), and
3. the converted pytree matches init_unet / init_clip structure and
   per-leaf shapes exactly.

This pins the converters' key inventory for all six diffusion checkpoints
and four CLIP releases at full size. Numerical layout correctness (the
transposes) is pinned separately by tests/test_torch_crosscheck.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgd_tpu.convert import torch_clip, torch_unet
from cgd_tpu.models.clip import init_clip
from cgd_tpu.models.clip.configs import CLIP_CONFIGS
from cgd_tpu.models.unet import UNetConfig, block_plan, init_unet
from cgd_tpu.registry import DIFFUSION_LOOKUP


class TrackingDict(dict):
    """State dict recording which keys conversion reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


# ---------------------------------------------------------------------------
# synthetic guided_diffusion UNetModel.state_dict()
# ---------------------------------------------------------------------------

def adm_state_dict(cfg: UNetConfig) -> TrackingDict:
    sd = TrackingDict()
    z = lambda *s: np.zeros(s, np.float32)

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = z(cout, cin, k, k)  # torch OIHW
        sd[f"{name}.bias"] = z(cout)

    def lin(name, cout, cin):
        sd[f"{name}.weight"] = z(cout, cin)
        sd[f"{name}.bias"] = z(cout)

    def norm(name, c):
        sd[f"{name}.weight"] = z(c)
        sd[f"{name}.bias"] = z(c)

    def res(prefix, cin, cout):
        norm(f"{prefix}.in_layers.0", cin)
        conv(f"{prefix}.in_layers.2", cout, cin, 3)
        emb_out = 2 * cout if cfg.use_scale_shift_norm else cout
        lin(f"{prefix}.emb_layers.1", emb_out, cfg.time_embed_dim)
        norm(f"{prefix}.out_layers.0", cout)
        conv(f"{prefix}.out_layers.3", cout, cout, 3)
        if cin != cout:
            conv(f"{prefix}.skip_connection", cout, cin, 1)

    def attn(prefix, ch):
        norm(f"{prefix}.norm", ch)
        sd[f"{prefix}.qkv.weight"] = z(3 * ch, ch, 1)  # 1x1 conv1d
        sd[f"{prefix}.qkv.bias"] = z(3 * ch)
        sd[f"{prefix}.proj_out.weight"] = z(ch, ch, 1)
        sd[f"{prefix}.proj_out.bias"] = z(ch)

    def layer(prefix, spec):
        if spec[0] == "res":
            res(prefix, spec[1], spec[2])
        elif spec[0] == "attn":
            attn(prefix, spec[1])
        elif spec[0] == "downsample":
            conv(f"{prefix}.op", spec[1], spec[1], 3)
        elif spec[0] == "upsample":
            conv(f"{prefix}.conv", spec[1], spec[1], 3)
        else:
            raise ValueError(spec)

    mc, ted = cfg.model_channels, cfg.time_embed_dim
    lin("time_embed.0", ted, mc)
    lin("time_embed.2", ted, ted)
    if cfg.num_classes is not None:
        sd["label_emb.weight"] = z(cfg.num_classes, ted)
    conv("input_blocks.0.0", int(cfg.channel_mult[0] * mc), cfg.in_channels, 3)

    input_plan, middle_plan, output_plan, ch_out = block_plan(cfg)
    for i, blk in enumerate(input_plan):
        for j, spec in enumerate(blk):
            layer(f"input_blocks.{i + 1}.{j}", spec)
    for j, spec in enumerate(middle_plan):
        layer(f"middle_block.{j}", spec)
    for i, blk in enumerate(output_plan):
        for j, spec in enumerate(blk):
            layer(f"output_blocks.{i}.{j}", spec)

    norm("out.0", ch_out)
    conv("out.2", cfg.out_channels, ch_out, 3)
    return sd


# ---------------------------------------------------------------------------
# synthetic OpenAI CLIP state_dict()
# ---------------------------------------------------------------------------

# torch bookkeeping entries present in the real archives that conversion
# deliberately ignores (logit_scale is contrastive-training-only; the rest
# are TorchScript metadata buffers / BN counters)
CLIP_IGNORED = ("logit_scale", "input_resolution", "context_length",
                "vocab_size")
CLIP_IGNORED_SUFFIX = (".num_batches_tracked",)


def clip_state_dict(cfg) -> TrackingDict:
    sd = TrackingDict()
    z = lambda *s: np.zeros(s, np.float32)

    def lin(name, cout, cin):
        sd[f"{name}.weight"] = z(cout, cin)
        sd[f"{name}.bias"] = z(cout)

    def ln(name, c):
        sd[f"{name}.weight"] = z(c)
        sd[f"{name}.bias"] = z(c)

    def bn(name, c):
        ln(name, c)
        sd[f"{name}.running_mean"] = z(c)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)
        sd[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)

    def tx_block(prefix, width):
        ln(f"{prefix}.ln_1", width)
        sd[f"{prefix}.attn.in_proj_weight"] = z(3 * width, width)
        sd[f"{prefix}.attn.in_proj_bias"] = z(3 * width)
        lin(f"{prefix}.attn.out_proj", width, width)
        ln(f"{prefix}.ln_2", width)
        lin(f"{prefix}.mlp.c_fc", 4 * width, width)
        lin(f"{prefix}.mlp.c_proj", width, 4 * width)

    v = cfg.vision
    if cfg.is_vit:
        grid = v.input_resolution // v.patch_size
        sd["visual.conv1.weight"] = z(v.width, 3, v.patch_size, v.patch_size)
        sd["visual.class_embedding"] = z(v.width)
        sd["visual.positional_embedding"] = z(grid * grid + 1, v.width)
        ln("visual.ln_pre", v.width)
        for i in range(v.layers):
            tx_block(f"visual.transformer.resblocks.{i}", v.width)
        ln("visual.ln_post", v.width)
        sd["visual.proj"] = z(v.width, cfg.embed_dim)
    else:
        w = v.width
        sd["visual.conv1.weight"] = z(w // 2, 3, 3, 3)
        bn("visual.bn1", w // 2)
        sd["visual.conv2.weight"] = z(w // 2, w // 2, 3, 3)
        bn("visual.bn2", w // 2)
        sd["visual.conv3.weight"] = z(w, w // 2, 3, 3)
        bn("visual.bn3", w)
        inplanes = w
        for li, n_blocks in enumerate(v.layers):
            planes = w * (2**li)
            for b in range(n_blocks):
                prefix = f"visual.layer{li + 1}.{b}"
                sd[f"{prefix}.conv1.weight"] = z(planes, inplanes, 1, 1)
                bn(f"{prefix}.bn1", planes)
                sd[f"{prefix}.conv2.weight"] = z(planes, planes, 3, 3)
                bn(f"{prefix}.bn2", planes)
                sd[f"{prefix}.conv3.weight"] = z(planes * 4, planes, 1, 1)
                bn(f"{prefix}.bn3", planes * 4)
                if b == 0:  # CLIP's Bottleneck: inplanes != planes*4 at entry
                    sd[f"{prefix}.downsample.0.weight"] = z(planes * 4, inplanes, 1, 1)
                    bn(f"{prefix}.downsample.1", planes * 4)
                inplanes = planes * 4
        embed = w * 32  # final feature dim
        spacial = v.input_resolution // 32
        sd["visual.attnpool.positional_embedding"] = z(spacial * spacial + 1, embed)
        for p in ("q_proj", "k_proj", "v_proj"):
            lin(f"visual.attnpool.{p}", embed, embed)
        lin("visual.attnpool.c_proj", cfg.embed_dim, embed)

    t = cfg.text
    sd["token_embedding.weight"] = z(t.vocab_size, t.width)
    sd["positional_embedding"] = z(t.context_length, t.width)
    for i in range(t.layers):
        tx_block(f"transformer.resblocks.{i}", t.width)
    ln("ln_final", t.width)
    sd["text_projection"] = z(t.width, cfg.embed_dim)
    sd["logit_scale"] = z()
    sd["input_resolution"] = np.asarray(v.input_resolution)
    sd["context_length"] = np.asarray(t.context_length)
    sd["vocab_size"] = np.asarray(t.vocab_size)
    return sd


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------

def assert_same_tree_shapes(converted, init_shapes, where):
    conv_leaves, conv_def = jax.tree_util.tree_flatten(converted)
    init_leaves, init_def = jax.tree_util.tree_flatten(init_shapes)
    assert conv_def == init_def, f"{where}: pytree structure mismatch"
    for i, (c, s) in enumerate(zip(conv_leaves, init_leaves)):
        assert tuple(c.shape) == tuple(s.shape), (
            f"{where}: leaf {i} shape {c.shape} != init {s.shape}"
        )


ALL_DIFFUSION = [
    ("cond", 64), ("cond", 128), ("cond", 256), ("cond", 512),
    ("uncond", 256), ("uncond", 512),
]


@pytest.mark.parametrize("kind,size", ALL_DIFFUSION)
def test_unet_converter_keyset(kind, size):
    flags = DIFFUSION_LOOKUP[kind][size]["model_flags"]
    cfg = UNetConfig.from_flags(flags)
    sd = adm_state_dict(cfg)
    params = torch_unet.convert_state_dict(sd, cfg)
    unread = set(sd) - sd.accessed
    assert not unread, f"converter ignored checkpoint keys: {sorted(unread)[:8]}"
    init_shapes = jax.eval_shape(lambda k: init_unet(k, cfg), jax.random.PRNGKey(0))
    assert_same_tree_shapes(params, init_shapes, f"{kind}/{size}")


@pytest.mark.parametrize("name", ["ViT-B/32", "ViT-L/14", "RN50", "RN50x16"])
def test_clip_converter_keyset(name):
    cfg = CLIP_CONFIGS[name]
    sd = clip_state_dict(cfg)
    params = torch_clip.convert_state_dict(sd, cfg)
    unread = {
        k for k in set(sd) - sd.accessed
        if k not in CLIP_IGNORED and not k.endswith(CLIP_IGNORED_SUFFIX)
    }
    assert not unread, f"converter ignored checkpoint keys: {sorted(unread)[:8]}"
    init_shapes = jax.eval_shape(lambda k: init_clip(k, cfg), jax.random.PRNGKey(0))
    assert_same_tree_shapes(params, init_shapes, name)


def test_unet_converter_fails_loudly_on_missing_key():
    cfg = UNetConfig.from_flags(DIFFUSION_LOOKUP["cond"][64]["model_flags"])
    sd = adm_state_dict(cfg)
    del sd["middle_block.1.qkv.weight"]
    with pytest.raises(KeyError):
        torch_unet.convert_state_dict(sd, cfg)
