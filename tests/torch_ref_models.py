"""Minimal torch replicas of the ADM UNet and CLIP towers — TEST FIXTURES.

Written clean-room from the architecture contracts (SURVEY.md §2b) for
numerical cross-validation: build a torch model, export a state dict with the
published checkpoint naming, convert with cgd_tpu.convert, and compare
forwards. This is the "reimplement twice and cross-check" strategy from
SURVEY.md §7 build order #1 — it validates layer math, weight layouts, and
converter name mapping end-to-end without network access.

Only the inference path is implemented; eval mode, fp32.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# ADM UNet (tiny configs only)
# ---------------------------------------------------------------------------

def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResBlock(nn.Module):
    def __init__(self, cin, cout, emb_dim, use_scale_shift=True, mode=""):
        super().__init__()
        self.mode = mode
        self.use_scale_shift = use_scale_shift
        groups = 32 if cin % 32 == 0 else math.gcd(cin, 32)
        groups_out = 32 if cout % 32 == 0 else math.gcd(cout, 32)
        self.in_layers = nn.Sequential(
            nn.GroupNorm(groups, cin), nn.SiLU(), nn.Conv2d(cin, cout, 3, padding=1)
        )
        self.emb_layers = nn.Sequential(
            nn.SiLU(), nn.Linear(emb_dim, 2 * cout if use_scale_shift else cout)
        )
        self.out_layers = nn.Sequential(
            nn.GroupNorm(groups_out, cout), nn.SiLU(), nn.Identity(),
            nn.Conv2d(cout, cout, 3, padding=1),
        )
        self.skip_connection = nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()

    def forward(self, x, emb):
        h = self.in_layers[1](self.in_layers[0](x))
        if self.mode == "up":
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        elif self.mode == "down":
            h = F.avg_pool2d(h, 2)
            x = F.avg_pool2d(x, 2)
        h = self.in_layers[2](h)
        emb_out = self.emb_layers(emb)[:, :, None, None]
        if self.use_scale_shift:
            scale, shift = torch.chunk(emb_out, 2, dim=1)
            h = self.out_layers[0](h) * (1 + scale) + shift
            h = self.out_layers[1](h)
        else:
            h = h + emb_out
            h = self.out_layers[1](self.out_layers[0](h))
        h = self.out_layers[3](h)
        return self.skip_connection(x) + h


class AttentionBlock(nn.Module):
    def __init__(self, ch, num_heads, new_order=False):
        super().__init__()
        groups = 32 if ch % 32 == 0 else math.gcd(ch, 32)
        self.norm = nn.GroupNorm(groups, ch)
        self.qkv = nn.Conv1d(ch, 3 * ch, 1)
        self.proj_out = nn.Conv1d(ch, ch, 1)
        self.num_heads = num_heads
        self.new_order = new_order

    def forward(self, x):
        b, c, h, w = x.shape
        flat = x.reshape(b, c, h * w)
        qkv = self.qkv(self.norm(flat))  # [b, 3c, t]
        H, d, t = self.num_heads, c // self.num_heads, h * w
        if self.new_order:
            # chunk q|k|v first, then heads
            q, k, v = qkv.chunk(3, dim=1)
            q = q.reshape(b * H, d, t)
            k = k.reshape(b * H, d, t)
            v = v.reshape(b * H, d, t)
        else:
            # legacy: heads first, then q|k|v within each head
            qkv = qkv.reshape(b * H, 3 * d, t)
            q, k, v = qkv.split(d, dim=1)
        scale = 1 / math.sqrt(math.sqrt(d))
        weight = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
        a = torch.einsum("bts,bcs->bct", weight, v)
        a = a.reshape(b, c, t)
        return (flat + self.proj_out(a)).reshape(b, c, h, w)


class TorchADMUNet(nn.Module):
    """Mirrors cgd_tpu.models.unet.block_plan for tiny configs."""

    def __init__(self, cfg):
        super().__init__()
        from cgd_tpu.models.unet import block_plan

        self.cfg = cfg
        input_plan, middle_plan, output_plan, out_ch = block_plan(cfg)
        self.plans = (input_plan, middle_plan, output_plan)
        emb_dim = cfg.time_embed_dim

        self.time_embed = nn.Sequential(
            nn.Linear(cfg.model_channels, emb_dim), nn.SiLU(), nn.Linear(emb_dim, emb_dim)
        )
        if cfg.num_classes:
            self.label_emb = nn.Embedding(cfg.num_classes, emb_dim)

        def build(spec):
            kind = spec[0]
            if kind == "res":
                return ResBlock(spec[1], spec[2], emb_dim, cfg.use_scale_shift_norm, spec[3])
            if kind == "attn":
                return AttentionBlock(spec[1], cfg.heads_for(spec[1]), cfg.use_new_attention_order)
            if kind == "downsample":
                return nn.Conv2d(spec[1], spec[1], 3, stride=2, padding=1)
            if kind == "upsample":
                return nn.Conv2d(spec[1], spec[1], 3, padding=1)
            raise ValueError(kind)

        first_ch = int(cfg.channel_mult[0] * cfg.model_channels)
        self.input_blocks = nn.ModuleList(
            [nn.ModuleList([nn.Conv2d(cfg.in_channels, first_ch, 3, padding=1)])]
            + [nn.ModuleList([build(s) for s in blk]) for blk in input_plan]
        )
        self.middle_block = nn.ModuleList([build(s) for s in middle_plan])
        self.output_blocks = nn.ModuleList(
            [nn.ModuleList([build(s) for s in blk]) for blk in output_plan]
        )
        groups = 32 if out_ch % 32 == 0 else math.gcd(out_ch, 32)
        self.out = nn.Sequential(
            nn.GroupNorm(groups, out_ch), nn.SiLU(),
            nn.Conv2d(out_ch, cfg.out_channels, 3, padding=1),
        )

    def _apply_layer(self, layer, spec, h, emb):
        if spec[0] == "res":
            return layer(h, emb)
        if spec[0] == "attn":
            return layer(h)
        if spec[0] == "downsample":
            return layer(h)
        if spec[0] == "upsample":
            return layer(F.interpolate(h, scale_factor=2, mode="nearest"))
        raise ValueError(spec)

    def forward(self, x, t, y=None):
        cfg = self.cfg
        input_plan, middle_plan, output_plan = self.plans
        emb = self.time_embed(timestep_embedding(t, cfg.model_channels))
        if cfg.num_classes:
            emb = emb + self.label_emb(y)
        h = self.input_blocks[0][0](x)
        hs = [h]
        for blk, plan in zip(list(self.input_blocks)[1:], input_plan):
            for layer, spec in zip(blk, plan):
                h = self._apply_layer(layer, spec, h, emb)
            hs.append(h)
        for layer, spec in zip(self.middle_block, middle_plan):
            h = self._apply_layer(layer, spec, h, emb)
        for blk, plan in zip(self.output_blocks, output_plan):
            h = torch.cat([h, hs.pop()], dim=1)
            for layer, spec in zip(blk, plan):
                h = self._apply_layer(layer, spec, h, emb)
        return self.out(h)

    def adm_state_dict(self):
        """Rename torch-module params to the published ADM checkpoint naming."""
        sd = {}
        sd["time_embed.0.weight"] = self.time_embed[0].weight
        sd["time_embed.0.bias"] = self.time_embed[0].bias
        sd["time_embed.2.weight"] = self.time_embed[2].weight
        sd["time_embed.2.bias"] = self.time_embed[2].bias
        if self.cfg.num_classes:
            sd["label_emb.weight"] = self.label_emb.weight
        sd["input_blocks.0.0.weight"] = self.input_blocks[0][0].weight
        sd["input_blocks.0.0.bias"] = self.input_blocks[0][0].bias

        def res_sd(prefix, m: ResBlock):
            sd[f"{prefix}.in_layers.0.weight"] = m.in_layers[0].weight
            sd[f"{prefix}.in_layers.0.bias"] = m.in_layers[0].bias
            sd[f"{prefix}.in_layers.2.weight"] = m.in_layers[2].weight
            sd[f"{prefix}.in_layers.2.bias"] = m.in_layers[2].bias
            sd[f"{prefix}.emb_layers.1.weight"] = m.emb_layers[1].weight
            sd[f"{prefix}.emb_layers.1.bias"] = m.emb_layers[1].bias
            sd[f"{prefix}.out_layers.0.weight"] = m.out_layers[0].weight
            sd[f"{prefix}.out_layers.0.bias"] = m.out_layers[0].bias
            sd[f"{prefix}.out_layers.3.weight"] = m.out_layers[3].weight
            sd[f"{prefix}.out_layers.3.bias"] = m.out_layers[3].bias
            if not isinstance(m.skip_connection, nn.Identity):
                sd[f"{prefix}.skip_connection.weight"] = m.skip_connection.weight
                sd[f"{prefix}.skip_connection.bias"] = m.skip_connection.bias

        def attn_sd(prefix, m: AttentionBlock):
            sd[f"{prefix}.norm.weight"] = m.norm.weight
            sd[f"{prefix}.norm.bias"] = m.norm.bias
            sd[f"{prefix}.qkv.weight"] = m.qkv.weight
            sd[f"{prefix}.qkv.bias"] = m.qkv.bias
            sd[f"{prefix}.proj_out.weight"] = m.proj_out.weight
            sd[f"{prefix}.proj_out.bias"] = m.proj_out.bias

        def layer_sd(prefix, layer, spec):
            if spec[0] == "res":
                res_sd(prefix, layer)
            elif spec[0] == "attn":
                attn_sd(prefix, layer)
            elif spec[0] == "downsample":
                sd[f"{prefix}.op.weight"] = layer.weight
                sd[f"{prefix}.op.bias"] = layer.bias
            elif spec[0] == "upsample":
                sd[f"{prefix}.conv.weight"] = layer.weight
                sd[f"{prefix}.conv.bias"] = layer.bias

        input_plan, middle_plan, output_plan = self.plans
        for i, (blk, plan) in enumerate(zip(list(self.input_blocks)[1:], input_plan)):
            for j, (layer, spec) in enumerate(zip(blk, plan)):
                layer_sd(f"input_blocks.{i + 1}.{j}", layer, spec)
        for j, (layer, spec) in enumerate(zip(self.middle_block, middle_plan)):
            layer_sd(f"middle_block.{j}", layer, spec)
        for i, (blk, plan) in enumerate(zip(self.output_blocks, output_plan)):
            for j, (layer, spec) in enumerate(zip(blk, plan)):
                layer_sd(f"output_blocks.{i}.{j}", layer, spec)
        sd["out.0.weight"] = self.out[0].weight
        sd["out.0.bias"] = self.out[0].bias
        sd["out.2.weight"] = self.out[2].weight
        sd["out.2.bias"] = self.out[2].bias
        return {k: v.detach() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# CLIP (tiny ViT + text; ModifiedResNet bottleneck path)
# ---------------------------------------------------------------------------

class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchCLIPBlock(nn.Module):
    def __init__(self, width, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential(nn.Linear(width, 4 * width), QuickGELU(), nn.Linear(4 * width, width))

    def forward(self, x, mask=None):  # x: [T, B, C]
        a, _ = self.attn(self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False, attn_mask=mask)
        x = x + a
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchCLIPViT(nn.Module):
    def __init__(self, res, patch, width, layers, heads, embed_dim):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch, stride=patch, bias=False)
        scale = width**-0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n = (res // patch) ** 2
        self.positional_embedding = nn.Parameter(scale * torch.randn(n + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.blocks = nn.ModuleList([TorchCLIPBlock(width, heads) for _ in range(layers)])
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, embed_dim))

    def forward(self, x):
        h = self.conv1(x)  # [B, w, g, g]
        b, c, g, _ = h.shape
        h = h.reshape(b, c, g * g).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(b, 1, c)
        h = torch.cat([cls, h], dim=1) + self.positional_embedding
        h = self.ln_pre(h).permute(1, 0, 2)  # [T,B,C]
        for blk in self.blocks:
            h = blk(h)
        h = h.permute(1, 0, 2)
        return self.ln_post(h[:, 0]) @ self.proj

    def clip_state_dict(self, text: "TorchCLIPText"):
        sd = {"visual.conv1.weight": self.conv1.weight,
              "visual.class_embedding": self.class_embedding,
              "visual.positional_embedding": self.positional_embedding,
              "visual.ln_pre.weight": self.ln_pre.weight,
              "visual.ln_pre.bias": self.ln_pre.bias,
              "visual.ln_post.weight": self.ln_post.weight,
              "visual.ln_post.bias": self.ln_post.bias,
              "visual.proj": self.proj}
        for i, blk in enumerate(self.blocks):
            p = f"visual.transformer.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = blk.ln_1.weight
            sd[f"{p}.ln_1.bias"] = blk.ln_1.bias
            sd[f"{p}.attn.in_proj_weight"] = blk.attn.in_proj_weight
            sd[f"{p}.attn.in_proj_bias"] = blk.attn.in_proj_bias
            sd[f"{p}.attn.out_proj.weight"] = blk.attn.out_proj.weight
            sd[f"{p}.attn.out_proj.bias"] = blk.attn.out_proj.bias
            sd[f"{p}.ln_2.weight"] = blk.ln_2.weight
            sd[f"{p}.ln_2.bias"] = blk.ln_2.bias
            sd[f"{p}.mlp.c_fc.weight"] = blk.mlp[0].weight
            sd[f"{p}.mlp.c_fc.bias"] = blk.mlp[0].bias
            sd[f"{p}.mlp.c_proj.weight"] = blk.mlp[2].weight
            sd[f"{p}.mlp.c_proj.bias"] = blk.mlp[2].bias
        sd.update(text.text_state_dict())
        return {k: v.detach() for k, v in sd.items()}


class TorchCLIPText(nn.Module):
    def __init__(self, vocab, ctx, width, heads, layers, embed_dim):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(0.01 * torch.randn(ctx, width))
        self.blocks = nn.ModuleList([TorchCLIPBlock(width, heads) for _ in range(layers)])
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(width**-0.5 * torch.randn(width, embed_dim))
        mask = torch.full((ctx, ctx), float("-inf"))
        mask.triu_(1)
        self.register_buffer("mask", mask, persistent=False)

    def forward(self, tokens):
        h = self.token_embedding(tokens) + self.positional_embedding
        h = h.permute(1, 0, 2)
        for blk in self.blocks:
            h = blk(h, self.mask)
        h = h.permute(1, 0, 2)
        h = self.ln_final(h)
        eot = tokens.argmax(dim=-1)
        return h[torch.arange(h.shape[0]), eot] @ self.text_projection

    def text_state_dict(self):
        sd = {"token_embedding.weight": self.token_embedding.weight,
              "positional_embedding": self.positional_embedding,
              "ln_final.weight": self.ln_final.weight,
              "ln_final.bias": self.ln_final.bias,
              "text_projection": self.text_projection}
        for i, blk in enumerate(self.blocks):
            p = f"transformer.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = blk.ln_1.weight
            sd[f"{p}.ln_1.bias"] = blk.ln_1.bias
            sd[f"{p}.attn.in_proj_weight"] = blk.attn.in_proj_weight
            sd[f"{p}.attn.in_proj_bias"] = blk.attn.in_proj_bias
            sd[f"{p}.attn.out_proj.weight"] = blk.attn.out_proj.weight
            sd[f"{p}.attn.out_proj.bias"] = blk.attn.out_proj.bias
            sd[f"{p}.ln_2.weight"] = blk.ln_2.weight
            sd[f"{p}.ln_2.bias"] = blk.ln_2.bias
            sd[f"{p}.mlp.c_fc.weight"] = blk.mlp[0].weight
            sd[f"{p}.mlp.c_fc.bias"] = blk.mlp[0].bias
            sd[f"{p}.mlp.c_proj.weight"] = blk.mlp[2].weight
            sd[f"{p}.mlp.c_proj.bias"] = blk.mlp[2].bias
        return sd


class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.stride = stride
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchModifiedResNet(nn.Module):
    def __init__(self, layers, width, res, embed_dim, heads):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        self.layer1 = self._make_layer(width, layers[0])
        self.layer2 = self._make_layer(width * 2, layers[1], stride=2)
        self.layer3 = self._make_layer(width * 4, layers[2], stride=2)
        self.layer4 = self._make_layer(width * 8, layers[3], stride=2)
        c = width * 32
        spacial = res // 32
        self.pos_emb = nn.Parameter(torch.randn(spacial**2 + 1, c) / c**0.5)
        self.q_proj = nn.Linear(c, c)
        self.k_proj = nn.Linear(c, c)
        self.v_proj = nn.Linear(c, c)
        self.c_proj = nn.Linear(c, embed_dim)
        self.heads = heads

    def _make_layer(self, planes, blocks, stride=1):
        layers = [TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self._inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = F.relu(self.bn3(self.conv3(h)))
        h = self.avgpool(h)
        h = self.layer4(self.layer3(self.layer2(self.layer1(h))))
        # attnpool: query = mean-prepended token (ext clip AttentionPool2d)
        b, c, hh, ww = h.shape
        t = h.reshape(b, c, hh * ww).permute(2, 0, 1)  # [T,B,C]
        t = torch.cat([t.mean(0, keepdim=True), t], dim=0) + self.pos_emb[:, None]
        out, _ = F.multi_head_attention_forward(
            query=t[:1], key=t, value=t,
            embed_dim_to_check=c, num_heads=self.heads,
            q_proj_weight=self.q_proj.weight, k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight, in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight, out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False,
        )
        return out.squeeze(0)

    def rn_state_dict(self, text: "TorchCLIPText"):
        sd = {}

        def bn(prefix, m):
            sd[f"{prefix}.weight"] = m.weight
            sd[f"{prefix}.bias"] = m.bias
            sd[f"{prefix}.running_mean"] = m.running_mean
            sd[f"{prefix}.running_var"] = m.running_var

        for i in (1, 2, 3):
            sd[f"visual.conv{i}.weight"] = getattr(self, f"conv{i}").weight
            bn(f"visual.bn{i}", getattr(self, f"bn{i}"))
        for li in (1, 2, 3, 4):
            for bi, blk in enumerate(getattr(self, f"layer{li}")):
                p = f"visual.layer{li}.{bi}"
                sd[f"{p}.conv1.weight"] = blk.conv1.weight
                bn(f"{p}.bn1", blk.bn1)
                sd[f"{p}.conv2.weight"] = blk.conv2.weight
                bn(f"{p}.bn2", blk.bn2)
                sd[f"{p}.conv3.weight"] = blk.conv3.weight
                bn(f"{p}.bn3", blk.bn3)
                if blk.downsample is not None:
                    sd[f"{p}.downsample.0.weight"] = blk.downsample[1].weight
                    bn(f"{p}.downsample.1", blk.downsample[2])
        sd["visual.attnpool.positional_embedding"] = self.pos_emb
        for nm, lin in (("q_proj", self.q_proj), ("k_proj", self.k_proj),
                        ("v_proj", self.v_proj), ("c_proj", self.c_proj)):
            sd[f"visual.attnpool.{nm}.weight"] = lin.weight
            sd[f"visual.attnpool.{nm}.bias"] = lin.bias
        sd.update(text.text_state_dict())
        return {k: v.detach() for k, v in sd.items()}


class TorchLPIPSVgg(nn.Module):
    """VGG16-tap LPIPS replica (lpips 0.1.4 contract): ScalingLayer on [-1,1],
    unit-normalized diffs at relu{1_2,2_2,3_3,4_3,5_3}, non-negative 1x1
    heads, spatial+tap mean-sum."""

    LAYOUT = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
    TAPS = {1, 3, 6, 9, 12}

    def __init__(self):
        super().__init__()
        convs, cin = [], 3
        for c in self.LAYOUT:
            if c == "M":
                continue
            convs.append(nn.Conv2d(cin, c, 3, padding=1))
            cin = c
        self.convs = nn.ModuleList(convs)
        self.lins = nn.ParameterList(
            [nn.Parameter(torch.rand(c) * 0.1) for c in (64, 128, 256, 512, 512)]
        )
        self.register_buffer("shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def _taps(self, x):
        h = (x - self.shift) / self.scale
        taps, ci = [], 0
        for c in self.LAYOUT:
            if c == "M":
                h = F.max_pool2d(h, 2)
                continue
            h = F.relu(self.convs[ci](h))
            if ci in self.TAPS:
                taps.append(h)
            ci += 1
        return taps

    def forward(self, x, y):
        tx, ty = self._taps(x), self._taps(y)
        total = 0.0
        for a, b, w in zip(tx, ty, self.lins):
            # upstream lpips.normalize_tensor: x / (sqrt(sum(x^2)) + eps) —
            # eps OUTSIDE the sqrt (lpips 0.1.4 lpips/__init__.py; audited r5)
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb).pow(2)
            total = total + (d * w.view(1, -1, 1, 1)).sum(1).mean((1, 2))
        return total
