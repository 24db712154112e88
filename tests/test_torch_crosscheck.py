"""Numerical cross-validation against independent torch replicas
(tests/torch_ref_models.py): torch model -> ADM/CLIP-named state dict ->
cgd_tpu converter -> JAX forward must match the torch forward. Validates
layer math, weight layouts, and converter name mapping end-to-end
(SURVEY.md §7 build order #1)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.torch_ref_models import TorchADMUNet, TorchCLIPText, TorchCLIPViT


@pytest.mark.parametrize("new_order", [False, True])
@pytest.mark.parametrize("class_cond", [True, False])
def test_unet_forward_matches_torch(new_order, class_cond):
    from cgd_tpu.convert.torch_unet import convert_state_dict
    from cgd_tpu.models.unet import UNetConfig, apply_unet

    cfg = UNetConfig(
        image_size=32, model_channels=32, num_res_blocks=1,
        attention_ds=(2, 4), channel_mult=(1, 2), num_head_channels=16,
        num_classes=7 if class_cond else None,
        use_new_attention_order=new_order,
        use_scale_shift_norm=True,
    )
    torch.manual_seed(0)
    tm = TorchADMUNet(cfg).eval()
    x = torch.randn(2, 3, 32, 32)
    t = torch.tensor([5.0, 700.0])
    y = torch.tensor([1, 4]) if class_cond else None
    with torch.no_grad():
        ref = tm(x, t, y)

    sd = {k: v.numpy() for k, v in tm.adm_state_dict().items()}
    params = convert_state_dict(sd, cfg)
    ours = apply_unet(
        params, cfg,
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(t.numpy()),
        jnp.asarray(y.numpy()) if y is not None else None,
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=2e-4
    )


def test_unet_no_scale_shift_matches_torch():
    from cgd_tpu.convert.torch_unet import convert_state_dict
    from cgd_tpu.models.unet import UNetConfig, apply_unet

    cfg = UNetConfig(
        image_size=16, model_channels=32, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_head_channels=16,
        use_scale_shift_norm=False,
    )
    torch.manual_seed(1)
    tm = TorchADMUNet(cfg).eval()
    x = torch.randn(1, 3, 16, 16)
    t = torch.tensor([42.0])
    with torch.no_grad():
        ref = tm(x, t)
    params = convert_state_dict({k: v.numpy() for k, v in tm.adm_state_dict().items()}, cfg)
    ours = apply_unet(params, cfg, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), jnp.asarray(t.numpy()))
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=2e-4
    )


def test_clip_vit_and_text_match_torch():
    from cgd_tpu.convert.torch_clip import convert_state_dict
    from cgd_tpu.models.clip import encode_image, encode_text
    from cgd_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionViTConfig

    torch.manual_seed(2)
    vit = TorchCLIPViT(res=32, patch=8, width=64, layers=2, heads=2, embed_dim=24).eval()
    txt = TorchCLIPText(vocab=96, ctx=12, width=48, heads=2, layers=2, embed_dim=24).eval()

    imgs = torch.randn(2, 3, 32, 32)
    tokens = torch.zeros(2, 12, dtype=torch.long)
    tokens[0, :3] = torch.tensor([94, 7, 95])
    tokens[1, :5] = torch.tensor([94, 3, 3, 3, 95])
    with torch.no_grad():
        ref_img = vit(imgs)
        ref_txt = txt(tokens)

    cfg = CLIPConfig(
        "x", 24, VisionViTConfig(32, 8, 64, 2, 2),
        TextConfig(context_length=12, vocab_size=96, width=48, heads=2, layers=2),
    )
    sd = {k: v.numpy() for k, v in vit.clip_state_dict(txt).items()}
    params = convert_state_dict(sd, cfg)

    ours_img = encode_image(params, cfg, jnp.asarray(imgs.permute(0, 2, 3, 1).numpy()))
    ours_txt = encode_text(params, cfg, jnp.asarray(tokens.numpy().astype(np.int32)))
    np.testing.assert_allclose(np.asarray(ours_img), ref_img.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_txt), ref_txt.numpy(), atol=2e-4, rtol=2e-4)


def test_clip_resnet_matches_torch():
    from cgd_tpu.convert.torch_clip import convert_state_dict
    from cgd_tpu.models.clip import encode_image
    from cgd_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionResNetConfig

    from tests.torch_ref_models import TorchModifiedResNet

    torch.manual_seed(3)
    width, res, embed = 16, 64, 24
    rn = TorchModifiedResNet((1, 1, 1, 1), width, res, embed, heads=8).eval()
    txt = TorchCLIPText(vocab=96, ctx=12, width=48, heads=2, layers=1, embed_dim=embed).eval()
    # give BN stats non-trivial values (random init leaves mean 0 / var 1)
    with torch.no_grad():
        for m in rn.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)

    imgs = torch.randn(2, 3, res, res)
    with torch.no_grad():
        ref = rn(imgs)

    cfg = CLIPConfig(
        "rn", embed, VisionResNetConfig(res, width, (1, 1, 1, 1), heads=8),
        TextConfig(context_length=12, vocab_size=96, width=48, heads=2, layers=1),
    )
    sd = {k: v.numpy() for k, v in rn.rn_state_dict(txt).items()}
    params = convert_state_dict(sd, cfg)
    ours = encode_image(params, cfg, jnp.asarray(imgs.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=3e-4, rtol=3e-4)


def test_lpips_matches_torch():
    from cgd_tpu.models.vgg_lpips import lpips_distance

    from tests.torch_ref_models import TorchLPIPSVgg

    torch.manual_seed(4)
    tm = TorchLPIPSVgg().eval()
    x = torch.rand(2, 3, 64, 64) * 2 - 1
    y = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        ref = tm(x, y)

    params = {
        "convs": [
            {"kernel": c.weight.detach().permute(2, 3, 1, 0).numpy(),
             "bias": c.bias.detach().numpy()}
            for c in tm.convs
        ],
        "lins": [{"kernel": w.detach().numpy()[:, None]} for w in tm.lins],
    }
    ours = lpips_distance(
        params,
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(y.permute(0, 2, 3, 1).numpy()),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4, rtol=2e-4)
