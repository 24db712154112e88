"""LPIPS(net='vgg') converter: torchvision VGG16 + lpips linear heads.

The reference instantiates lpips.LPIPS(net='vgg') (cgd/cgd.py:146-148);
its weights = torchvision VGG16 features + the bundled vgg.pth 1x1 linear
heads. Both are fetched on demand here (network required once), then cached
as a flat npz by cgd_tpu.weights.resolve_lpips.
"""

from __future__ import annotations

import numpy as np

from cgd_tpu.io_utils.download import CACHE_PATH, download

VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
# lpips 0.1.4 bundled linear weights (master branch path, v0.1 weights)
LPIPS_VGG_URL = (
    "https://github.com/richzhang/PerceptualSimilarity/raw/master/lpips/weights/v0.1/vgg.pth"
)


def convert_lpips(vgg_path: str = None, lin_path: str = None):
    import torch

    if vgg_path is None:
        vgg_path = download(VGG16_URL, "vgg16-397923af.pth", CACHE_PATH)
    if lin_path is None:
        lin_path = download(LPIPS_VGG_URL, "lpips_vgg_v0.1.pth", CACHE_PATH)

    vgg_sd = torch.load(vgg_path, map_location="cpu")
    lin_sd = torch.load(lin_path, map_location="cpu")

    # torchvision vgg16: features.{0,2,5,7,10,12,14,17,19,21,24,26,28}.weight
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    convs = []
    for cid in conv_ids:
        w = vgg_sd[f"features.{cid}.weight"].numpy().astype(np.float32)
        b = vgg_sd[f"features.{cid}.bias"].numpy().astype(np.float32)
        convs.append({"kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b})

    lins = []
    for i in range(5):
        w = lin_sd[f"lin{i}.model.1.weight"].numpy().astype(np.float32)  # [1,C,1,1]
        lins.append({"kernel": w[0, :, 0, 0][:, None]})
    return {"convs": convs, "lins": lins}
