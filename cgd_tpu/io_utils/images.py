"""Frame/image persistence with the reference's output-tree contract
(cgd/script_util.py:81-101): outputs/<prompt-slug>/<batch:02>/<step:04>.png
plus a `current.png` in the CWD at every save."""

from __future__ import annotations

import os
import re
from typing import List

import numpy as np


def alphanumeric_filter(s: str) -> str:
    return re.sub(r"[^\w\s]", "", s).replace(" ", "_")


def clean_and_combine_prompts(base_path, txts: List[str], batch_idx: int, max_length: int = 255) -> str:
    slug = "_".join(alphanumeric_filter(t) for t in txts)[:max_length]
    return os.path.join(str(base_path), slug, f"{batch_idx:02}")


def to_pil_image(image_hwc: np.ndarray):
    """[-1,1] float HWC -> PIL RGB (clamped)."""
    from PIL import Image

    arr = np.asarray(image_hwc, dtype=np.float32)
    arr = np.clip((arr + 1.0) / 2.0, 0.0, 1.0)
    return Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8))


def log_image(
    image_hwc: np.ndarray, base_path, txts: List[str], current_step: int,
    batch_idx: int, use_async: bool = False,
) -> str:
    """Save a frame + current.png. With ``use_async`` the PNG encode/write
    runs on the native C++ writer's background threads (native/
    frame_writer.cpp) — callers must ``flush_frames()`` before reading the
    files (the CLI does, before ffmpeg muxing)."""
    dirname = clean_and_combine_prompts(base_path, txts, batch_idx)
    os.makedirs(dirname, exist_ok=True)
    filename = os.path.join(dirname, f"{current_step:04}.png")
    if use_async:
        from cgd_tpu.io_utils import native_frameio

        arr = np.asarray(image_hwc, dtype=np.float32)
        u8 = (np.clip((arr + 1.0) / 2.0, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        if native_frameio.submit_png(u8, filename):
            native_frameio.submit_png(u8, os.path.join(os.getcwd(), "current.png"))
            return str(filename)
        # native writer unavailable -> fall through to PIL
    pil = to_pil_image(image_hwc)
    pil.save(os.path.join(os.getcwd(), "current.png"))
    pil.save(filename)
    return str(filename)


def flush_frames() -> None:
    """Block until all async frame writes are durable."""
    from cgd_tpu.io_utils import native_frameio

    native_frameio.flush()


def load_image_rgb(path_or_url, size) -> np.ndarray:
    """Open local path or URL, RGB, resize to (size,size) — or (w,h) when
    ``size`` is a tuple — return [-1,1] float32 HWC (reference init-image
    handling: cgd/cgd.py:116-120)."""
    from PIL import Image

    from cgd_tpu.io_utils.download import fetch

    wh = (size, size) if isinstance(size, int) else tuple(size)
    pil = Image.open(fetch(path_or_url)).convert("RGB").resize(wh)
    arr = np.asarray(pil, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0
