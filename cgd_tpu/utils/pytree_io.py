"""Flat .npz (de)serialization for parameter pytrees.

Converted checkpoints are stored as npz with '/'-joined tree paths — a
portable, mmap-friendly format with no torch dependency at load time.
(The reference keeps torch .pt checkpoints and loads them with torch;
SURVEY.md §5.4 recommends a convert-once cache for the TPU rebuild.)
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        if hasattr(tree, "shape"):
            out[prefix[:-1]] = np.asarray(tree)
        else:
            out[prefix[:-1]] = np.asarray(tree)  # python scalars (e.g. stride)
    return out


def save_pytree(path: str, tree: Any) -> None:
    # write through an open handle: np.savez(str_path) silently appends
    # ".npz" when the name doesn't end with it, which de-synced the write
    # path from the cache-hit check (found by tests/test_checkpoint_formats
    # — the convert-once cache never hit before this fix)
    with open(path, "wb") as f:
        np.savez(f, **_flatten(tree))


def load_pytree_like(path: str, template: Any) -> Any:
    """Load an npz into the structure of ``template`` (paths must match)."""
    data = np.load(path)

    def build(sub, prefix=""):
        if isinstance(sub, dict):
            return {k: build(v, f"{prefix}{k}/") for k, v in sub.items()}
        if isinstance(sub, (list, tuple)):
            return [build(v, f"{prefix}{i}/") for i, v in enumerate(sub)]
        key = prefix[:-1]
        arr = data[key]
        if hasattr(sub, "shape"):
            if tuple(arr.shape) != tuple(sub.shape):
                raise ValueError(f"shape mismatch at {key}: {arr.shape} vs {sub.shape}")
            return arr
        return sub.__class__(arr)  # python scalar leaf

    return build(template)
