"""Device mesh + sharding policy.

The reference is single-device (SURVEY.md §2c: no distributed code reachable
from the sampling path); the TPU-native scale-out axes are the ones the
workload actually exposes:

- ``data``: the sample batch axis (B) — pure data parallelism;
- ``cut``: the cutout axis (K*B) feeding CLIP's image encoder — the dominant
  FLOPs of a guided step. Sharding the cutout batch across ICI makes XLA
  all-reduce the guidance gradient wrt x_in (a psum over 'cut') — exactly
  the BASELINE.json north-star layout.

Everything rides jit + NamedSharding constraints: the partitioner inserts the
collectives; no hand-written NCCL/MPI analog exists or is needed
(SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    data: int = 1,
) -> Mesh:
    """1-or-2-axis mesh ('data', 'cut') over the given (default: all) devices.

    ``data`` devices are assigned to the batch axis; the rest shard cutouts.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % data == 0, (n, data)
    arr = np.asarray(devices).reshape(data, n // data)
    return Mesh(arr, ("data", "cut"))


def mesh_from_spec(spec: Optional[str], devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """Build a mesh from a CLI-style spec string (the `--mesh` flag on the
    CLI and serve daemon — the product surface for multi-chip runs; the
    reference's CLI is its product surface, cgd/cgd.py:286-434, so ours must
    reach the mesh too).

    Grammar:
      None / ""        -> None (single-device run)
      "auto"           -> all visible devices, data=1 (cutouts + UNet height
                          sharded over every chip); None if only one device
      "data=N"         -> N-way batch data parallelism; the remaining factor
                          of the device count shards cutouts/height
      "cut=M"          -> data=1 over the first M devices
      "data=N,cut=M"   -> explicit axis sizes over the first N*M devices
    """
    if not spec:
        return None
    devices = list(devices if devices is not None else jax.devices())
    if spec == "auto":
        return make_mesh(devices, data=1) if len(devices) > 1 else None
    sizes = {}
    for part in spec.split(","):
        key, _, val = part.partition("=")
        key, val = key.strip(), val.strip()
        if key not in ("data", "cut") or not val.isdigit() or int(val) < 1:
            raise ValueError(
                f"bad --mesh spec {spec!r}: expected 'auto', 'data=N', "
                "'cut=M', or 'data=N,cut=M'"
            )
        sizes[key] = int(val)
    data = sizes.get("data", 1)
    if "cut" in sizes:
        need = data * sizes["cut"]
        if need > len(devices):
            raise ValueError(
                f"--mesh {spec!r} needs {need} devices but only "
                f"{len(devices)} are visible"
            )
        devices = devices[:need]
    elif len(devices) % data != 0:
        raise ValueError(
            f"--mesh {spec!r}: device count {len(devices)} is not divisible "
            f"by data={data}"
        )
    return make_mesh(devices, data=data)


def cutout_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the [K*B, cut, cut, C] cutout batch: split the leading
    axis over every mesh device (data axis included — cutouts of different
    batch elements are independent work)."""
    return NamedSharding(mesh, P(("data", "cut"), None, None, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, H, W, C] sample tensors: batch over 'data'."""
    return NamedSharding(mesh, P("data", None, None, None))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B,H,W,C] activations with the image HEIGHT split over
    the 'cut' axis (sequence/spatial parallelism for the UNet): XLA's
    partitioner inserts halo exchanges for the 3x3 convs and all-gathers at
    the (low-resolution, cheap) attention blocks. Scales 512px+ generation
    past one chip's conv throughput — the post-north-star axis SURVEY.md §5.7
    names."""
    return NamedSharding(mesh, P("data", "cut", None, None))


def shard_params_replicated(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh (weights fit per-chip for
    every reference checkpoint; tensor parallelism is not needed below 512px
    — SURVEY.md §5.7)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)
