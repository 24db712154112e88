"""SPMD partitioning for the Pallas direct conv3x3 kernels.

Round-1/2 gap: ``pallas_call`` has no partitioning rules, so mesh-sharded
runs (batch/cutout data parallelism, and the spatial height-split UNet of
``parallel/mesh.py:spatial_sharding``) fell back to XLA's convs. This module
closes it with ``jax.experimental.custom_partitioning``:

- batch-dim sharding partitions trivially (the kernel's grid leads with B);
- height-dim sharding becomes a one-row halo exchange over the mesh axis
  (``lax.ppermute`` — rides ICI) followed by the same kernel in
  ``explicit_halo`` mode: each shard receives its neighbors' boundary rows
  (post-activation for the GN/SiLU-fused variants) and uses them instead of
  the zero pad at its local H edges. ppermute zero-fills the unpaired edges,
  which is exactly the conv pad=1 boundary at the true image top/bottom.
- W / channel / kernel dims are declared need-replication; Shardy reshards
  any such incoming sharding instead of mis-partitioning the kernel.

The partition callbacks run in the *client* process at compile time; the
axon remote-compile path cannot resolve them, so this route is only taken
when a mesh is explicitly in play (api.py / tests) — the single-chip
headline path stays on the plain kernels in ``conv_pallas``.

Reference: this whole axis is beyond /root/reference (single-GPU torch);
SURVEY.md §2c / §5.7 name it as the TPU-native scale-out design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    # Shardy sharding rules only have a private-path constructor today; a
    # JAX upgrade may move/remove it. Degrading to the plain differentiable
    # XLA composition (below) keeps mesh runs *working* — they just lose the
    # explicit-ppermute Pallas conv path until the import is re-pointed.
    from jax._src.custom_partitioning_sharding_rule import (  # noqa: private
        str_to_sdy_sharding_rule,
    )
except ImportError:  # pragma: no cover - exercised by tests via monkeypatch
    str_to_sdy_sharding_rule = None

from cgd_tpu.kernels.conv_pallas import (
    _conv3x3_pallas,
    _fused_bwd_common,
    _xla_conv,
    conv3x3_available,
)


def _act_rows(rows, A, B):
    """Mirror the kernel's prologue exactly: silu(rows*A + B) in f32, cast
    back to the activation dtype (bit-consistent with in-kernel act)."""
    pre = rows.astype(jnp.float32) * A[:, None, None, :] + B[:, None, None, :]
    return (pre * jax.nn.sigmoid(pre)).astype(rows.dtype)


def _xla_reference(x, w, bias, A, B, skip, etop, ebot):
    """Exact fallback for local shapes the Pallas kernel rejects (tiny
    shards): same math, XLA ops, explicit-halo aware."""
    if A is not None:
        x = _act_rows(x, A, B)
    if etop is not None:
        x = jnp.concatenate([etop.astype(x.dtype), x, ebot.astype(x.dtype)], axis=1)
        pad = ((0, 0), (1, 1))
    else:
        pad = ((1, 1), (1, 1))
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    out = out + bias.astype(out.dtype)
    return out + skip.astype(out.dtype) if skip is not None else out


def _axis_size(mesh, axis):
    import numpy as np

    if isinstance(axis, (tuple, list)):
        return int(np.prod([mesh.shape[a] for a in axis]))
    return mesh.shape[axis]


def _split_spec(arg_infos):
    """(batch_axes, height_axis) from the x operand's incoming sharding.
    Multi-axis height sharding is unsupported -> H gets replicated."""
    sh = arg_infos[0].sharding
    spec = sh.spec if sh is not None else P()
    b = spec[0] if len(spec) > 0 else None
    h = spec[1] if len(spec) > 1 else None
    if isinstance(h, (tuple, list)):
        h = h[0] if len(h) == 1 else None
    return b, h


def _make_partition(kind):
    def partition(mesh, arg_infos, result_infos):
        del result_infos
        b_ax, h_ax = _split_spec(arg_infos)
        x4 = NamedSharding(mesh, P(b_ax, h_ax, None, None))
        rep = NamedSharding(mesh, P())
        vec = NamedSharding(mesh, P(b_ax, None))
        if kind == "plain":
            arg_shardings = (x4, rep, rep)
        elif kind == "gn":
            arg_shardings = (x4, vec, vec, rep, rep)
        else:
            arg_shardings = (x4, vec, vec, rep, rep, x4)

        def lower_fn(*args):
            if kind == "plain":
                (x, w, bias), A, B, skip = args, None, None, None
            elif kind == "gn":
                (x, A, B, w, bias), skip = args, None
            else:
                x, A, B, w, bias, skip = args
            etop = ebot = None
            if h_ax is not None and _axis_size(mesh, h_ax) > 1:
                n = _axis_size(mesh, h_ax)
                top_row, bot_row = x[:, :1], x[:, -1:]
                if A is not None:
                    top_row = _act_rows(top_row, A, B)
                    bot_row = _act_rows(bot_row, A, B)
                # my bottom row -> next shard's top halo; zero-filled at edges
                etop = jax.lax.ppermute(bot_row, h_ax, [(i, i + 1) for i in range(n - 1)])
                ebot = jax.lax.ppermute(top_row, h_ax, [(i + 1, i) for i in range(n - 1)])
            # CPU backends (virtual-mesh tests, dryrun_multichip): the TPU
            # kernel cannot run, and interpret mode's io_callbacks cannot be
            # lowered inside a partition body — use the exact XLA fallback.
            # The explicit-halo kernel path itself is pinned single-device in
            # tests/test_pallas_conv.py.
            if jax.default_backend() == "cpu" or not conv3x3_available(
                x.shape, w.shape, 1, ((1, 1), (1, 1)),
                itemsize=jnp.dtype(x.dtype).itemsize,  # f32 LPIPS convs need
                # f32-sized VMEM plans — 2-byte default OOMs (ADVICE r2)
            ):
                return _xla_reference(x, w, bias, A, B, skip, etop, ebot)
            return _conv3x3_pallas(x, w, bias, A=A, B=B, skip=skip, etop=etop, ebot=ebot)

        out_sharding = x4
        return mesh, lower_fn, out_sharding, arg_shardings

    return partition


def _make_infer(kind):
    del kind

    def infer_sharding_from_operands(mesh, arg_infos, result_infos):
        del result_infos
        b_ax, h_ax = _split_spec(arg_infos)
        return NamedSharding(mesh, P(b_ax, h_ax, None, None))

    return infer_sharding_from_operands


if str_to_sdy_sharding_rule is not None:
    _RULES = {
        # factors: b,h shard-through (h via the halo exchange — a permutation
        # factor); everything else must be replicated for this kernel.
        "plain": str_to_sdy_sharding_rule(
            "b h w i, p q j o, o -> b h w o",
            need_replication_factors=("w", "i", "p", "q", "j", "o"),
            permutation_factors=("h",),
        ),
        "gn": str_to_sdy_sharding_rule(
            "b h w i, b i, b i, p q j o, o -> b h w o",
            need_replication_factors=("w", "i", "p", "q", "j", "o"),
            permutation_factors=("h",),
        ),
        "gn_add": str_to_sdy_sharding_rule(
            "b h w i, b i, b i, p q j o, o, b h w o -> b h w o",
            need_replication_factors=("w", "i", "p", "q", "j", "o"),
            permutation_factors=("h",),
        ),
    }
else:
    _RULES = None

# Degraded bodies when the Shardy rule constructor is unavailable: the same
# math as pure XLA ops — natively partitionable and differentiable, so a JAX
# bump loses only the explicit-ppermute Pallas path, never importability.
_XLA_BODIES = {
    "plain": lambda x, w, bias: _xla_reference(x, w, bias, None, None, None, None, None),
    "gn": lambda x, A, B, w, bias: _xla_reference(x, w, bias, A, B, None, None, None),
    "gn_add": lambda x, A, B, w, bias, skip: _xla_reference(
        x, w, bias, A, B, skip, None, None
    ),
}


def _make_partitioned(kind, fn):
    if _RULES is None:
        return _XLA_BODIES[kind]
    cp = custom_partitioning(fn)
    cp.def_partition(
        infer_sharding_from_operands=_make_infer(kind),
        partition=_make_partition(kind),
        sharding_rule=_RULES[kind],
    )
    return cp


_p_plain = _make_partitioned("plain", lambda x, w, bias: _conv3x3_pallas(x, w, bias))
_p_gn = _make_partitioned(
    "gn", lambda x, A, B, w, bias: _conv3x3_pallas(x, w, bias, A=A, B=B)
)
_p_gn_add = _make_partitioned(
    "gn_add",
    lambda x, A, B, w, bias, skip: _conv3x3_pallas(x, w, bias, A=A, B=B, skip=skip),
)


# --- public ops: same contracts as conv_pallas.conv3x3* but partitionable ---


@jax.custom_vjp
def conv3x3(x, w, bias):
    """SPMD-partitionable 3x3 stride-1 pad-1 NHWC Pallas conv, bias fused."""
    return _p_plain(x, w, bias)


def _conv3x3_fwd(x, w, bias):
    return _p_plain(x, w, bias), (x, w)


def _conv3x3_bwd(res, g):
    x, w = res
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = _p_plain(g, wt.astype(w.dtype), jnp.zeros((w.shape[2],), w.dtype))
    _, w_vjp = jax.vjp(lambda w_: _xla_conv(x, w_), w)
    (dw,) = w_vjp(g.astype(x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx, dw, db


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


@jax.custom_vjp
def conv3x3_gn_silu(x, A, B, w, bias):
    """SPMD conv3x3(silu(x*A+B)) + bias (see conv_pallas.conv3x3_gn_silu)."""
    return _p_gn(x, A, B, w, bias)


def _gn_fwd(x, A, B, w, bias):
    return _p_gn(x, A, B, w, bias), (x, A, B, w)


def _gn_bwd(res, g):
    return _fused_bwd_common(*res, g, conv_fn=_p_plain)


conv3x3_gn_silu.defvjp(_gn_fwd, _gn_bwd)


@jax.custom_vjp
def conv3x3_gn_silu_add(x, A, B, w, bias, skip):
    """SPMD conv3x3(silu(x*A+B)) + bias + skip."""
    return _p_gn_add(x, A, B, w, bias, skip)


def _gn_add_fwd(x, A, B, w, bias, skip):
    return _p_gn_add(x, A, B, w, bias, skip), (x, A, B, w)


def _gn_add_bwd(res, g):
    dx, dA, dB, dw, db = _fused_bwd_common(*res, g, conv_fn=_p_plain)
    return dx, dA, dB, dw, db, g


conv3x3_gn_silu_add.defvjp(_gn_add_fwd, _gn_add_bwd)
