"""Direct 3x3 stride-1 NHWC convolution as a Pallas TPU kernel.

Why: at batch 1, XLA:TPU rewrites the UNet's large spatial convs with a
space-to-batch pass — the MXU work itself runs at ~193 TF/s, but the
surrounding plumbing (pad / slice / layout copies) costs ~25 ms per guided
step at the 256px operating point (hlo_stats r2 profile: "data formatting"
22.5% + copy 6.8% + slice 3.2% + pad 1.6% of step time). This kernel
computes the convolution in place on the NHWC layout: each program streams
its unpadded TH-row block plus two single-row neighbor windows (plain
Blocked BlockSpecs whose index maps are clamped at the image edges; the
clamped duplicates are zeroed in kernel, which is exactly pad-1 semantics)
through the normal Pallas pipeline — the remote Mosaic compiler rejects
manual multi-dim-strided DMAs from HBM refs (bisected 2026-08-16), so no
hand-rolled copies. The 3x3 taps become nine [TH*W, Cin] x [Cin, TCO] MXU
matmuls accumulated in f32 — no space-to-batch, no layout conversion, bias
fused into the output write.

Every 3x3 conv in the real ADM checkpoints is stride-1 pad-1 (downsampling
is avg-pool inside ResBlocks, resblock_updown flags in
/root/reference/data/diffusion_model_flags.py), so this one kernel covers
the whole UNet hot path. 1x1 convs are plain matmuls and stay with XLA.

Gradient: input-gradient of a stride-1 pad-1 3x3 conv is the same conv with
spatially flipped, in/out-transposed weights — also this kernel. The weight
and bias gradients are computed with XLA in the custom_vjp backward (exact;
DCE'd in the sampling path, which differentiates w.r.t. the image only).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W_BYTES_BUDGET = 4 * 1024 * 1024  # per-block weight bytes (double-buffered)


def _pick_tco(cin: int, cout: int, itemsize: int = 2):
    """Cout tile + the (possibly padded) Cout it tiles.

    Prefers a tile that divides cout exactly (a multiple of 128 per Mosaic's
    last-dim block rule, or the full cout); otherwise pads cout up to a
    multiple of the largest budget-fitting 128-tile (e.g. the 64px model's
    576-channel convs -> tiled as 5x128 over 640, sliced after). Returns
    None only when even a 128 tile's [3,3,Cin,128] weight block exceeds the
    VMEM budget. ``itemsize``: activation/weight bytes — the LPIPS VGG runs
    its convs in f32 (OOM'd with 2-byte sizing, measured 2026-08-17)."""
    def fits(c):
        return 9 * cin * c * itemsize <= _W_BYTES_BUDGET

    for c in [cout] + [512, 384, 256, 128]:
        if 0 < c <= cout and cout % c == 0 and (c % 128 == 0 or c == cout) and fits(c):
            return c, cout
    for c in (512, 384, 256, 128):
        if fits(c):
            return c, -(-cout // c) * c
    return None


def _pick_th(h: int, w: int, cin: int, tco: int, resample: str = "",
             itemsize: int = 2) -> int:
    """Row-window height (OUTPUT space): big enough that the [TH*W, Cin]
    matmul fills the MXU, small enough that the x block stream (double-
    buffered) + the in-kernel halo'd copy (th+2, W+2, cin) + f32 acc fit
    VMEM comfortably. The 'down' fused resample streams 4x the source
    pixels per output block."""
    xf = 1  # ('down' fused resample was removed — Mosaic cannot lower it)
    th = 8
    while th < h and th * w < 2048:
        nth = th * 2
        if h % nth != 0:
            break
        use = (3 * xf * (nth + 2) * (w + 2) * cin * itemsize
               + nth * w * tco * (4 + itemsize))
        if use > 8 * 1024 * 1024:
            break
        th = nth
    return th


def _fwd_vmem_estimate(th, w, cin, tco, z, resample="", has_skip=False,
                       prologue=True) -> float:
    """Scoped-VMEM estimate (bytes) for _conv_kernel: the in-kernel halo'd
    copy + f32 accumulator on the stack, plus the double-buffered streamed
    blocks. Calibrated against measured axon OOMs (2026-08-17): plain
    th8/w512/cin256/tco256 -> est 18.6M vs actual 18.11M; the known-good
    th8/w256/cin512/tco256 -> est 16.8M ran within the 16M limit."""
    if resample == "up":
        src_px, hrow_px = th * w // 4, w // 2
        # row- and col-duplication each materialize a block-sized copy
        # (measured 16.43M OOM at 128^2 ci512 without this; the same shape
        # runs at the tco this term forces — on-device val 2026-08-17)
        extra = 3 * th * w * cin * z
    else:
        src_px, hrow_px = th * w, w
        extra = 0
    if prologue and not resample:
        # the GN/SiLU prologue's f32 pre/sigmoid temporaries on the window
        # (anchors: 512^2 ci256 skip est 14.6M OOM'd at 17.88M; 128x144
        # ci768 est 15.4M OOM'd at 18.95M — both close once th*w*cin f32
        # is added; the 'up' variant's own extra term already covers it)
        extra += th * w * cin * 4
    stack = (th + 2) * (w + 2) * cin * z + th * w * tco * 4 + extra
    pipe = 2 * (src_px * cin * z + 2 * hrow_px * cin * z
                + 9 * cin * tco * z + th * w * tco * z)
    if has_skip:
        pipe += 2 * th * w * tco * z
    return stack + pipe


_FWD_VMEM_LIMIT = 17.0 * 1024 * 1024  # est-space cap (~16M actual, see above)

# Plans proven on-device that the (necessarily conservative) estimate now
# rejects — the estimate's residual error is not monotone across shapes, so
# these measured facts beat the model. Keyed (th, w, cin, tco, z, resample,
# has_skip): the 256^2 ci512 GN-prologue conv ran at tco=256 through full
# 250-step benches (10.086 s/image run, 2026-08-17) before the prologue
# act-temp term demoted it.
_MEASURED_SAFE = {
    (8, 256, 512, 256, 2, "", False),
}


def validate_measured_safe():
    """Compile + run every _MEASURED_SAFE plan on the current backend.

    The allowlist records on-device measured facts that override the VMEM
    estimate, and nothing invalidates them automatically when the kernel
    layout or the planner changes (VERDICT r2 weak #3). bench.py calls this
    before timing on accelerator backends, so a stale entry fails loudly
    up front (planner-selection mismatch here, or Mosaic scoped-VMEM OOM at
    the compile below) instead of mid-bench. The planner-selection half also
    runs on CPU in tests/test_pallas_conv.py.
    """
    for key in sorted(_MEASURED_SAFE):
        th, w, cin, tco, z, resample, has_skip = key
        # h=th keeps _pick_th at the entry's th for the current entries; a
        # future entry with th>8 must extend this to pick its real h
        plan = _plan_fwd(th, w, cin, tco, z, resample=resample,
                         has_skip=has_skip)
        # the measured fact is the (tco, th) tile; cout_p is derived padding
        # and may legitimately differ from tco (e.g. 5x128 tilings)
        if plan is None or (plan[0], plan[2]) != (tco, th):
            raise AssertionError(
                f"_MEASURED_SAFE entry {key} is stale: _plan_fwd now "
                f"selects {plan}; re-measure on device or drop the entry"
            )
        if jax.default_backend() == "cpu":
            continue  # Mosaic kernels cannot compile on CPU
        dtype = jnp.bfloat16 if z == 2 else jnp.float32
        h_src = th // 2 if resample == "up" else th
        x = jnp.zeros((1, h_src, w, cin), dtype)
        wgt = jnp.zeros((3, 3, cin, tco), dtype)
        bias = jnp.zeros((tco,), dtype)
        A = jnp.ones((1, cin), jnp.float32)
        B = jnp.zeros((1, cin), jnp.float32)
        skip = jnp.zeros((1, th, w, tco), dtype) if has_skip else None
        out = jax.jit(
            functools.partial(_conv3x3_pallas, resample=resample)
        )(x, wgt, bias, A=A, B=B, skip=skip)
        jax.block_until_ready(out)


def _plan_fwd(h, w, cin, cout_padded, z, resample="", has_skip=False,
              prologue=True):
    """(tco, cout_p, th) for the forward kernel, shrinking the Cout tile
    until the program fits scoped VMEM; None if nothing fits (callers fall
    back to XLA via the availability gates)."""
    picked = _pick_tco(cin, cout_padded, z)
    if picked is None:
        return None
    tco, cout_p = picked
    for c in [tco] + [t for t in (512, 384, 256, 128) if t < tco]:
        if cout_p % c or (c % 128 and c != cout_p):
            continue
        th = _pick_th(h, w, cin, c, resample, z)
        # prologue plans with th=16 and fat act temporaries blow past the
        # estimate (measured: 64x72 ci768 th16 est 13.6M, actual 17.07M;
        # 16^2 ci1024 th16 at 1.05M of temps runs fine) — cap th at 8 when
        # the f32 act temps would exceed ~3M
        if prologue and not resample and th > 8 and th * w * cin * 4 >= 3 * 1024 * 1024:
            th = 8
        if h % th:
            continue
        if (th, w, cin, c, z, resample, has_skip) in _MEASURED_SAFE:
            return c, cout_p, th
        if _fwd_vmem_estimate(th, w, cin, c, z, resample, has_skip,
                              prologue) <= _FWD_VMEM_LIMIT:
            return c, cout_p, th
    return None


def _dx_vmem_estimate(th, w, cin, tco, itemsize=2) -> int:
    """Scoped-VMEM estimate for _conv_dx_kernel: streamed blocks (double-
    buffered) + the in-kernel f32 temporaries. Mosaic keeps ~3 of the f32
    epilogue temps (acc/xs/pre/sig/dpre) live at once — calibrated against
    the measured 17.2 MB OOM at (th=8, w=256, cin=256, tco=512)."""
    z = itemsize
    stack = (th + 2) * (w + 2) * cin * z + 3 * th * w * tco * 4 + th * w * tco * z
    pipe = 2 * (th * w * cin * z + 2 * w * cin * z + 9 * cin * tco * z
                + 2 * th * w * tco * z)
    return stack + pipe


def _dx_wtiled_vmem_estimate(th, tw, cin, tco, itemsize=2) -> int:
    """Scoped-VMEM estimate for _conv_dx_kernel_wtiled: the in-kernel
    assembled (th+2, tw+2) halo copy + f32 epilogue temporaries on the
    stack, plus the nine double-buffered halo streams (main, 2 rows,
    2 8-column sides, 4 corners)."""
    z = itemsize
    stack = (th + 2) * (tw + 2) * cin * z + 3 * th * tw * tco * 4 + th * tw * tco * z
    pipe = 2 * ((th * tw + 2 * tw + 16 * th + 32) * cin * z
                + 9 * cin * tco * z + 2 * th * tw * tco * z + 8 * tco * 4)
    return stack + pipe


def _pick_dx_tiles(h, w, cin, cout, itemsize=2):
    """(tco, cout_p, tw) for the fused-backward kernel. Starts from
    _pick_tco's choice, then shrinks the Cout tile until the whole program —
    including the five f32 temporaries the epilogue keeps live — fits the
    16 MB scoped-VMEM limit (measured OOM at 17.2 MB with tco=512 at
    256^2x256, axon remote compile 2026-08-17). ``tw=None`` selects the
    proven full-W kernel; otherwise the W-tiled Element-window variant
    (round 3: admits the 256^2 ci256->co512 and 512^2 classes whose full-W
    streams blow VMEM — previously on the composition fallback).
    Returns (None, None, None) if nothing fits."""
    picked = _pick_tco(cin, cout, itemsize)
    if picked is None:
        return None, None, None
    tco, cout_p = picked
    candidates = [tco] + [c for c in (512, 384, 256, 128) if c < tco]
    for c in candidates:
        if cout_p % c or (c % 128 and c != cout_p):
            continue
        th = _pick_th(h, w, cin, c, itemsize=itemsize)
        if _dx_vmem_estimate(th, w, cin, c, itemsize) <= 12 * 1024 * 1024:
            return c, cout_p, None
    if os.environ.get("CGD_TPU_DX_WTILED") != "1":
        # Default OFF (opt-in): an on-device A/B at 512px ddim50 (2026-08-17)
        # measured identical steady-state with and without the W-tiled dx
        # kernel (4.357 vs 4.350 s / 50 guided steps — the admitted dx convs
        # overlap the MXU pipeline either way) while the nine-stream Mosaic
        # kernels added +554 s of remote compile (935.6 vs 381.7 s cold).
        # The composition fallback is the better default until a shape class
        # appears where these dx convs are critical-path.
        return None, None, None
    for c in candidates:
        if cout_p % c or (c % 128 and c != cout_p):
            continue
        for tw in (256, 128, 64):
            # tw multiple of 8 keeps the sublane-dim Element offsets aligned
            if tw >= w or w % tw or h % 8:
                continue
            if _dx_wtiled_vmem_estimate(8, tw, cin, c, itemsize) <= 12 * 1024 * 1024:
                return c, cout_p, tw
    return None, None, None


def _conv_kernel(*refs, th, w_dim, cin, nblk, prologue, has_skip,
                 explicit_halo=False, resample=""):
    """One program: rows [i*TH, i*TH+TH) of one batch, one Cout tile.

    The halo is assembled IN KERNEL (no host jnp.pad — that cost ~2 ms/step
    of pure HBM traffic at the 256px operating point): x_ref is the
    unpadded TH-row block, top_ref/bot_ref are the single neighbor rows
    (index maps clamped at the image edges; the clamped duplicates are
    zeroed here, which is exactly conv pad=1 semantics). The W halo is two
    zero columns concatenated in VMEM — Mosaic handles the unaligned
    sublane concat the same way it handles the dx-shifted slices below.
    The nine taps collapse (rows, cols) to matmul rows.

    ``prologue``: fuse the ResBlock's GroupNorm-apply + SiLU into the
    window load — act = silu(x*A + B) with per-(batch,channel) f32 A/B
    (GN stats/params and the emb scale-shift folded outside; halo rows
    are zeroed AFTER activation, which is the conv-pad-of-the-activation
    semantics the unfused path has). Saves one full HBM write+read of the
    activation tensor per conv.
    ``has_skip``: fuse a residual add into the output write (epilogue).
    ``explicit_halo``: SPMD spatial sharding — two extra [1, W, Cin] operands
    carry the neighbor shard's boundary rows (POST-activation; zero-filled by
    ppermute at the true image edges), used instead of the zeroed clamp rows
    at this shard's first/last row block.
    ``resample``: 'down'/'up' fuse the up/down ResBlock's avg-pool-2x /
    nearest-2x between the activation and the conv taps (reference chain:
    ext guided_diffusion unet.py ResBlock with up/down — h_upd sits between
    in_rest and in_conv). x/top/bot stream SOURCE-resolution rows; th,
    w_dim, nblk and the halo zeroing are all in OUTPUT (resampled) space.
    """
    if prologue:
        x_ref, top_ref, bot_ref, a_ref, b2_ref, w_ref, b_ref = refs[:7]
        rest = refs[7:]
    else:
        x_ref, top_ref, bot_ref, w_ref, b_ref = refs[:5]
        rest = refs[5:]
    nrest = int(has_skip) + 2 * int(explicit_halo) + 1
    assert len(rest) == nrest, (len(rest), nrest)
    s_ref = rest[0] if has_skip else None
    etop_ref = rest[-3] if explicit_halo else None
    ebot_ref = rest[-2] if explicit_halo else None
    out_ref = rest[-1]

    i = pl.program_id(2)
    dt = x_ref.dtype

    def act(v):
        if not prologue:
            return v
        pre = v.astype(jnp.float32) * a_ref[:] + b2_ref[:]
        return (pre * jax.nn.sigmoid(pre)).astype(dt)

    # Mosaic lowering constraints shape this (bisected on the axon remote
    # compiler 2026-08-17): stride-2 slices / interleaving reshapes on 3-D
    # values lower to >2-D gathers ("Only 2D gather is supported"), and 2-D
    # strided slices hit a gather shape-mismatch — which rules out a fused
    # 'down' (avg-pool) prologue entirely (negative result in PERF.md).
    # Leading-dim (untiled) reshapes and broadcasts ARE free, which is all
    # nearest-2x needs — so only 'up' is fused, via the merged
    # (rows*cols, cin) form.
    if resample == "up":
        def res(v):  # act'ed (r, W, cin) -> nearest-2x (2r, 2W, cin)
            r, wd, c = v.shape
            rows = jnp.broadcast_to(v[:, None], (r, 2, wd, c)).reshape(2 * r, wd, c)
            m = rows.reshape(2 * r * wd, c)
            cols = jnp.broadcast_to(m[:, None, :], (2 * r * wd, 2, c))
            return cols.reshape(2 * r, 2 * wd, c)
    else:
        def res(v):
            return v

    if explicit_halo:
        top = jnp.where(i == 0, etop_ref[:], act(top_ref[:]))
        bot = jnp.where(i == nblk - 1, ebot_ref[:], act(bot_ref[:]))
    else:
        top = res(act(top_ref[:])) * jnp.where(i == 0, 0, 1).astype(dt)
        bot = res(act(bot_ref[:])) * jnp.where(i == nblk - 1, 0, 1).astype(dt)
        if resample == "up":
            # a single source halo row duplicates to two output rows; the
            # conv halo needs exactly the one adjacent output row
            top, bot = top[1:2], bot[0:1]
    xw = jnp.concatenate([top, res(act(x_ref[:])), bot], axis=0)  # (th+2, W, cin)
    zcol = jnp.zeros((th + 2, 1, cin), dt)
    xw = jnp.concatenate([zcol, xw, zcol], axis=1)  # (th+2, W+2, cin)

    tco = out_ref.shape[-1]
    acc = jnp.zeros((th * w_dim, tco), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xw[dy : dy + th, dx : dx + w_dim, :].reshape(th * w_dim, cin)
            acc += jax.lax.dot_general(
                xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[0].astype(jnp.float32)
    if has_skip:
        acc += s_ref[:].reshape(th * w_dim, tco).astype(jnp.float32)
    out_ref[:] = acc.reshape(th, w_dim, tco).astype(out_ref.dtype)


def _conv3x3_pallas(x, w, bias, A=None, B=None, skip=None, etop=None, ebot=None,
                    resample=""):
    """x [B,H,W,Cin] -> [B,H,W,Cout]; w [3,3,Cin,Cout] HWIO; stride 1, pad 1.

    Optional fusions: ``A``/``B`` [Bb,Cin] f32 prologue vectors
    (act = silu(x*A+B) before the conv taps), ``skip`` [B,H,W,Cout]
    residual added into the output write. ``etop``/``ebot`` [B,1,W,Cin]:
    explicit (post-activation) boundary rows for SPMD spatial sharding —
    used instead of the implicit zero pad at this shard's H edges.

    Skinny channel counts (the UNet's RGB-in / eps+sigma-out convs, where
    XLA picks pathological T(2,128) layouts — ~1.9 ms/step profiled) are
    zero-padded to a lane tile; the padded MXU work is still ~2x faster
    than XLA's layout shuffling at those shapes.
    """
    b, h_src, w_src, cin = x.shape
    assert resample in ("", "up"), resample
    if resample == "up":
        h, w_dim = h_src * 2, w_src * 2
    else:
        h, w_dim = h_src, w_src
    cout = w.shape[-1]
    prologue = A is not None
    explicit_halo = etop is not None
    assert not (explicit_halo and resample), "SPMD halo + fused resample unsupported"
    cin_pad = (-cin) % 128 if cin % 64 else 0
    cout_pad = (-cout) % 128 if cout % 64 else 0
    if cin_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_pad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_pad), (0, 0)))
        if prologue:
            A = jnp.pad(A, ((0, 0), (0, cin_pad)))
            B = jnp.pad(B, ((0, 0), (0, cin_pad)))
        if explicit_halo:
            etop = jnp.pad(etop, ((0, 0), (0, 0), (0, 0), (0, cin_pad)))
            ebot = jnp.pad(ebot, ((0, 0), (0, 0), (0, 0), (0, cin_pad)))
        cin += cin_pad
    itemsize = jnp.dtype(x.dtype).itemsize
    picked = _plan_fwd(h, w_dim, cin, cout + cout_pad, itemsize,
                       resample=resample, has_skip=skip is not None,
                       prologue=prologue)
    if picked is None:
        # No single-pass plan fits scoped VMEM (weights too fat for a
        # [3,3,Cin,128] block — the ci-2048 decoder-bottleneck convs — or
        # the streams too wide at W=512): split the reduction in half and
        # chain the partial sum through the skip epilogue — same MXU work,
        # one tiny [B,H,W,Cout] intermediate.
        c1 = (cin // 2 + 127) // 128 * 128 if cin % 128 == 0 else cin // 2
        if not 0 < c1 < cin:
            raise ValueError(
                f"conv3x3 pallas: no VMEM plan for cin={cin} at this shape "
                "(availability gate should have routed this conv to XLA)"
            )
        first = _conv3x3_pallas(
            x[..., :c1], w[:, :, :c1], jnp.zeros_like(bias),
            A=None if A is None else A[:, :c1],
            B=None if B is None else B[:, :c1],
            skip=skip,
            etop=None if etop is None else etop[..., :c1],
            ebot=None if ebot is None else ebot[..., :c1],
            resample=resample,
        )
        return _conv3x3_pallas(
            x[..., c1:], w[:, :, c1:], bias,
            A=None if A is None else A[:, c1:],
            B=None if B is None else B[:, c1:],
            skip=first.astype(x.dtype),
            etop=None if etop is None else etop[..., c1:],
            ebot=None if ebot is None else ebot[..., c1:],
            resample=resample,
        )
    tco, cout_p, th = picked
    if cout_p != cout:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        bias = jnp.pad(bias, (0, cout_p - cout))
        if skip is not None:
            skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
    nblk = h // th

    kern = functools.partial(
        _conv_kernel, th=th, w_dim=w_dim, cin=cin, nblk=nblk,
        prologue=prologue, has_skip=skip is not None,
        explicit_halo=explicit_halo, resample=resample,
    )
    # grid: h fastest so the (j)-indexed weight block stays resident across
    # a full column sweep; x windows re-stream once per Cout tile. x rides
    # in three specs: the TH-row main block plus the two single-row halos
    # (their index maps clamp at the edges; the kernel zeroes the clamped
    # duplicates — that IS the pad-1 boundary).
    # source-space row-block heights and halo-row block heights: the main
    # block covers the source rows that RESAMPLE to this output block; halo
    # blocks cover the source rows pooling/duplicating to the one adjacent
    # output row (down: 2 source rows; up: 1 source row shared by 2 output
    # rows — the kernel slices the right duplicate)
    if resample == "up":
        mrows, hrows = th // 2, 1
    else:
        mrows, hrows = th, 1
    hsrc_blocks = h_src // hrows  # halo blocks per source image

    def top_map(nb, j, i):
        if resample == "up":
            return (nb, jnp.maximum(i * (th // 2) - 1, 0), 0, 0)
        return (nb, jnp.maximum(i * th - 1, 0), 0, 0)

    def bot_map(nb, j, i):
        if resample == "up":
            return (nb, jnp.minimum(i * (th // 2) + th // 2, hsrc_blocks - 1), 0, 0)
        return (nb, jnp.minimum(i * th + th, hsrc_blocks - 1), 0, 0)

    in_specs = [
        pl.BlockSpec(
            (None, mrows, w_src, cin), lambda nb, j, i: (nb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((None, hrows, w_src, cin), top_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((None, hrows, w_src, cin), bot_map, memory_space=pltpu.VMEM),
    ]
    operands = [x, x, x]
    if prologue:
        vec = pl.BlockSpec(
            (None, 1, 1, cin), lambda nb, j, i: (nb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [vec, vec]
        operands += [A[:, None, None, :], B[:, None, None, :]]
    in_specs += [
        pl.BlockSpec(
            (3, 3, cin, tco), lambda nb, j, i: (0, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        # bias as a 2-D block — Mosaic rejects 1-D VMEM operands
        pl.BlockSpec((1, tco), lambda nb, j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    operands += [w, bias[None]]
    if skip is not None:
        in_specs.append(
            pl.BlockSpec(
                (None, th, w_dim, tco), lambda nb, j, i: (nb, i, 0, j),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(skip)
    if explicit_halo:
        row = pl.BlockSpec(
            (None, 1, w_dim, cin), lambda nb, j, i: (nb, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [row, row]
        operands += [etop.astype(x.dtype), ebot.astype(x.dtype)]

    out = pl.pallas_call(
        kern,
        grid=(b, cout_p // tco, nblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, th, w_dim, tco), lambda nb, j, i: (nb, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w_dim, cout_p), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_dim * 9 * cin * cout_p,
            bytes_accessed=b * h * w_dim * (cin * (cout_p // tco) + cout_p) * 2
            + 9 * cin * cout_p * 2 * b,
            transcendentals=b * h * w_dim * cin if prologue else 0,
        ),
    )(*operands)
    return out[..., :cout] if cout_p != cout else out


@jax.custom_vjp
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 pad-1 NHWC conv (Pallas direct kernel), bias fused."""
    return _conv3x3_pallas(x, w, bias)


def _conv3x3_fwd(x, w, bias):
    return _conv3x3_pallas(x, w, bias), (x, w)


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _conv3x3_bwd(res, g):
    x, w = res
    # dx: same conv with flipped taps and I/O-transposed weights (exact for
    # stride 1, pad 1). Zero bias re-uses the fused-bias kernel.
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    dx = _conv3x3_pallas(g, wt.astype(w.dtype), jnp.zeros((w.shape[2],), w.dtype))
    # dw/db: exact, via XLA — dead-code-eliminated in the sampling path
    # (guidance differentiates w.r.t. the image only).
    _, w_vjp = jax.vjp(lambda w_: _xla_conv(x, w_), w)
    (dw,) = w_vjp(g.astype(x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx, dw, db


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def _conv_dx_kernel(g_ref, top_ref, bot_ref, w_ref, x_ref, a_ref, b2_ref,
                    dx_ref, ab_ref, *, th, w_dim, cin, nblk):
    """Fused backward for the prologue conv: one program computes the
    transpose-conv accumulator for its output block, then applies the
    silu'/affine chain IN REGISTER — dx = (acc * silu'(pre)) * A with
    pre = x*A + B recomputed from the streamed x block — and reduces the
    per-block dA/dB partial sums. Replaces the da write+read plus a full
    elementwise fusion pass per ResBlock conv in the guidance gradient."""
    i = pl.program_id(2)
    dt = g_ref.dtype
    top = top_ref[:] * jnp.where(i == 0, 0, 1).astype(dt)
    bot = bot_ref[:] * jnp.where(i == nblk - 1, 0, 1).astype(dt)
    gw = jnp.concatenate([top, g_ref[:], bot], axis=0)
    zcol = jnp.zeros((th + 2, 1, cin), dt)
    gw = jnp.concatenate([zcol, gw, zcol], axis=1)

    tco = dx_ref.shape[-1]
    acc = jnp.zeros((th * w_dim, tco), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            gs = gw[dy : dy + th, dx : dx + w_dim, :].reshape(th * w_dim, cin)
            acc += jax.lax.dot_general(
                gs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    xs = x_ref[:].reshape(th * w_dim, tco).astype(jnp.float32)
    a = a_ref[0]  # (1, tco) row vector, broadcasts over the rows axis
    b2 = b2_ref[0]
    pre = xs * a + b2
    sig = jax.nn.sigmoid(pre)
    dpre = acc * (sig * (1.0 + pre * (1.0 - sig)))
    dx_ref[:] = (dpre * a).reshape(th, w_dim, tco).astype(dx_ref.dtype)
    # per-block dA/dB partial sums; rows 0/1 of an 8-sublane tile (Mosaic
    # needs the last-two block dims divisible by (8, 128))
    da_row = jnp.sum(dpre * xs, axis=0, keepdims=True)
    db_row = jnp.sum(dpre, axis=0, keepdims=True)
    ab_ref[:] = jnp.concatenate(
        [da_row, db_row, jnp.zeros((6, tco), jnp.float32)], axis=0
    )[None]


def _conv_dx_kernel_wtiled(g_ref, top_ref, bot_ref, left_ref, right_ref,
                           tl_ref, tr_ref, bl_ref, br_ref, w_ref, x_ref,
                           a_ref, b2_ref, dx_ref, ab_ref,
                           *, th, tw, cin, nbh, nbw):
    """W-tiled variant of _conv_dx_kernel: the (th+2, tw+2, cin) halo window
    is assembled in VMEM from nine clamped Blocked streams — main block,
    single-row top/bottom, 8-column left/right (only the boundary column is
    used), and the four 1x8 corners. Mosaic's block-shape rule forbids a
    tw+2-wide Element window (second-minor dim must divide by 8 or equal the
    array dim — measured on the axon compiler 2026-08-17), so this
    generalizes the row-halo clamping the v2 forward kernel proved instead.
    Clamped duplicates are zeroed, which is exactly the pad-1 boundary."""
    i = pl.program_id(2)
    ih = i // nbw
    iw = i % nbw
    dt = g_ref.dtype

    def mask(cond):
        # scalar bf16*bf16 does not legalize in Mosaic — derive each mask
        # from one boolean expression and multiply tensor*scalar only
        return jnp.where(cond, 0, 1).astype(dt)

    at_t, at_b = ih == 0, ih == nbh - 1
    at_l, at_r = iw == 0, iw == nbw - 1
    row_top = jnp.concatenate(
        [
            tl_ref[:, -1:, :] * mask(at_t | at_l),
            top_ref[:] * mask(at_t),
            tr_ref[:, :1, :] * mask(at_t | at_r),
        ],
        axis=1,
    )
    row_mid = jnp.concatenate(
        [left_ref[:, -1:, :] * mask(at_l), g_ref[:], right_ref[:, :1, :] * mask(at_r)],
        axis=1,
    )
    row_bot = jnp.concatenate(
        [
            bl_ref[:, -1:, :] * mask(at_b | at_l),
            bot_ref[:] * mask(at_b),
            br_ref[:, :1, :] * mask(at_b | at_r),
        ],
        axis=1,
    )
    gw = jnp.concatenate([row_top, row_mid, row_bot], axis=0)  # (th+2, tw+2, cin)

    tco = dx_ref.shape[-1]
    acc = jnp.zeros((th * tw, tco), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            gs = gw[dy : dy + th, dx : dx + tw, :].reshape(th * tw, cin)
            acc += jax.lax.dot_general(
                gs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    xs = x_ref[:].reshape(th * tw, tco).astype(jnp.float32)
    a = a_ref[0]
    b2 = b2_ref[0]
    pre = xs * a + b2
    sig = jax.nn.sigmoid(pre)
    dpre = acc * (sig * (1.0 + pre * (1.0 - sig)))
    dx_ref[:] = (dpre * a).reshape(th, tw, tco).astype(dx_ref.dtype)
    da_row = jnp.sum(dpre * xs, axis=0, keepdims=True)
    db_row = jnp.sum(dpre, axis=0, keepdims=True)
    ab_ref[:] = jnp.concatenate(
        [da_row, db_row, jnp.zeros((6, tco), jnp.float32)], axis=0
    )[None]


def _conv3x3_dx_wtiled(g, wt, x, A, B, tco, cout_p, tw, itemsize):
    """Launch the W-tiled fused backward (no host pads — all halos are
    clamped Blocked windows assembled in kernel)."""
    b, h, w_dim, cin = g.shape
    th = 8
    nbh, nbw = h // th, w_dim // tw
    wblk = tw // 8  # left/right halos stream in 8-column blocks

    kern = functools.partial(
        _conv_dx_kernel_wtiled, th=th, tw=tw, cin=cin, nbh=nbh, nbw=nbw
    )

    def _rowcol(rows, r_map, c_map):
        return pl.BlockSpec(
            (None, rows, 8, cin),
            lambda nb, j, i: (nb, r_map(i), c_map(i), 0),
            memory_space=pltpu.VMEM,
        )

    r_main = lambda i: i // nbw
    r_top = lambda i: jnp.maximum((i // nbw) * th - 1, 0)
    r_bot = lambda i: jnp.minimum((i // nbw) * th + th, h - 1)
    c_left = lambda i: jnp.maximum((i % nbw) * wblk - 1, 0)
    c_right = lambda i: jnp.minimum((i % nbw + 1) * wblk, w_dim // 8 - 1)
    vec = pl.BlockSpec(
        (None, 1, 1, tco), lambda nb, j, i: (nb, 0, 0, j), memory_space=pltpu.VMEM
    )
    dx, ab_p = pl.pallas_call(
        kern,
        grid=(b, cout_p // tco, nbh * nbw),
        in_specs=[
            pl.BlockSpec(
                (None, th, tw, cin),
                lambda nb, j, i: (nb, i // nbw, i % nbw, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, tw, cin),
                lambda nb, j, i: (nb, jnp.maximum((i // nbw) * th - 1, 0), i % nbw, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, tw, cin),
                lambda nb, j, i: (
                    nb, jnp.minimum((i // nbw) * th + th, h - 1), i % nbw, 0,
                ),
                memory_space=pltpu.VMEM,
            ),
            _rowcol(th, r_main, c_left),   # left (uses last column)
            _rowcol(th, r_main, c_right),  # right (uses first column)
            _rowcol(1, r_top, c_left),     # top-left corner
            _rowcol(1, r_top, c_right),    # top-right corner
            _rowcol(1, r_bot, c_left),     # bottom-left corner
            _rowcol(1, r_bot, c_right),    # bottom-right corner
            pl.BlockSpec(
                (3, 3, cin, tco), lambda nb, j, i: (0, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, th, tw, tco),
                lambda nb, j, i: (nb, i // nbw, i % nbw, j),
                memory_space=pltpu.VMEM,
            ),
            vec,
            vec,
        ],
        out_specs=[
            pl.BlockSpec(
                (None, th, tw, tco),
                lambda nb, j, i: (nb, i // nbw, i % nbw, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, 8, tco), lambda nb, j, i: (nb, i, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w_dim, cout_p), g.dtype),
            jax.ShapeDtypeStruct((b, nbh * nbw, 8, cout_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_dim * 9 * cin * cout_p,
            bytes_accessed=b * h * w_dim * (cin * (cout_p // tco) + 2 * cout_p)
            * itemsize + 9 * cin * cout_p * itemsize * b,
            transcendentals=b * h * w_dim * cout_p,
        ),
    )(
        g, g, g, g, g, g, g, g, g, wt,
        x.astype(g.dtype),
        A.astype(jnp.float32)[:, None, None, :],
        B.astype(jnp.float32)[:, None, None, :],
    )
    return dx, ab_p


def _conv3x3_dx_pallas(g, wt, x, A, B):
    """(dx, dA, dB) of the prologue-fused conv in one kernel pass.

    g [B,H,W,Co] cotangent, wt [3,3,Co,Ci] flipped/transposed weights,
    x [B,H,W,Ci] the pre-activation input, A/B [B,Ci] prologue vectors."""
    b, h, w_dim, cin = g.shape
    cout = wt.shape[-1]
    cin_pad = (-cin) % 128 if cin % 64 else 0
    cout_pad = (-cout) % 128 if cout % 64 else 0
    if cin_pad:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, cin_pad)))
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, cin_pad), (0, 0)))
        cin += cin_pad
    itemsize = jnp.dtype(g.dtype).itemsize
    tco, cout_p, tw = _pick_dx_tiles(h, w_dim, cin, cout + cout_pad, itemsize)
    if tco is None:
        raise ValueError("dx kernel tiles do not fit VMEM; gate should have caught this")
    if cout_p != cout:
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cout_p - cout)))
        A = jnp.pad(A, ((0, 0), (0, cout_p - cout)))
        B = jnp.pad(B, ((0, 0), (0, cout_p - cout)))
    if tw is not None:
        dx, ab_p = _conv3x3_dx_wtiled(g, wt, x, A, B, tco, cout_p, tw, itemsize)
        dA = jnp.sum(ab_p[:, :, 0], axis=1)
        dB = jnp.sum(ab_p[:, :, 1], axis=1)
        if cout_p != cout:
            return dx[..., :cout], dA[:, :cout], dB[:, :cout]
        return dx, dA, dB
    th = _pick_th(h, w_dim, cin, tco, itemsize=itemsize)
    nblk = h // th

    kern = functools.partial(_conv_dx_kernel, th=th, w_dim=w_dim, cin=cin, nblk=nblk)
    vec = pl.BlockSpec(
        (None, 1, 1, tco), lambda nb, j, i: (nb, 0, 0, j), memory_space=pltpu.VMEM
    )
    dx, ab_p = pl.pallas_call(
        kern,
        grid=(b, cout_p // tco, nblk),
        in_specs=[
            pl.BlockSpec(
                (None, th, w_dim, cin), lambda nb, j, i: (nb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, w_dim, cin),
                lambda nb, j, i: (nb, jnp.maximum(i * th - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, w_dim, cin),
                lambda nb, j, i: (nb, jnp.minimum(i * th + th, th * nblk - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, cin, tco), lambda nb, j, i: (0, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, th, w_dim, tco), lambda nb, j, i: (nb, i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            vec,
            vec,
        ],
        out_specs=[
            pl.BlockSpec(
                (None, th, w_dim, tco), lambda nb, j, i: (nb, i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 1, 8, tco), lambda nb, j, i: (nb, i, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w_dim, cout_p), g.dtype),
            jax.ShapeDtypeStruct((b, nblk, 8, cout_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w_dim * 9 * cin * cout_p,
            bytes_accessed=b * h * w_dim * (cin * (cout_p // tco) + 2 * cout_p) * 2
            + 9 * cin * cout_p * 2 * b,
            transcendentals=b * h * w_dim * cout_p,
        ),
    )(
        g, g, g, wt,
        x.astype(g.dtype),
        A.astype(jnp.float32)[:, None, None, :],
        B.astype(jnp.float32)[:, None, None, :],
    )
    dA = jnp.sum(ab_p[:, :, 0], axis=1)
    dB = jnp.sum(ab_p[:, :, 1], axis=1)
    if cout_p != cout:
        return dx[..., :cout], dA[:, :cout], dB[:, :cout]
    return dx, dA, dB


def _dx_kernel_available(g_shape, wt_shape, itemsize: int = 2) -> bool:
    b, h, w, cin = g_shape
    cout = wt_shape[-1]
    cin_p = cin + ((-cin) % 128 if cin % 64 else 0)
    cout_p = cout + ((-cout) % 128 if cout % 64 else 0)
    return (
        w >= 8 and h % 8 == 0 and np.prod(g_shape) > 0
        and _pick_dx_tiles(h, w, cin_p, cout_p, itemsize)[0] is not None
    )


def _silu_chain(x, A, B):
    """pre, sigmoid(pre), act for the prologue act = silu(x*A + B). f32."""
    pre = x.astype(jnp.float32) * A[:, None, None, :] + B[:, None, None, :]
    sig = jax.nn.sigmoid(pre)
    return pre, sig, pre * sig


def _fused_bwd_common(x, A, B, w, g, conv_fn=None):
    """Shared cotangents for the prologue-fused conv.

    dx rides the plain Pallas transpose conv (``conv_fn`` overrides it — the
    SPMD wrapper passes its partitioned variant); the silu'/affine chain and
    the dA/dB reductions are left to XLA (they fuse into ~one elementwise
    pass over da and x). dA/dB matter for correctness: A/B carry the
    GroupNorm statistics, so d(loss)/d(image) flows through them outside the
    kernel."""
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    if conv_fn is None and _dx_kernel_available(
        g.shape, wt.shape, jnp.dtype(g.dtype).itemsize
    ):
        # single-kernel backward: transpose conv + silu'/affine chain +
        # dA/dB partial reductions in one pass (no da round trip)
        dx, dA, dB = _conv3x3_dx_pallas(g, wt.astype(w.dtype), x, A, B)
        dx = dx.astype(x.dtype)
        _, _, act = _silu_chain(x, A, B)
    else:
        conv_fn = conv_fn or _conv3x3_pallas
        da = conv_fn(g, wt.astype(w.dtype), jnp.zeros((w.shape[2],), w.dtype))
        pre, sig, act = _silu_chain(x, A, B)
        dpre = da.astype(jnp.float32) * (sig * (1.0 + pre * (1.0 - sig)))
        dx = (dpre * A[:, None, None, :]).astype(x.dtype)
        dA = jnp.sum(dpre * x.astype(jnp.float32), axis=(1, 2))
        dB = jnp.sum(dpre, axis=(1, 2))
    # dw/db: exact, via XLA on the recomputed activation — dead-code-
    # eliminated in the sampling path (guidance differentiates wrt the image)
    _, w_vjp = jax.vjp(lambda w_: _xla_conv(act.astype(x.dtype), w_), w)
    (dw,) = w_vjp(g.astype(x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx, dA, dB, dw, db


@jax.custom_vjp
def conv3x3_gn_silu(x, A, B, w, bias):
    """conv3x3(silu(x*A + B)) + bias — the ResBlock GroupNorm-apply/SiLU
    prologue fused into the conv window load (one less full HBM write+read
    of the activation per conv). A/B: [batch, Cin] f32 fold of the GN
    stats/params (and emb scale-shift)."""
    return _conv3x3_pallas(x, w, bias, A=A, B=B)


def _gn_silu_fwd(x, A, B, w, bias):
    return _conv3x3_pallas(x, w, bias, A=A, B=B), (x, A, B, w)


def _gn_silu_bwd(res, g):
    return _fused_bwd_common(*res, g)


conv3x3_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


@jax.custom_vjp
def conv3x3_gn_silu_add(x, A, B, w, bias, skip):
    """conv3x3(silu(x*A + B)) + bias + skip — prologue fusion plus the
    ResBlock residual add fused into the output write (epilogue)."""
    return _conv3x3_pallas(x, w, bias, A=A, B=B, skip=skip)


def _gn_silu_add_fwd(x, A, B, w, bias, skip):
    return _conv3x3_pallas(x, w, bias, A=A, B=B, skip=skip), (x, A, B, w)


def _gn_silu_add_bwd(res, g):
    dx, dA, dB, dw, db = _fused_bwd_common(*res, g)
    return dx, dA, dB, dw, db, g


conv3x3_gn_silu_add.defvjp(_gn_silu_add_fwd, _gn_silu_add_bwd)


def _resample_fused(x, A, B, w, bias, mode):
    return _conv3x3_pallas(x, w, bias, A=A, B=B, resample=mode)


def _resample_fused_bwd(mode, x, A, B, w, g):
    """Backward of conv3x3(resample(silu(x*A+B))) + bias.

    da (cotangent of the resampled activation) rides the plain Pallas
    transpose conv in OUTPUT space; the resample adjoint is exact:
    avg-pool-2x adjoint = nearest-2x(da)/4, nearest-2x adjoint = 4*avg-pool
    (sum of the four duplicated cells)."""
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    da = _conv3x3_pallas(g, wt.astype(w.dtype), jnp.zeros((w.shape[2],), w.dtype))
    da = da.astype(jnp.float32)
    assert mode == "up"
    b_, ho, wo, c = da.shape
    da_act = jnp.sum(da.reshape(b_, ho // 2, 2, wo // 2, 2, c), axis=(2, 4))
    pre, sig, act = _silu_chain(x, A, B)
    dpre = da_act * (sig * (1.0 + pre * (1.0 - sig)))
    dx = (dpre * A[:, None, None, :]).astype(x.dtype)
    dA = jnp.sum(dpre * x.astype(jnp.float32), axis=(1, 2))
    dB = jnp.sum(dpre, axis=(1, 2))
    # dw/db exact via XLA on the recomputed resampled activation (DCE'd in
    # the sampling path)
    act = act.astype(x.dtype)
    bb, hh, ww, c = act.shape
    r = jnp.broadcast_to(
        act[:, :, None, :, None, :], (bb, hh, 2, ww, 2, c)
    ).reshape(bb, 2 * hh, 2 * ww, c)
    _, w_vjp = jax.vjp(lambda w_: _xla_conv(r, w_), w)
    (dw,) = w_vjp(g.astype(x.dtype))
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(g.dtype)
    return dx, dA, dB, dw, db


@jax.custom_vjp
def conv3x3_gn_silu_up(x, A, B, w, bias):
    """conv3x3(nearest_2x(silu(x*A + B))) + bias — the up-ResBlock's whole
    in_layers+h_upd+in_conv chain in one kernel."""
    return _resample_fused(x, A, B, w, bias, "up")


def _gn_up_fwd(x, A, B, w, bias):
    return _resample_fused(x, A, B, w, bias, "up"), (x, A, B, w)


def _gn_up_bwd(res, g):
    return _resample_fused_bwd("up", *res, g)


conv3x3_gn_silu_up.defvjp(_gn_up_fwd, _gn_up_bwd)


def resample_fused_available(x_shape, kernel_shape, mode: str,
                             itemsize: int = 2) -> bool:
    """Gate for the fused resample+conv: only 'up' (nearest-2x) — Mosaic
    cannot lower any stride-2 column selection, so the avg-pool 'down'
    prologue stays unfused (see _conv_kernel notes / PERF.md). The OUTPUT-
    space shape must be kernel-eligible and a resample-aware VMEM plan must
    exist."""
    b, h, w, cin = x_shape
    if mode == "up":
        out_shape = (b, h * 2, w * 2, cin)
    else:
        return False
    # the nearest-2x merge reshapes need full 128-lane tiles: cin that
    # stays at a 64-lane remainder inside the kernel (64, 192, ...) hits
    # "infer-vector-layout: unsupported shape cast" on the axon Mosaic
    # (measured 2026-08-17 on the 64-ch tiny config)
    cin_k = cin + ((-cin) % 128 if cin % 64 else 0)
    if cin_k % 128:
        return False
    if not conv3x3_available(out_shape, kernel_shape, 1, ((1, 1), (1, 1)), itemsize):
        return False
    cout = kernel_shape[3]
    cin_p = cin + ((-cin) % 128 if cin % 64 else 0)
    cout_p = cout + ((-cout) % 128 if cout % 64 else 0)
    ho, wo = out_shape[1], out_shape[2]

    def tiles(ci, depth=3):
        if _plan_fwd(ho, wo, ci, cout_p, itemsize, resample=mode) is not None:
            return True
        half = (ci // 2 + 127) // 128 * 128 if ci % 128 == 0 else ci // 2
        return depth > 0 and 0 < half < ci and tiles(half, depth - 1)

    return tiles(cin_p)


def conv3x3_available(x_shape, kernel_shape, stride: int, padding,
                      itemsize: int = 2) -> bool:
    """Gate: 3x3 stride-1 symmetric-pad-1 NHWC shapes this kernel handles
    AND wins on. W >= 8 since round 2c: the r2c profile showed the 16^2/8^2
    bottleneck-level convs XLA kept were ~5.5 ms/step of T(2,128)-layout
    fusions at ~30% MXU efficiency; routing them here won e2e (PERF.md).
    ``itemsize``: activation bytes (the LPIPS VGG convs run in f32)."""
    kh, kw = kernel_shape[0], kernel_shape[1]
    if (kh, kw) != (3, 3) or stride != 1:
        return False
    if padding is not None and padding != ((1, 1), (1, 1)):
        return False
    h, w, cin = x_shape[1], x_shape[2], x_shape[3]
    cout = kernel_shape[3]
    if not (w >= 8 and h % 8 == 0 and np.prod(x_shape) > 0):
        return False
    # skinny channels are zero-padded to a lane tile inside the kernel
    cin_p = cin + ((-cin) % 128 if cin % 64 else 0)
    cout_p = cout + ((-cout) % 128 if cout % 64 else 0)
    # the custom-vjp input gradient runs the kernel with (cout, cin)
    # transposed weights — both orientations need a scoped-VMEM plan
    # (directly, or via the recursive Cin-split partial-sum chain); skip
    # included as margin since the fused epilogue streams one more block
    def tiles(ci, co, depth=3):
        if _plan_fwd(h, w, ci, co, itemsize, has_skip=True) is not None:
            return True
        half = (ci // 2 + 127) // 128 * 128 if ci % 128 == 0 else ci // 2
        return depth > 0 and 0 < half < ci and tiles(half, co, depth - 1)

    return tiles(cin_p, cout_p) and tiles(cout_p, cin_p)
