"""HTTP serving daemon e2e (tiny debug models, CPU)."""

import json
import os
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest


@pytest.fixture()
def server(monkeypatch, tmp_path):
    monkeypatch.setenv("CGD_TPU_DEBUG_TINY", "1")
    monkeypatch.chdir(tmp_path)
    from cgd_tpu.serve import Handler

    Handler.weights_mode = "random"
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestServe:
    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as r:
            body = json.loads(r.read())
        assert body["status"] == "ok" and body["devices"] >= 1

    @pytest.mark.slow
    def test_generate_png(self, server):
        req = urllib.request.Request(
            f"{server}/generate",
            data=json.dumps({
                "prompt": "serve test", "image_size": 64,
                "timestep_respacing": "ddim10", "num_cutouts": 2,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            data = r.read()
        assert r.headers["Content-Type"] == "image/png"
        assert data[:8] == b"\x89PNG\r\n\x1a\n"

    @pytest.mark.slow
    def test_generate_png_under_mesh(self, server):
        """--mesh on the serve daemon: the whole generation runs sharded
        over the 8-device CPU mesh (VERDICT r3 #1 — multi-chip must be
        reachable from every product surface)."""
        from cgd_tpu.parallel.mesh import mesh_from_spec
        from cgd_tpu.serve import Handler

        Handler.mesh = mesh_from_spec("auto")
        try:
            req = urllib.request.Request(
                f"{server}/generate",
                data=json.dumps({
                    "prompt": "serve mesh test", "image_size": 64,
                    "timestep_respacing": "ddim8", "num_cutouts": 8,
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                data = r.read()
        finally:
            Handler.mesh = None
        assert data[:8] == b"\x89PNG\r\n\x1a\n"

    def test_bad_request(self, server):
        req = urllib.request.Request(
            f"{server}/generate", data=b"{}", headers={"Content-Type": "application/json"}
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert "prompt" in json.loads(ei.value.read())["error"]

    @pytest.mark.slow
    def test_two_overlapping_requests(self, server):
        """Pipelined serving (r5): two concurrent requests with DIFFERENT
        prompts both succeed; sampling is serialized by the device lock while
        host prep overlaps (the daemon used to hold one lock around the
        whole generation)."""
        results = {}

        def post(key, prompt):
            req = urllib.request.Request(
                f"{server}/generate",
                data=json.dumps({
                    "prompt": prompt, "image_size": 64,
                    "timestep_respacing": "ddim6", "num_cutouts": 2,
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                results[key] = r.read()

        threads = [
            threading.Thread(target=post, args=("a", "overlap one")),
            threading.Thread(target=post, args=("b", "overlap two")),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {"a", "b"}
        for data in results.values():
            assert data[:8] == b"\x89PNG\r\n\x1a\n"

    @pytest.mark.slow
    def test_stream_frames(self, server):
        """`"stream": true` returns a multipart/x-mixed-replace stream with
        one image/png part per saved frame (save_frequency cadence) and a
        terminal boundary — clients watch the image converge instead of
        polling for the final frame."""
        req = urllib.request.Request(
            f"{server}/generate",
            data=json.dumps({
                "prompt": "stream test", "image_size": 64,
                "timestep_respacing": "ddim6", "num_cutouts": 2,
                "stream": True, "save_frequency": 2,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            ctype = r.headers["Content-Type"]
            body = r.read()
        assert ctype == "multipart/x-mixed-replace; boundary=cgdframe"
        parts = body.split(b"--cgdframe")
        # ddim6 at save_frequency=2 -> 3 progress frames + the final frame
        pngs = [p for p in parts if b"Content-Type: image/png" in p]
        assert len(pngs) >= 2
        for p in pngs:
            payload = p.split(b"\r\n\r\n", 1)[1]
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert parts[-1].startswith(b"--")  # terminal boundary, no error part
        assert not any(b"application/json" in p for p in parts)

    def test_stream_missing_prompt_is_400(self, server):
        req = urllib.request.Request(
            f"{server}/generate",
            data=json.dumps({"stream": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert "prompt" in json.loads(ei.value.read())["error"]

    def test_stream_pre_frame_failure_is_400(self, server):
        """Streaming headers are deferred until the first frame exists, so
        ANY pre-frame failure (here: an unresolvable weights path) must be
        an HTTP-level 400, not a 200 multipart stream whose only part is an
        error blob (r5 review: status-code parity with the plain path)."""
        req = urllib.request.Request(
            f"{server}/generate",
            data=json.dumps({
                "prompt": "x", "stream": True,
                "clip_model_name": "/no/such/model.pt",
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=120)
        assert ei.value.code == 400

    def test_stream_queue_drops_oldest_keeps_terminal(self):
        """The streaming frame queue never blocks the producer: when full,
        the OLDEST buffered frame is dropped (multipart x-mixed-replace =
        each part replaces the previous), so the newest frame and the
        terminal done/error item always land."""
        import queue

        from cgd_tpu.serve import _offer

        q = queue.Queue(maxsize=3)
        for i in range(5):
            _offer(q, ("frame", bytes([i]), 0))
        _offer(q, ("done", None, None))
        items = [q.get_nowait() for _ in range(3)]
        assert items[-1] == ("done", None, None)
        assert items[-2] == ("frame", bytes([4]), 0), "newest frame survives"

    @pytest.mark.slow
    def test_plain_request_completes_behind_wedged_stream(self, server):
        """A streaming client that sends its request and then NEVER reads the
        response body must not wedge the daemon: sampling runs in a producer
        thread decoupled from the client socket by the bounded frame queue,
        so the device lock is released at device speed and a concurrent
        plain request completes normally (r5 review: the pre-fix handler
        wrote frames to the client socket while holding the device lock —
        one wedged reader stalled the chip for every request)."""
        import socket
        from urllib.parse import urlparse

        u = urlparse(server)
        payload = json.dumps({
            "prompt": "wedged stream", "image_size": 64,
            "timestep_respacing": "ddim6", "num_cutouts": 2,
            "stream": True, "save_frequency": 2,
        }).encode()
        wedged = socket.create_connection((u.hostname, u.port), timeout=30)
        try:
            wedged.sendall(
                b"POST /generate HTTP/1.1\r\n"
                + f"Host: {u.hostname}:{u.port}\r\n".encode()
                + b"Content-Type: application/json\r\n"
                + f"Content-Length: {len(payload)}\r\n\r\n".encode()
                + payload
            )
            # never read from `wedged`; the plain request must still finish
            req = urllib.request.Request(
                f"{server}/generate",
                data=json.dumps({
                    "prompt": "behind the wedge", "image_size": 64,
                    "timestep_respacing": "ddim6", "num_cutouts": 2,
                }).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                data = r.read()
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
        finally:
            wedged.close()

    def test_seg_cache_lru_thread_safe(self):
        """_seg_cache_for is hammered from the daemon's handler threads;
        same-key callers must all get the SAME dict (an unlocked race hands
        the loser a fresh one, silently discarding cached executables) and
        the LRU bound must hold."""
        from cgd_tpu import api

        old = dict(api._SEG_CACHES)
        api._SEG_CACHES.clear()
        try:
            results = []

            def hit(key):
                for _ in range(200):
                    results.append((key, id(api._seg_cache_for(key))))

            threads = [
                threading.Thread(target=hit, args=(f"k{i % 3}",))
                for i in range(6)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            by_key = {}
            for key, ident in results:
                by_key.setdefault(key, set()).add(ident)
            for key, idents in by_key.items():
                assert len(idents) == 1, f"{key}: cache dict identity churned"
            assert len(api._SEG_CACHES) <= api._SEG_CACHES_MAX
        finally:
            api._SEG_CACHES.clear()
            api._SEG_CACHES.update(old)

    @pytest.mark.slow
    def test_control_arm_serializes_whole_request(self, server, monkeypatch):
        """CGD_TPU_SERVE_PIPELINE=0 (the serving-throughput A/B control arm,
        tools/serve_throughput.py) restores the pre-r5 whole-request lock and
        must still serve correctly."""
        monkeypatch.setenv("CGD_TPU_SERVE_PIPELINE", "0")
        req = urllib.request.Request(
            f"{server}/generate",
            data=json.dumps({
                "prompt": "control arm", "image_size": 64,
                "timestep_respacing": "ddim6", "num_cutouts": 2,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            data = r.read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"

    def test_new_prompt_same_config_is_same_hlo(self):
        """Serving-critical (r5): prompt target embeddings travel in the
        params pytree, so two different prompts at the same config lower to
        the IDENTICAL module — the persistent compile cache hits and a new
        prompt costs seconds, not a fresh ~4.5 min compile. (The old builder
        closed over the embeddings, inlining them as HLO literals.)"""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from cgd_tpu.diffusion import make_diffusion
        from cgd_tpu.diffusion.sampler import (
            SamplerConfig, StepMeta, make_guided_step,
        )
        from cgd_tpu.guidance.pipeline import GuidanceSettings, make_guidance_builder
        from cgd_tpu.models.clip.configs import CLIPConfig, TextConfig, VisionViTConfig
        from cgd_tpu.models.clip import init_clip
        from cgd_tpu.models.unet import UNetConfig, apply_unet, init_unet

        unet_cfg = UNetConfig(
            image_size=32, model_channels=32, num_res_blocks=1,
            attention_ds=(4,), channel_mult=(1, 2), num_head_channels=16,
            num_classes=None,
        )
        clip_cfg = CLIPConfig(
            name="t", embed_dim=32,
            vision=VisionViTConfig(32, 8, 64, 2, 2),
            text=TextConfig(width=64, heads=2, layers=2),
        )
        diffusion = make_diffusion(1000, "linear", "ddim10")
        builder = make_guidance_builder(
            clip_cfg, None, None, diffusion, GuidanceSettings()
        )

        def model_fn(params, x, t_model, rng, y):
            return apply_unet(params["unet"], unet_cfg, x, t_model, y)

        step = make_guided_step(
            diffusion, model_fn, builder(StepMeta(5, True, 2)),
            SamplerConfig(use_ddim=True),
        )
        base = {
            "unet": init_unet(jax.random.PRNGKey(0), unet_cfg),
            "clip": init_clip(jax.random.PRNGKey(1), clip_cfg),
        }
        x = jnp.zeros((1, 32, 32, 3))

        def lower_with(embeds):
            params = dict(
                base,
                guidance={
                    "target_embeds": jnp.asarray(embeds),
                    "weights": jnp.ones((2,), jnp.float32),
                },
            )
            return jax.jit(step).lower(
                params, x, jnp.int32(5), jnp.int32(9), None, jax.random.PRNGKey(2)
            ).as_text()

        a = lower_with(np.full((2, 32), 0.1, np.float32))
        b = lower_with(np.full((2, 32), -0.7, np.float32))
        assert a == b, "prompt targets leaked into the lowered module as literals"

    def test_failed_generate_removes_scratch_dir(self, monkeypatch):
        """A failing request must not leak its cgd_serve_* temp tree — the
        success-path caller cleanup never sees a dir when _generate raises."""
        import glob
        import tempfile

        from cgd_tpu import serve

        before = set(glob.glob(os.path.join(tempfile.gettempdir(), "cgd_serve_*")))
        with pytest.raises(AssertionError):
            serve._generate(
                {"prompt": "x", "clip_model_name": "/no/such/model.pt"}, "random"
            )
        after = set(glob.glob(os.path.join(tempfile.gettempdir(), "cgd_serve_*")))
        assert after == before
