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
