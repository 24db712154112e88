"""Minimal HTTP serving daemon.

The reference's serving surface is the Replicate/Cog adapter
(cog_predict.py); this adds a dependency-free stdlib server for direct
deployment on TPU VMs:

    python -m cgd_tpu.serve --port 8080 [--weights-mode random]

    POST /generate {"prompt": "...", "image_size": 256,
                    "timestep_respacing": "ddim250", ...any api kwarg}
      -> image/png (the final frame)
    POST /generate {"prompt": "...", "stream": true, ...}
      -> multipart/x-mixed-replace stream: one image/png part per saved
         frame as sampling produces it (save_frequency controls cadence,
         default 25 when streaming — the API's progress-frame default), a
         final application/json part on mid-run error, then the terminal
         boundary. Clients watch the image converge instead of polling.
         Headers are sent with the FIRST frame, so pre-frame failures get
         the same clean 400 as the plain path; sampling runs in a producer
         thread decoupled from the client socket by a bounded frame queue,
         so a slow reader drops intermediate frames instead of stalling
         the device (or the daemon's other requests).
    GET  /healthz  -> {"status": "ok", "backend": "tpu", "devices": N}

Pipelined execution (r5): only the DEVICE-heavy sampling phase is
serialized (one TPU context — api.py's ``device_lock``); each request's
host-side prep (weight resolve, tokenization, prompt encoding, validation,
output dir) runs concurrently, so request N+1's host work overlaps request
N's device scan and the chip never idles between requests. In-flight
requests are bounded by a semaphore so a burst can't stack unbounded prep
memory. Compiled graphs are cached across requests by the persistent
compilation cache — and since r5 the prompt targets are jit ARGUMENTS, so
a NEW prompt at a warmed config is a cache hit too, not a fresh ~4.5 min
compile (the reference leans on lru_cache(1) warm restarts for the same
effect, cgd/clip_util.py:47, and re-runs its full Python loop per request).
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import shutil
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_DEVICE_LOCK = threading.Lock()  # one TPU context: serialize sampling only
_INFLIGHT = threading.Semaphore(3)  # 1 sampling + up to 2 in host prep


def _pipelined() -> bool:
    """CGD_TPU_SERVE_PIPELINE=0 restores the pre-r5 whole-request
    serialization (one lock around prep + sampling); the control arm of the
    serving-throughput A/B (PERF.md r5)."""
    return os.environ.get("CGD_TPU_SERVE_PIPELINE") != "0"

ALLOWED_KWARGS = {
    "image_size", "num_cutouts", "clip_guidance_scale", "tv_scale", "range_scale",
    "sat_scale", "init_scale", "batch_size", "class_cond", "cutout_power",
    "timestep_respacing", "seed", "diffusion_steps", "skip_timesteps",
    "clip_model_name", "randomize_class", "noise_schedule",
    "use_augs", "use_magnitude", "height_offset", "width_offset",
    "reduce_clip", "progressive_cutout", "cached_cutouts",
    "compute_dtype", "strict_parity", "fast_guidance", "dpm_solver",
}


def _open_generation(payload: dict, weights_mode: str, default_save_frequency,
                     stall_pet=None, mesh=None, device_lock=_DEVICE_LOCK):
    """Shared request prep for both response shapes: validate the payload,
    filter to the allowed api kwargs, create the scratch dir, construct the
    sampling generator. Returns (generator, scratch_dir) — the caller owns
    the dir. One definition so the final-frame and streaming paths can never
    drift (they differ only in save_frequency default and how frames are
    consumed)."""
    from cgd_tpu.api import clip_guided_diffusion

    prompt = payload.get("prompt", "")
    if not prompt:
        raise ValueError("missing 'prompt'")
    kwargs = {k: v for k, v in payload.items() if k in ALLOWED_KWARGS}
    out_dir = tempfile.mkdtemp(prefix="cgd_serve_")
    gen = clip_guided_diffusion(
        prompts=prompt.split("|"),
        prefix_path=out_dir,
        save_frequency=payload.get("save_frequency", default_save_frequency),
        progress=False,
        weights_mode=weights_mode,
        stall_pet=stall_pet,
        mesh=mesh,
        device_lock=device_lock,
        **kwargs,
    )
    return gen, out_dir


def _generate(payload: dict, weights_mode: str, stall_pet=None, mesh=None,
              device_lock=_DEVICE_LOCK):
    """Run one generation; returns (final_frame_path, scratch_dir). The
    caller owns the scratch dir and removes it once the frame is read —
    a long-running daemon must not accumulate per-request temp trees."""
    from cgd_tpu.validate import FINAL_FRAME_ONLY

    gen, out_dir = _open_generation(
        payload, weights_mode, FINAL_FRAME_ONLY,
        stall_pet=stall_pet, mesh=mesh, device_lock=device_lock,
    )
    try:
        last = None
        for _b, path in gen:
            last = path
        return last, out_dir
    except BaseException:
        # the caller only removes the dir on the success path — don't let a
        # failing request leak one cgd_serve_* tree per retry in the daemon
        shutil.rmtree(out_dir, ignore_errors=True)
        raise


def _generate_frames(payload: dict, weights_mode: str, stall_pet=None,
                     mesh=None, device_lock=_DEVICE_LOCK):
    """Yield (batch_idx, png_bytes) per saved frame as sampling produces
    them (the streaming counterpart of _generate). The scratch dir lives
    only while the generator is open; closing it — normally or via an
    abandoned stream — removes the tree."""
    gen, out_dir = _open_generation(
        payload, weights_mode, 25,  # streaming wants progress frames
        stall_pet=stall_pet, mesh=mesh, device_lock=device_lock,
    )
    try:
        for batch_idx, path in gen:
            with open(path, "rb") as f:
                yield batch_idx, f.read()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


STREAM_BOUNDARY = "cgdframe"
_STREAM_QUEUE_MAX = 32  # frames buffered ahead of a slow streaming client
_STREAM_WRITE_TIMEOUT = 300.0  # seconds per client write before giving up


def _offer(q, item):
    """Non-blocking queue put: when full, drop the OLDEST buffered frame to
    make room. multipart/x-mixed-replace semantics make this sound — each
    part replaces the previous, so a slow client sees fewer intermediate
    frames; the newest (ultimately the final) frame and the terminal
    done/error item are never the ones dropped."""
    while True:
        try:
            q.put_nowait(item)
            return
        except queue.Full:
            try:
                q.get_nowait()
            except queue.Empty:
                pass


def _pump_frames(payload, weights_mode, stall_timeout, mesh, q):
    """Streaming producer (runs in its own thread): drain the sampling
    generator at DEVICE speed, pushing ('frame', png, batch_idx) items into
    q, terminated by ('done', None, None) or ('error', exc, None). All
    device work — and the device lock held across it (api.py) — lives here;
    the handler thread only moves bytes to the client socket, so a slow or
    wedged reader can never stall the chip, wedge the lock, or starve the
    stall detector into killing the daemon."""
    import contextlib

    from cgd_tpu.utils.watchdog import StallDetector

    try:
        with StallDetector(stall_timeout, exit_on_stall=True) as dog:
            if _pipelined():
                lock_ctx, gen_lock = contextlib.nullcontext(), _DEVICE_LOCK
            else:  # control arm: serialize host prep too
                lock_ctx, gen_lock = _DEVICE_LOCK, None
            with lock_ctx:
                for batch_idx, png in _generate_frames(
                    payload, weights_mode, stall_pet=dog.pet,
                    mesh=mesh, device_lock=gen_lock,
                ):
                    _offer(q, ("frame", png, batch_idx))
        _offer(q, ("done", None, None))
    except BaseException as e:
        _offer(q, ("error", e, None))


class Handler(BaseHTTPRequestHandler):
    weights_mode = "auto"
    stall_timeout = 0.0  # seconds; armed per in-flight request (idle is not a stall)
    mesh = None  # jax.sharding.Mesh built from --mesh; shared by all requests

    def log_message(self, fmt, *args):  # quiet
        pass

    def do_GET(self):
        if self.path == "/healthz":
            import jax

            body = json.dumps(
                {"status": "ok", "backend": jax.default_backend(), "devices": len(jax.devices())}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def do_POST(self):
        if self.path != "/generate":
            self.send_error(404)
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
            if payload.get("stream"):
                self._stream_generate(payload)
                return
            with _INFLIGHT:  # bound burst prep memory; sampling itself is
                # serialized by _DEVICE_LOCK inside the generator, so this
                # request's host prep overlaps the in-flight device scan.
                # A hung device backend would wedge every future request too
                # (one TPU context) — exit 117 so the supervisor restarts the
                # daemon instead (cgd_tpu/utils/watchdog.py).
                from cgd_tpu.utils.watchdog import StallDetector

                with StallDetector(self.stall_timeout, exit_on_stall=True) as dog:
                    if _pipelined():
                        frame, scratch = _generate(
                            payload, self.weights_mode, stall_pet=dog.pet, mesh=self.mesh
                        )
                    else:  # control arm: serialize host prep too
                        with _DEVICE_LOCK:
                            frame, scratch = _generate(
                                payload, self.weights_mode, stall_pet=dog.pet,
                                mesh=self.mesh, device_lock=None,
                            )
            try:
                if frame is None:
                    raise RuntimeError("no frame produced")
                with open(frame, "rb") as f:
                    data = f.read()
            finally:
                shutil.rmtree(scratch, ignore_errors=True)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        except Exception as e:  # report, keep serving
            body = json.dumps({"error": str(e)}).encode()
            self.send_response(400)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    def _write_part(self, boundary: str, ctype: str, body: bytes, extra: str = ""):
        self.wfile.write(
            f"--{boundary}\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n{extra}\r\n".encode()
            + body + b"\r\n"
        )

    def _stream_generate(self, payload: dict):
        """`"stream": true`: multipart/x-mixed-replace, one image/png part
        per saved frame. The 200 + multipart headers are sent when the FIRST
        frame is ready, so EVERY pre-frame failure — missing prompt, invalid
        kwargs, unresolvable weights — surfaces as the same clean 400 as the
        non-stream path; a mid-run failure after frames have flowed becomes
        a final application/json part so the client can tell "finished" from
        "died". Sampling runs in a producer thread (_pump_frames) that never
        touches the client socket: a slow or wedged reader costs buffered
        intermediate frames (bounded queue, oldest dropped) and eventually
        its own connection (_STREAM_WRITE_TIMEOUT), never device idle time,
        the device lock, or a stall-detector daemon kill."""
        b = STREAM_BOUNDARY
        q = queue.Queue(maxsize=_STREAM_QUEUE_MAX)
        with _INFLIGHT:
            producer = threading.Thread(
                target=_pump_frames,
                args=(payload, self.weights_mode, self.stall_timeout,
                      self.mesh, q),
                daemon=True,
            )
            producer.start()
            try:
                kind, val, idx = q.get()
                if kind == "error":
                    raise val  # pre-frame failure -> do_POST's clean 400
                self.send_response(200)
                self.send_header(
                    "Content-Type", f"multipart/x-mixed-replace; boundary={b}"
                )
                self.end_headers()
                self.connection.settimeout(_STREAM_WRITE_TIMEOUT)
                try:
                    while kind == "frame":
                        self._write_part(
                            b, "image/png", val, f"X-Frame-Batch: {idx}\r\n"
                        )
                        self.wfile.flush()
                        kind, val, idx = q.get()
                    if kind == "error":  # mid-run failure after frames flowed
                        err = json.dumps({"error": str(val)}).encode()
                        self._write_part(b, "application/json", err)
                    self.wfile.write(f"--{b}--\r\n".encode())
                except (BrokenPipeError, ConnectionResetError, OSError):
                    return  # client went away/wedged; producer finishes alone
            finally:
                # keep the in-flight slot until the device work really ends
                producer.join()


def run_warmup(specs_args, mesh=None):
    """--warmup: compile the given operating points into the persistent XLA
    cache before the daemon binds its port. Uses the daemon's own
    FINAL_FRAME_ONLY segmentation — segment lengths are part of the compiled
    HLO, so warming with a different save_frequency would miss."""
    from cgd_tpu.utils.compile_cache import enable_compile_cache
    from cgd_tpu.validate import FINAL_FRAME_ONLY
    from cgd_tpu.warmup import parse_spec, warm_operating_points

    enable_compile_cache()
    specs = [parse_spec("256:ddim250:16" if s == "default" else s)
             for s in specs_args]
    warm_operating_points(specs, FINAL_FRAME_ONLY, mesh=mesh)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--weights-mode", default="auto", choices=["auto", "random"])
    ap.add_argument("--stall-timeout", type=float, default=0.0, metavar="SECONDS",
                    help="exit 117 (for supervisor restart) if an in-flight request "
                         "makes no progress for SECONDS; set above worst-case compile. "
                         "0 disables")
    ap.add_argument("--mesh", default=None, type=str, metavar="SPEC",
                    help="shard every generation across the visible TPU chips: "
                         "'auto', 'data=N', 'cut=M', or 'data=N,cut=M' "
                         "(same grammar as the cgd CLI)")
    ap.add_argument("--warmup", action="append", default=None,
                    metavar="SIZE:RESPACE[:CUTN]",
                    help="compile these operating points into the persistent "
                         "XLA cache BEFORE binding the port (repeatable; "
                         "'default' = 256:ddim250:16). Uses the daemon's own "
                         "final-frame-only segmentation so the first real "
                         "request is a cache hit, not a ~4.5 min cold compile "
                         "(PERF.md cold-start)")
    args = ap.parse_args(argv)
    if os.environ.get("CGD_TPU_FORCE_CPU"):
        # Must land before the first backend touch. JAX_PLATFORMS in the env
        # is NOT honored here (sitecustomize registers the axon TPU plugin at
        # interpreter start) — the config.update path wins. Used by the CPU
        # self-test arm of tools/serve_throughput.py and for off-tunnel runs.
        import jax

        jax.config.update("jax_platforms", "cpu")
    Handler.weights_mode = args.weights_mode
    Handler.stall_timeout = args.stall_timeout
    if args.mesh:
        from cgd_tpu.parallel.mesh import mesh_from_spec

        Handler.mesh = mesh_from_spec(args.mesh)
        if Handler.mesh is not None:
            shape = dict(zip(Handler.mesh.axis_names, Handler.mesh.devices.shape))
            print(f"serving with mesh {shape}")
    if args.warmup:
        run_warmup(args.warmup, mesh=Handler.mesh)
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"cgd-tpu serving on http://{args.host}:{args.port} (weights={args.weights_mode})")
    server.serve_forever()


if __name__ == "__main__":
    main()
