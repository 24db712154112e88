"""Serving-throughput A/B: pipelined daemon vs pre-r5 whole-request lock.

Measures requests/hour of `python -m cgd_tpu.serve` at a real operating
point, per arm:

  after  (default env)                — host prep overlaps the in-flight
                                        device scan; repeat-config requests
                                        reuse the previous run's jitted/AOT
                                        segment executables (api._SEG_CACHES)
  before (CGD_TPU_SERVE_PIPELINE=0,
          CGD_TPU_SEG_CACHE=0)        — one lock around the whole request,
                                        fresh trace/lower per request (the
                                        pre-r5 daemon behavior, re-created in
                                        this tree so both arms run the SAME
                                        compiled graphs)

Protocol per arm: fresh daemon process, wait for /healthz, ONE untimed warm
request (absorbs the per-process first-fetch claim handshake + compile-cache
load — PERF.md cold-start), then N timed requests with distinct prompts from
C closed-loop client threads. Reported wall = first request sent -> last
response read.

    python tools/serve_throughput.py --size 256 --respace ddim250 \
        --requests 6 --concurrency 2 --arms before,after

Self-test on CPU: add --tiny (debug-tiny models, 64px ddim10).
Every request uses a DISTINCT prompt, so the "after" arm's reuse win is the
honest serving case (new prompt, warmed config), not a same-prompt replay.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _post(base: str, payload: dict, timeout: float) -> bytes:
    req = urllib.request.Request(
        f"{base}/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        data = r.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise RuntimeError(f"non-PNG response ({len(data)} bytes)")
    return data


def _wait_healthy(base: str, deadline_s: float, proc=None) -> None:
    t0 = time.monotonic()
    while True:
        if proc is not None and proc.poll() is not None:
            raise RuntimeError(
                f"daemon exited rc={proc.returncode} before becoming healthy "
                "(port already bound by a stale process?)"
            )
        try:
            with urllib.request.urlopen(f"{base}/healthz", timeout=5) as r:
                json.loads(r.read())
                return
        except Exception:
            if time.monotonic() - t0 > deadline_s:
                raise TimeoutError("daemon never became healthy")
            time.sleep(1.0)


def run_arm(name: str, env_extra: dict, payload_base: dict, args) -> dict:
    port = args.port
    env = dict(os.environ, **env_extra)
    if args.tiny:
        env["CGD_TPU_DEBUG_TINY"] = "1"
        env["CGD_TPU_FORCE_CPU"] = "1"  # keep the self-test off the tunnel
    cmd = [sys.executable, "-m", "cgd_tpu.serve", "--port", str(port),
           "--weights-mode", "random"]
    log_path = os.path.join(tempfile.gettempdir(), f"serve_tp_{name}.log")
    log = open(log_path, "wb")
    proc = subprocess.Popen(cmd, cwd=REPO, env=env, stdout=log, stderr=log)
    base = f"http://127.0.0.1:{port}"
    try:
        _wait_healthy(base, 120, proc=proc)
        # warm request: handshake + compile-cache load + first trace
        t0 = time.monotonic()
        _post(base, dict(payload_base, prompt=f"warmup {name}"), args.timeout)
        warm_s = time.monotonic() - t0

        prompts = [f"throughput probe {name} {i}" for i in range(args.requests)]
        lat: list = [None] * args.requests
        idx_lock = threading.Lock()
        next_idx = [0]
        errors: list = []

        def worker():
            while True:
                with idx_lock:
                    i = next_idx[0]
                    if i >= args.requests:
                        return
                    next_idx[0] += 1
                t = time.monotonic()
                try:
                    _post(base, dict(payload_base, prompt=prompts[i]), args.timeout)
                    lat[i] = time.monotonic() - t
                except Exception as e:  # pragma: no cover - surfaced below
                    errors.append(f"req {i}: {e}")
                    return

        t0 = time.monotonic()
        threads = [threading.Thread(target=worker) for _ in range(args.concurrency)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        if errors:
            raise RuntimeError("; ".join(errors))
        done = [x for x in lat if x is not None]
        return {
            "arm": name, "warm_s": round(warm_s, 1),
            "requests": len(done), "wall_s": round(wall, 1),
            "s_per_request": round(wall / len(done), 2),
            "req_per_hour": round(3600.0 * len(done) / wall, 1),
            "mean_latency_s": round(sum(done) / len(done), 2),
        }
    except Exception:
        print(f"[{name}] daemon log: {log_path}", file=sys.stderr)
        raise
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        log.close()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--respace", default="ddim250")
    ap.add_argument("--cutn", type=int, default=16)
    ap.add_argument("--clip", default="ViT-B/32")
    ap.add_argument("--requests", type=int, default=6)
    ap.add_argument("--concurrency", type=int, default=2)
    ap.add_argument("--port", type=int, default=18321)
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument("--arms", default="before,after")
    ap.add_argument("--tiny", action="store_true",
                    help="debug-tiny models on CPU (self-test); defaults "
                         "size/respace/cutn to 64/ddim10/2 unless overridden")
    args = ap.parse_args(argv)
    if args.tiny:
        defaults = {"size": 64, "respace": "ddim10", "cutn": 2}
        for k, v in defaults.items():
            if getattr(args, k) == ap.get_default(k):
                setattr(args, k, v)

    payload = {
        "image_size": args.size, "timestep_respacing": args.respace,
        "num_cutouts": args.cutn, "clip_model_name": args.clip,
    }
    arm_envs = {
        "before": {"CGD_TPU_SERVE_PIPELINE": "0", "CGD_TPU_SEG_CACHE": "0"},
        "after": {},
    }
    results = []
    for name in args.arms.split(","):
        res = run_arm(name, arm_envs[name], payload, args)
        results.append(res)
        print(json.dumps(res), flush=True)
    if len(results) == 2:
        b, a = results[0]["req_per_hour"], results[1]["req_per_hour"]
        print(json.dumps({"speedup": round(a / b, 3)}))


if __name__ == "__main__":
    main()
