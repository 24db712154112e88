"""Parse a jax.profiler xplane.pb directly and print per-op self-time stats.

The tensorboard_plugin_profile gviz converter is broken on this box
(protobuf version skew), so this reads the xplane with
tensorflow.tsl.profiler.protobuf.xplane_pb2 and aggregates the "XLA Ops"
line: per-op-name total self time, grouped into coarse categories
(fusion / pallas / copy / pad / reshape / convolution / ...).

Usage:
  python tools/xplane_stats.py /tmp/cgd_profile [--steps 4] [--top 40]
"""

import argparse
import collections
import glob
import os
import sys

# the tsl xplane protos predate this box's C++ protobuf runtime; the
# pure-Python implementation parses them (must land before google.protobuf)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_xplane(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def categorize(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "conv3x3" in n or "custom-call" in n and "mosaic" in n:
        return "pallas"
    if "custom-call" in n:
        # optimized-HLO names lose the pallas marker; the conv kernels are
        # recognizable by a full 4-d HWIO [3,3,Cin,Cout] weight operand
        # together with the jvp/conv naming XLA gives their fwd/transpose
        # computations (512px profile: 73 ms/step of 'other' before this
        # rule). The bare "[3,3," substring alone also matches unrelated
        # custom-calls whose first operand merely starts with that shape.
        import re

        if re.search(r"\[3,3,\d+,\d+\]", n) and ("jvp" in n or "conv" in n):
            return "pallas"
        return "custom-call"
    for key in ("fusion", "copy", "convolution", "reshape", "transpose",
                "pad", "slice", "dot", "dynamic-update", "scatter", "gather",
                "reduce", "bitcast", "broadcast", "select", "iota", "rng",
                "concatenate", "tuple", "all-reduce", "convert"):
        if n.startswith(key) or f".{key}" in n or key in n.split(".")[0]:
            return key
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=4,
                    help="divide totals by this to get per-step ms")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    planes = sorted(glob.glob(f"{args.trace_dir}/**/*.xplane.pb", recursive=True))
    if not planes:
        print("no xplane found", file=sys.stderr)
        sys.exit(1)
    xs = load_xplane(planes[-1])

    per_op = collections.Counter()   # name -> total ps
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = ev_meta[ev.metadata_id]
                per_op[meta.name] += ev.duration_ps

    if not per_op:
        print("no 'XLA Ops' line found; planes were:", file=sys.stderr)
        for plane in xs.planes:
            print(f"  {plane.name}: {[l.name for l in plane.lines]}", file=sys.stderr)
        sys.exit(1)

    total_ms = sum(per_op.values()) / 1e9
    print(f"total device op time: {total_ms:.1f} ms "
          f"({total_ms / args.steps:.1f} ms/step over {args.steps} steps)\n")

    cats = collections.Counter()
    for name, ps in per_op.items():
        cats[categorize(name)] += ps
    print("== categories (ms/step) ==")
    for cat, ps in cats.most_common():
        print(f"  {ps / 1e9 / args.steps:7.2f}  {cat}")

    print(f"\n== top {args.top} ops (ms/step) ==")
    for name, ps in per_op.most_common(args.top):
        print(f"  {ps / 1e9 / args.steps:7.3f}  {name[:140]}")


if __name__ == "__main__":
    main()
