"""Generate ResizeRight parity goldens (tests/goldens/resize_right.npz).

Runs the reference's vendored ResizeRight (read-only oracle at
/root/reference/cgd/ResizeRight) on fixed random inputs and records outputs.
One-off: needs the reference tree; the test suite only reads the npz.
"""

import importlib.util
import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import types

import numpy as np

REF = "/root/reference/cgd/ResizeRight"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    pkg = types.ModuleType("cgd")
    pkg.__path__ = []
    sub = types.ModuleType("cgd.ResizeRight")
    sub.__path__ = []
    sys.modules["cgd"], sys.modules["cgd.ResizeRight"] = pkg, sub
    im = _load("cgd.ResizeRight.interp_methods", f"{REF}/interp_methods.py")
    sub.interp_methods = im
    rr = _load("cgd.ResizeRight.resize_right", f"{REF}/resize_right.py")

    rs = np.random.RandomState(0)
    cases = [
        ("down_48x40_to_32x24", (48, 40, 3), (32, 24, 3), "lanczos3"),
        ("down_128x96_to_64x64", (128, 96, 3), (64, 64, 3), "lanczos3"),
        ("odd_37x53_to_29x41", (37, 53, 3), (29, 41, 3), "lanczos3"),
        ("up_64x64_to_224x224", (64, 64, 3), (224, 224, 3), "lanczos3"),
        ("mixed_50x70_to_75x35", (50, 70, 3), (75, 35, 3), "lanczos3"),
        ("cubic_48x40_to_32x24", (48, 40, 3), (32, 24, 3), "cubic"),
        ("linear_48x40_to_32x24", (48, 40, 3), (32, 24, 3), "linear"),
    ]
    out = {}
    for name, ins, outs, method in cases:
        img = rs.rand(*ins).astype(np.float32)
        ref = rr.resize(
            img, out_shape=list(outs), interp_method=getattr(im, method),
            antialiasing=True, by_convs=False,
        )
        out[f"{name}__in"] = img
        out[f"{name}__out"] = np.asarray(ref, np.float32)
        out[f"{name}__method"] = np.array(method)
    np.savez_compressed("tests/goldens/resize_right.npz", **out)
    print(f"wrote {len(cases)} cases")


if __name__ == "__main__":
    main()
