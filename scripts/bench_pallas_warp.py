#!/usr/bin/env python
"""v5e measurement for the Pallas warp kernel (ops/pallas/warp.py) — closes
SURVEY §2.1's directive with numbers: the NPP bicubic warp
(/root/reference/lib/_npp/nppig.cpp:48-104) rebuilt as a kernel-level TPU
component, measured against every alternative formulation of the same math:

  pallas      one-hot selection-matrix kernel (MXU row contraction + VPU taps)
  onehot_xla  the same formulation in pure XLA (lax.map over row chunks)
  gather      ops/warp.py (XLA gather taps — the round-2 anti-lesson path)
  host_cv2    cv2.warpAffine on the host (the production augmenter path),
              timed standalone for scale (full frame, not bbox-restricted)

Protocol: augmenter-shaped work — one 480x854x3 uint8-scale f32 frame,
rotation+scale+translation affine, bicubic. Device timings use the marginal
in-program-loop method from CLAUDE.md (lax.scan over N applications, value
download as the fence; per-call dispatch ~1 ms on this tunnel would swamp a
single-shot timing): cost = (t(n2) - t(n1)) / (n2 - n1).

Run: timeout 570 python scripts/bench_pallas_warp.py   (TPU; ~2 min warm)
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from frtm_tpu.ops.warp import warp_affine
from frtm_tpu.ops.pallas.warp import warp_affine_onehot, warp_affine_pallas

SIZE = (480, 854)
H_MAT = np.asarray([[0.94, -0.34, 40.0], [0.34, 0.94, -25.0],
                    [0.0, 0.0, 1.0]], np.float32)  # ~20 deg rotation + shift


def marginal_ms(fn, src, n1=4, n2=12):
    """Marginal per-application device time of fn(src) via in-program loops."""
    def loop(n):
        @jax.jit
        def run(x):
            def body(c, _):
                y = fn(c)
                # keep the loop's dataflow honest: feed a reduced residue back
                return c + 0.0 * jnp.mean(y), ()
            c, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.mean(c)
        return run

    r1, r2 = loop(n1), loop(n2)
    float(r1(src)); float(r2(src))            # compile both
    t = {}
    for name, r in (("n1", r1), ("n2", r2)):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(r(src))                      # value download = real fence
            best = min(best, time.perf_counter() - t0)
        t[name] = best
    return (t["n2"] - t["n1"]) / (n2 - n1) * 1000.0


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    src_np = (rng.rand(*SIZE, 3) * 255.0).astype(np.float32)
    src = jnp.asarray(src_np)

    fns = {
        "pallas": lambda x: warp_affine_pallas(x, H_MAT, SIZE, "bicubic"),
        "onehot_xla": lambda x: warp_affine_onehot(x, H_MAT, SIZE, "bicubic"),
        "gather": lambda x: warp_affine(x, H_MAT, SIZE, "bicubic"),
    }

    # exactness first (vs the gather warp, itself cv2-pinned in test_ops);
    # a failing formulation is reported and skipped, not fatal — the other
    # formulations' numbers are the point of this record
    want = np.asarray(jax.jit(fns["gather"])(src))
    scale = np.abs(want).max()
    for name in ("pallas", "onehot_xla"):
        try:
            got = np.asarray(jax.jit(fns[name])(src))
            rel = np.abs(got - want).max() / scale
            print(f"{name}: max rel diff vs gather = {rel:.2e}", flush=True)
            assert rel < 1e-4, (name, rel)
        except Exception as e:
            print(f"{name}: EXACTNESS RUN FAILED "
                  f"({type(e).__name__}: {str(e)[:300]})", flush=True)
            fns.pop(name)

    for name, fn in fns.items():
        try:
            ms = marginal_ms(fn, src)
            print(f"{name}: {ms:.2f} ms / 3-channel {SIZE} bicubic warp",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)

    try:
        import cv2
        Hcv = H_MAT[:2]
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            cv2.warpAffine(src_np, Hcv, (SIZE[1], SIZE[0]),
                           flags=cv2.INTER_CUBIC, borderMode=cv2.BORDER_CONSTANT)
            best = min(best, time.perf_counter() - t0)
        print(f"host_cv2: {best * 1000:.2f} ms (full frame, standalone host)",
              flush=True)
    except ImportError:
        print("host_cv2: cv2 unavailable", flush=True)


if __name__ == "__main__":
    main()
