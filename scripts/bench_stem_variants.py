#!/usr/bin/env python
"""Compare lowerings of the ResNet stem conv (7x7/s2/cin=3, 480x854) on the
real chip. Candidates:
  direct  — lax conv as-is (measured 2.24 ms @ B=16, ~7% MXU)
  s2d2    — 2x2 space-to-depth: conv 1.36 ms but the NHWC transpose costs
            ~1.1 ms on top (net worse; kept for the record)
  wfold2  — fold W by 2 into channels: FREE contiguous reshape, cin=6,
            kernel (7,4), strides (2,1)
  wfold4  — pad W to 856, fold by 4: FREE reshapes in AND out (output
            phase rides the channel dim), cin=12, cout=128, kernel (7,4),
            strides (2,1)
Run with --check on CPU first: all variants must match the direct lowering.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_variants():
    import numpy as np
    import jax.numpy as jnp
    from jax import lax

    DN = ("NHWC", "HWIO", "NHWC")

    def direct(x, k):
        return lax.conv_general_dilated(x, k, (2, 2), [(3, 3), (3, 3)],
                                        dimension_numbers=DN)

    def s2d2(x, k):
        from frtm_tpu.ops.conv import _conv7x7_s2_s2d
        return _conv7x7_s2_s2d(x, k)

    def wfold2(x, k):
        n, h, w, ci = x.shape
        y = x.reshape(n, h, w // 2, 2 * ci)  # free: W-major grouping
        co = k.shape[3]
        # k4[a, be+2, (v,c), o] = k7[a, 2*be+v+3, c, o]
        M = np.zeros((7, 4, 2), np.float32)
        for b in range(7):
            be, v = divmod(b - 3, 2)
            M[b, be + 2, v] = 1.0
        k4 = jnp.einsum("abcd,bBv->aBvcd", k.astype(jnp.float32),
                        jnp.asarray(M))
        k4 = k4.reshape(7, 4, 2 * ci, co).astype(k.dtype)
        out = lax.conv_general_dilated(y, k4, (2, 1), [(3, 3), (2, 1)],
                                       dimension_numbers=DN)
        return out

    def wfold4(x, k):
        n, h, w, ci = x.shape
        wp = -(-w // 4) * 4  # 854 -> 856
        wout = (w + 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        y = x.reshape(n, h, wp // 4, 4 * ci)  # free
        co = k.shape[3]
        # out col j = 2J+p: k4[a, be+1, (v,c), (p,o)] = k7[a, b, c, o]
        # where 2p + b - 3 = 4*be + v
        M = np.zeros((7, 2, 4, 4), np.float32)  # b, p, be+1, v
        for b in range(7):
            for p in range(2):
                be, v = divmod(2 * p + b - 3, 4)
                M[b, p, be + 1, v] = 1.0
        k4 = jnp.einsum("abcd,bpBv->aBvcpd", k.astype(jnp.float32),
                        jnp.asarray(M))
        k4 = k4.reshape(7, 4, 4 * ci, 2 * co).astype(k.dtype)
        out = lax.conv_general_dilated(y, k4, (2, 1), [(3, 3), (1, 2)],
                                       dimension_numbers=DN)
        n2, h2, w2, _ = out.shape
        out = out.reshape(n2, h2, w2 * 2, co)  # free: (J,p,o) -> (2J+p, o)
        return out[:, :, :wout]

    return dict(direct=direct, s2d2=s2d2, wfold2=wfold2, wfold4=wfold4)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    check = "--check" in sys.argv
    if check:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    variants = make_variants()

    rng = np.random.default_rng(0)
    if check:
        for h, w, ci, co in [(480, 854, 3, 64), (32, 46, 3, 8), (16, 20, 4, 6)]:
            x = jnp.asarray(rng.standard_normal((2, h, w, ci)).astype(np.float32))
            k = jnp.asarray(rng.standard_normal((7, 7, ci, co)).astype(np.float32))
            ref = np.asarray(variants["direct"](x, k))
            for name in ("s2d2", "wfold2", "wfold4"):
                got = np.asarray(variants[name](x, k))
                err = np.abs(got - ref).max() / np.abs(ref).max()
                print(f"{name} {h}x{w} ci={ci} co={co}: shape {got.shape} "
                      f"relerr {err:.2e}")
                assert got.shape == ref.shape and err < 1e-5, name
        print("all exact")
        return

    # TPU: marginal timing via an in-program scan (per-call dispatch is
    # ~1 ms through the tunnel, CLAUDE.md methodology)
    import time
    B = 16
    x = jnp.asarray(rng.integers(0, 255, (B, 480, 854, 3)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray((rng.standard_normal((7, 7, 3, 64)) * 0.05
                     ).astype(np.float32)).astype(jnp.bfloat16)

    from functools import partial

    @partial(jax.jit, static_argnames=("name", "n"))
    def loop(x, k, name, n):
        def body(c, _):
            out = variants[name](x + c.astype(x.dtype), k)
            return jnp.float32(jnp.sum(out.astype(jnp.float32))) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    for name in ("direct", "s2d2", "wfold2", "wfold4"):
        ts = {}
        for n in (20, 60):
            float(loop(x, k, name, n))  # compile+warm
            t0 = time.perf_counter()
            float(loop(x, k, name, n))
            ts[n] = time.perf_counter() - t0
        per = (ts[60] - ts[20]) / 40 * 1000
        print(f"{name:8s} marginal {per:7.3f} ms/call (B={B})")


if __name__ == "__main__":
    main()
