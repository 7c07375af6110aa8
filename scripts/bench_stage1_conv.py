#!/usr/bin/env python
"""Is the tap-sum dispatch worth extending to 64 channels? Stage1 of rn101
runs at ~10% MXU utilisation (scripts/bench_extract_breakdown.py: 3.16 ms of
18.4 ms @ B=16); its 3x3 convs are 64->64 at 120x214 — just above the
measured _TAPSUM_MAX_CH=48 gate. Marginal-scan timing on the real chip.
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from frtm_tpu.ops.conv import conv2d, _conv3x3_tapsum

    rng = np.random.default_rng(0)
    B = 16
    x = jnp.asarray(rng.standard_normal((B, 120, 214, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray((rng.standard_normal((3, 3, 64, 64)) * 0.05
                     ).astype(np.float32)).astype(jnp.bfloat16)

    variants = {
        "direct": lambda x, k: conv2d(x, k, tapsum=False),
        "tapsum": lambda x, k: _conv3x3_tapsum(x, k),
    }

    @partial(jax.jit, static_argnames=("name", "n"))
    def loop(x, k, name, n):
        def body(c, _):
            out = variants[name](x + c.astype(x.dtype), k)
            return jnp.float32(jnp.sum(out.astype(jnp.float32))) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c

    for name in variants:
        ts = {}
        for n in (20, 60):
            float(loop(x, k, name, n))
            t0 = time.perf_counter()
            float(loop(x, k, name, n))
            ts[n] = time.perf_counter() - t0
        per = (ts[60] - ts[20]) / 40 * 1000
        print(f"{name:8s} marginal {per:7.3f} ms/call "
              f"(B={B}, 120x214, 64->64 3x3)")


if __name__ == "__main__":
    main()
