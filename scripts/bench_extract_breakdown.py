#!/usr/bin/env python
"""Attribute the backbone-extract device time per ResNet stage on the real
chip (extract is the largest device-busy chunk of a tracked sequence:
~73 ms of ~175 ms per 65-frame pass, CLAUDE.md trace). Uses the per-stage
jax.named_scope annotations in models/resnet.py and the xprof op-stats
recipe from scripts/parse_trace.py.

Usage: python scripts/bench_extract_breakdown.py [batch]
"""
import glob
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from frtm_tpu.models.resnet import init_resnet, extract_features

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    arch = "resnet101"
    layers = ("layer5", "layer4", "layer3", "layer2")
    params = init_resnet(jax.random.PRNGKey(0), arch)
    imgs = jnp.asarray(np.random.randint(0, 256, (B, 480, 854, 3), np.uint8))

    fn = jax.jit(lambda p, x: extract_features(
        p, x, arch, output_layers=layers,
        dtype=jnp.bfloat16, out_dtype=jnp.bfloat16))
    out = fn(params, imgs)
    # block via value download: block_until_ready is unreliable on this
    # tunnel (CLAUDE.md microbench methodology)
    float(jnp.sum(out["layer5"].astype(jnp.float32)))

    trace_dir = f"/tmp/xtrace_extract_{os.getpid()}"
    jax.profiler.start_trace(trace_dir)
    out = fn(params, imgs)
    float(jnp.sum(out["layer5"].astype(jnp.float32)))
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data as rtd
    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    tbl = json.loads(data if isinstance(data, str) else data.decode())[0]

    by_scope = defaultdict(float)
    busy = 0.0
    for r in tbl["rows"]:
        c = [x["v"] for x in r["c"]]
        if c[1] != "Device" or c[2] == "IDLE":
            continue
        busy += c[5]
        name = str(c[3])
        scope = "other"
        for tag in ("stem", "stage1", "stage2", "stage3", "stage4"):
            if tag in name:
                scope = tag
                break
        by_scope[scope] += c[5]
    print(f"batch={B} total device busy {busy / 1000:.2f} ms "
          f"({busy / 1000 / B:.3f} ms/frame)")
    for k in ("stem", "stage1", "stage2", "stage3", "stage4", "other"):
        if k in by_scope:
            print(f"  {k:8s} {by_scope[k] / 1000:8.2f} ms "
                  f"({100 * by_scope[k] / busy:4.1f}%)")

    # top 12 ops for shape-level detail
    print("top ops:")
    shown = 0
    for r in tbl["rows"]:
        c = [x["v"] for x in r["c"]]
        if c[1] != "Device" or c[2] == "IDLE":
            continue
        print(f"  {c[5] / 1000:8.2f} ms  {str(c[3])[:110]}")
        shown += 1
        if shown >= 12:
            break


if __name__ == "__main__":
    main()
