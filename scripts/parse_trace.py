#!/usr/bin/env python
"""Summarise a jax.profiler trace (xplane.pb) without TensorBoard: top device
ops, busy/idle split. Companion to frtm_tpu.utils.profiling.xla_trace.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \\
           python scripts/parse_trace.py /tmp/xtrace [top_n]
"""
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from xprof.convert import raw_to_tool_data as rtd
    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        print(f"no xplane.pb under {trace_dir}")
        sys.exit(1)
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    tbl = json.loads(data if isinstance(data, str) else data.decode())[0]
    rows = tbl["rows"]

    busy = sum(r["c"][7]["v"] for r in rows
               if r["c"][1]["v"] == "Device" and r["c"][2]["v"] != "IDLE")
    idle = sum(r["c"][7]["v"] for r in rows if r["c"][2]["v"] == "IDLE")
    print(f"device busy: {busy / 1000:.1f} ms, idle: {idle / 1000:.1f} ms")
    print(f"{'occ':>5} {'tot_ms':>9} {'avg_us':>9}  op")
    shown = 0
    for r in rows:
        c = [x["v"] for x in r["c"]]
        if c[1] != "Device" or c[2] == "IDLE":
            continue
        print(f"{c[4]:5.0f} {c[5] / 1000:9.2f} {c[6]:9.1f}  {str(c[3])[:100]}")
        shown += 1
        if shown >= top_n:
            break


if __name__ == "__main__":
    main()
