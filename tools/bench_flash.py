"""Microbench the Pallas flash kernel at the tracked hi-res shapes.

Round-4 verdict weak #4: flash blocks were tuned at 1024-token sequences;
ZeroScope 1024×576 runs 9216-token spatial attention (485 ms/step, 27% of
the step — round-5 trace). This tool times candidate (block_q, block_kv)
pairs at the real shapes through the device trace (the only trustworthy
timing through the axon tunnel — see the verify skill) and prints ms per
call, so docs/PERF.md block choices are measurements, not guesses.

Usage: python tools/bench_flash.py [shape ...]
Shapes: zs0 (240×9216), zs1 (480×2304), zs2 (960×576), t125 (temporal 125f)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = {
    # ZeroScope spatial self-attention per level (B = 2·24·heads)
    "zs0": (240, 9216, 9216, 64),
    "zs1": (480, 2304, 2304, 64),
    "zs2": (960, 576, 576, 64),
    # 125f temporal attention in flash form (B = 2·H·W·heads, N = 125)
    "t125": (10240, 125, 125, 64),
}

CANDIDATES = [
    (1024, 1024), (1536, 1024), (3072, 1024), (768, 768), (1024, 512),
    (2048, 1024), (1536, 1536), (512, 1024),
]


def device_ms(trace_dir: str) -> float:
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "Core" in n}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.isdigit():
            continue
        if "XLA Modules" in pid_names.get(e["pid"], ""):
            continue
        total += e.get("dur", 0) / 1e3
    return total


def bench(tag: str) -> None:
    from t2v.kernels.flash_attention import flash_attention

    B, N, S, D = SHAPES[tag]
    print(f"== {tag}: B={B} N={N} S={S} D={D} "
          f"({4 * B * N * S * D / 1e12:.2f} TFLOP/call) ==", flush=True)
    ks = jax.random.split(jax.random.key(0), 9)
    qs = [jax.random.normal(k, (B, N, D), jnp.bfloat16) for k in ks[:3]]
    kk = [jax.random.normal(k, (B, S, D), jnp.bfloat16) for k in ks[3:6]]
    vs = [jax.random.normal(k, (B, S, D), jnp.bfloat16) for k in ks[6:9]]
    for bq, bkv in CANDIDATES:
        f = jax.jit(
            lambda q, k, v: flash_attention(q, k, v, block_q=bq, block_kv=bkv)
        )
        try:
            np.asarray(f(qs[0], kk[0], vs[0])).sum()  # compile+warm
            np.asarray(f(qs[1], kk[1], vs[1])).sum()
            trace = f"/tmp/flashbench_{tag}_{bq}_{bkv}"
            jax.profiler.start_trace(trace)
            for i in range(3):
                np.asarray(f(qs[i], kk[i], vs[i])).sum()
            jax.profiler.stop_trace()
            ms = device_ms(trace) / 3
            tfs = 4 * B * N * S * D / 1e12 / (ms / 1e3)
            print(f"  bq={bq:5d} bkv={bkv:5d}  {ms:8.2f} ms  "
                  f"{tfs:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"  bq={bq:5d} bkv={bkv:5d}  FAILED: {str(e)[:120]}",
                  flush=True)


def main() -> None:
    tags = sys.argv[1:] or ["zs0", "zs1"]
    for t in tags:
        bench(t)


if __name__ == "__main__":
    main()
