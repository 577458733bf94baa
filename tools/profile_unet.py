"""Profile one fused-CFG UNet denoise step on the real TPU chip.

Compiles the full-scale ModelScope UNetSD (bf16) at the benchmark shape
(24 frames, 32x32 latents, CFG pair), captures a jax.profiler device
trace over 3 varied-input steps, dumps the optimized HLO, and prints a
per-category device-time breakdown. The device trace is the ONLY
reliable timing through the axon tunnel (see CLAUDE.md / the verify
skill): wall-clock `block_until_ready` timings are meaningless there.

Usage:
    python tools/profile_unet.py [tag]      # ModelScope (default family)
    python tools/profile_unet.py vc_tag vc  # VideoCrafter UNet

Artifacts: /tmp/t2v_profile_<tag>/ (trace), /tmp/unet_hlo_<tag>.txt.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

# Running as `python tools/profile_unet.py` puts tools/ (not the repo root)
# at sys.path[0]; PYTHONPATH must stay unset when driving the TPU (see
# .claude/skills/verify/SKILL.md), so fix the path in-process.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TAG = sys.argv[1] if len(sys.argv) > 1 else "cur"
FAMILY = sys.argv[2] if len(sys.argv) > 2 else "modelscope"
TRACE = f"/tmp/t2v_profile_{TAG}"
HLO = f"/tmp/unet_hlo_{TAG}.txt"


def main() -> None:
    from t2v.core.compile_cache import enable_compile_cache
    from t2v.core.dtypes import Policy

    enable_compile_cache()

    F, H, W = 24, 32, 32
    if FAMILY == "vc":
        from t2v.models.videocrafter_unet import (
            VideoCrafterUNet,
            VideoCrafterUNetConfig,
        )

        cfg = VideoCrafterUNetConfig()
        model = VideoCrafterUNet(cfg=cfg, policy=Policy.bf16())
        F = 16  # VC default temporal_length
        in_dim, ctx_dim = cfg.in_channels, cfg.context_dim
    else:
        from t2v.core.config import ModelScopeUNetConfig
        from t2v.models.modelscope_unet import UNetSD

        cfg = ModelScopeUNetConfig()
        model = UNetSD(cfg=cfg, policy=Policy.bf16())
        in_dim, ctx_dim = cfg.in_dim, cfg.context_dim
    x = jnp.zeros((2, F, H, W, in_dim), jnp.bfloat16)
    t = jnp.zeros((2,), jnp.float32)
    ctx = jnp.zeros((2, 77, ctx_dim), jnp.bfloat16)

    t0 = time.time()
    print("init compile...", flush=True)
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
    jax.block_until_ready(params)
    print(f"init done in {time.time() - t0:.1f}s", flush=True)

    step = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))
    t0 = time.time()
    print("step compile...", flush=True)
    np.asarray(step(params, x, t, ctx)).sum()
    print(f"step compiled in {time.time() - t0:.1f}s", flush=True)

    keys = [jax.random.key(i) for i in range(5)]
    xs = [jax.random.normal(k, x.shape, jnp.bfloat16) for k in keys]
    ts = [jnp.full((2,), 100.0 + i) for i in range(5)]
    for xx, tt in zip(xs[:2], ts[:2]):  # warmup, fresh inputs
        np.asarray(step(params, xx, tt, ctx)).sum()

    jax.profiler.start_trace(TRACE)
    for xx, tt in zip(xs[:3], ts[:3]):
        np.asarray(step(params, xx, tt, ctx)).sum()
    jax.profiler.stop_trace()

    open(HLO, "w").write(step.lower(params, x, t, ctx).compile().as_text())
    print(f"hlo dumped to {HLO}", flush=True)
    report(TRACE, n_steps=3)


def report(trace_dir: str, n_steps: int) -> None:
    """Aggregate device op time by fusion category from the latest trace."""
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not files:
        print(f"no trace found under {trace_dir}")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "Core" in n}
    cats = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or "XLA Modules" in pid_names.get(e["pid"], ""):
            continue
        if name.isdigit():
            # run-id container event spanning a whole executable launch —
            # its duration is the sum of the op events inside it (seen on
            # donated-state train steps); counting it doubles every op
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        cats[re.sub(r"[.\d]+$", "", name)] += dur
        total += dur
    print(f"\n== {total / n_steps:.1f} ms/step "
          f"(device total {total:.1f} ms over {n_steps}) ==")
    for c, d in cats.most_common(14):
        print(f"{d / n_steps:8.2f} ms/step  {100 * d / total:5.1f}%  {c}")


if __name__ == "__main__":
    main()
