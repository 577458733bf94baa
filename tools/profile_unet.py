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

    # FLOPs: XLA's cost analysis counts 0 for Pallas custom calls, so the
    # step's FLOPs = cost_analysis of the MAIN compiled program + the
    # Pallas kernels' FLOPs computed from their custom-call operand
    # shapes in the compiled HLO (``pallas_flops``). Validated against an
    # all-XLA lowering of the same math where that compiles (flagship:
    # 11.85 + 2.42 = 14.27 vs the all-XLA/hand-derived 14.3 TFLOP; the
    # all-XLA ZeroScope program CANNOT compile — its unblocked 9216-token
    # attention would materialise an 81 GB score tensor).
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        main_flops = float(ca.get("flops", 0.0))
        kernel_flops, per_kernel = pallas_flops(compiled.as_text())
        flops = main_flops + kernel_flops
        print(f"[{name}] flops: main {main_flops / 1e12:.2f} + pallas "
              f"{kernel_flops / 1e12:.2f} "
              f"({ {k: round(v / 1e12, 2) for k, v in per_kernel.items()} })"
              f" = {flops / 1e12:.2f} TFLOP", flush=True)
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


def pallas_flops(hlo_text: str) -> tuple[float, dict]:
    """FLOPs of the Pallas custom calls in compiled HLO, from their
    ``operand_layout_constraints`` shapes + the source kernel file.
    Attention: 4·B·N·S·D (scores + values; head-count independent for
    packed layouts since Σ_h N·S·dh = N·S·HD). Flash backward (≥5 rank-3
    operands): 2.5× the forward. Rel-pos temporal attention adds the
    score/value bias dots (+dh). Temporal-conv chain layer: three C×N
    GEMMs per token."""
    total = 0.0
    by: dict[str, float] = {}
    for line in hlo_text.splitlines():
        if ("tpu_custom_call" not in line
                or "operand_layout_constraints" not in line):
            continue
        seg = line.split("operand_layout_constraints={", 1)[1]
        seg = seg.split("}, frontend_attributes")[0].split("}, metadata")[0]
        src = re.search(r'source_file="[^"]*/([a-z_0-9]+)\.py"', line)
        if not src:
            continue
        kern = src.group(1)
        shapes = [
            tuple(int(d) for d in s.split(",") if d)
            for s in re.findall(r"[a-z0-9]+\[([0-9,]*)\]", seg)
        ]
        shapes3 = [s for s in shapes if len(s) >= 3]
        fl = 0.0
        if kern in ("fused_mha", "flash_attention") and len(shapes3) >= 2:
            q, k = shapes3[0], shapes3[1]
            B, N, D = q[-3:]
            S = k[-2]
            fl = 4.0 * B * N * S * D
            if len(shapes3) >= 5:
                fl *= 2.5  # FA2 backward: dk/dv + dq recompute passes
        elif kern == "relpos_mha" and len(shapes3) >= 4:
            x, k2 = shapes3[0], shapes3[3]
            BB, T, N, HD = x
            fl = 4.0 * BB * T * T * N * (HD + k2[-1])
        elif kern == "temporal_conv":
            x = next((s for s in shapes3 if len(s) >= 4), None)
            # weight is (3, C, N); the (B, 2, C) stats operand is excluded
            # by its middle dim even when B == 3
            w = next(
                (s for s in shapes3 if len(s) == 3 and s[0] == 3
                 and s[1] != 2),
                None,
            )
            if x is None or w is None:
                continue
            toks = 1
            for d in x[:-1]:
                toks *= d
            fl = 2.0 * 3 * toks * w[1] * w[2]
        total += fl
        by[kern] = by.get(kern, 0.0) + fl
    return total, by


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
