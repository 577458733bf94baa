"""Tracing / profiling / run provenance — first-class (SURVEY.md §5.1, §5.5).

The reference has only wall-clock prints and tqdm; here:
  * ``phase(name)``        — context manager timing a pipeline phase
    (text encode / sample / decode / stitch), accumulated per run;
  * ``trace(dir)``         — jax.profiler trace wrapper (device + host);
  * ``RunManifest``        — structured provenance written next to outputs,
    superseding the reference's infotext/args.txt triple-write
    (process_modelscope.py:236-254) with a machine-readable record.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import platform
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class PhaseTimes:
    times: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        return " ".join(f"{k}={v:.2f}s" for k, v in self.times.items())


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """jax.profiler trace scope; no-op when trace_dir is None."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RunManifest:
    """Machine-readable generation record (one per batch output dir)."""

    prompt: str = ""
    n_prompt: str = ""
    sampler: str = ""
    steps: int = 0
    frames: int = 0
    seed: int = 0
    cfg_scale: float = 0.0
    width: int = 0
    height: int = 0
    model: str = ""
    model_type: str = ""
    eta: float = 0.0
    strength: float | None = None
    framework_version: str = ""
    backend: str = ""
    device_count: int = 0
    phase_times: dict[str, float] = field(default_factory=dict)
    extra: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_args(cls, args, *, seed: int, phase_times: dict | None = None) -> "RunManifest":
        import jax

        import t2v

        return cls(
            prompt=args.prompt,
            n_prompt=args.n_prompt,
            sampler=args.sampler,
            steps=args.steps,
            frames=args.frames,
            seed=seed,
            cfg_scale=args.cfg_scale,
            width=args.width,
            height=args.height,
            model=str(args.model),
            model_type=args.model_type,
            eta=args.eta,
            strength=args.strength if args.do_vid2vid else None,
            framework_version=t2v.__version__,
            backend=jax.default_backend(),
            device_count=jax.device_count(),
            phase_times=dict(phase_times or {}),
        )

    def write(self, out_dir: str, name: str = "manifest.json") -> str:
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)
        return path
