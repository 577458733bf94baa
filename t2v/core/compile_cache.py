"""Persistent XLA compilation cache for serving/CLI entry points.

The reference runs eager torch and pays no compile cost; our jitted
programs compile for minutes at full scale (3-6 min for the 1.7B UNet,
more for hi-res whole-loop samplers). Enabling JAX's persistent
compilation cache turns every later process's compile into a disk hit
(measured 8.5 s -> 2.7 s for the tiny UNet across processes on one chip;
the full-model effect is minutes -> seconds), which matters for serving
restarts and CLI invocations.

Not enabled on library import (a library must not mutate global jax
config); the CLI mains, the API servers, and ``load_pipeline`` call
:func:`enable_compile_cache` before the first compile.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(
    os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")), "t2v", "xla"
)
_enabled: Optional[str] = None


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``~/.cache/t2v/xla``, overridable via ``T2V_COMPILE_CACHE``; set that
    to ``0`` to disable). Idempotent; returns the active cache dir or
    None when disabled. Call before the first jit compile — programs
    compiled earlier in the process are not retro-cached."""
    global _enabled
    env = os.environ.get("T2V_COMPILE_CACHE", "")
    if env == "0":
        return None
    if _enabled is not None:
        # the first caller wins — JAX's cache dir is process-global. An
        # explicit conflicting path deserves a loud notice, not silence.
        if path and os.path.abspath(path) != os.path.abspath(_enabled):
            print(
                f"t2v: compile cache already active at {_enabled}; "
                f"ignoring requested {path}"
            )
        return _enabled
    target = path or env or _DEFAULT_DIR
    try:
        os.makedirs(target, exist_ok=True)
    except OSError:
        return None
    import jax

    jax.config.update("jax_compilation_cache_dir", target)
    # cache everything that took a real compile; tiny sub-second programs
    # are cheaper to recompile than to hash + read back
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = target
    return target
