"""Persistent XLA compilation cache for the CLI workflows.

Remote TPU compiles cost ~40-70s per program on this platform (CLAUDE.md);
JAX's persistent cache serializes compiled executables across processes —
measured 42.9s -> 27.3s for the CIFAR UNet forward on a cold second
process. Every CLI calls this at startup; tests don't (CPU compiles are
cheap and the suite mutates programs constantly).
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's on-disk compilation cache; returns the directory used.

    Precedence: explicit arg > JAX_COMPILATION_CACHE_DIR env (already
    honored by JAX itself) > ~/.cache/diff_pruning_tpu/jax.
    """
    import jax

    # platform escape hatch: JAX_PLATFORMS=cpu is INEFFECTIVE here — the
    # axon site hook registers the TPU regardless (CLAUDE.md; verified r5).
    # DIFF_PRUNING_TPU_PLATFORM=cpu forces CLI subprocesses onto the host
    # backend via jax.config, which does win (tools/pixelrun.py --smoke).
    plat = os.environ.get("DIFF_PRUNING_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    d = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.expanduser("~/.cache/diff_pruning_tpu/jax"))
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: cache is best-effort
    return d
