"""XLA:TPU runtime flags that must be staged into LIBTPU_INIT_ARGS before
the TPU backend initializes (they are read when libtpu starts, so setting
them after the first device access is a silent no-op).

The one flag the framework exposes today is the scoped-VMEM budget:
``--xla_tpu_scoped_vmem_limit_kib``. Measured on LSUN-256 DDIM-100 bs8
sampling (docs/PERF.md "The 256² wall"): 65536 KiB together with the
fusion-friendly GroupNorm took 1.125 -> 2.763 imgs/s (2.46x) by letting
the conv+affine epilogue fusions keep their operands in VMEM instead of
round-tripping HBM. It is a *tuning knob*, not a default: the stock limit
is tuned for small footprints and raising it can regress models whose
working set already fits (the 32²/64² rows were measured healthy without
it).
"""

from __future__ import annotations

import os
from typing import Optional


def _backend_initialized() -> bool:
    try:
        from jax._src import xla_bridge

        return xla_bridge.backends_are_initialized()
    except Exception:  # pragma: no cover - introspection API drift
        return False


def set_scoped_vmem_limit(kib: Optional[int]) -> None:
    """Stage ``--xla_tpu_scoped_vmem_limit_kib=<kib>`` into LIBTPU_INIT_ARGS.

    No-op when ``kib`` is None. Replaces an existing setting of the same
    flag; preserves any other staged flags. Raises RuntimeError if the TPU
    backend already initialized — the flag would silently not apply, which
    is worse than failing loudly.
    """
    if kib is None:
        return
    if _backend_initialized():
        raise RuntimeError(
            "set_scoped_vmem_limit called after the JAX backend initialized "
            "— LIBTPU_INIT_ARGS is only read at backend startup. Set the "
            "flag before the first jax.devices()/computation.")
    flag = f"--xla_tpu_scoped_vmem_limit_kib={int(kib)}"
    existing = [a for a in os.environ.get("LIBTPU_INIT_ARGS", "").split()
                if a and not a.startswith("--xla_tpu_scoped_vmem_limit_kib=")]
    os.environ["LIBTPU_INIT_ARGS"] = " ".join(existing + [flag])


def add_scoped_vmem_arg(parser) -> None:
    """Attach the shared ``--scoped_vmem_kib`` CLI flag."""
    parser.add_argument(
        "--scoped_vmem_kib", type=int, default=None,
        help="raise XLA:TPU's scoped-VMEM budget (LIBTPU_INIT_ARGS "
             "--xla_tpu_scoped_vmem_limit_kib). 65536 measured 2.46x on "
             "256² sampling with the fused GroupNorm path; leave unset "
             "for 32²/64² models (docs/PERF.md)")
