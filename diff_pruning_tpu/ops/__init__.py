"""TPU Pallas kernels and runtime toggles.

`set_pallas_enabled(True)` routes GroupNorm (and GN+SiLU pairs) through the
fused Pallas kernel (ops/group_norm.py); default off — XLA's own fusion is
the baseline, and the kernel is only a win on memory-bound shapes.
"""

_PALLAS_ENABLED = False


def set_pallas_enabled(on: bool) -> None:
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(on)


def pallas_enabled() -> bool:
    return _PALLAS_ENABLED
