"""TPU Pallas kernels and runtime toggles.

Per-op switches (all default off — XLA's fusion is the baseline and each
kernel must beat it on the target shape to be enabled):

* ``group_norm``: fused GroupNorm(+SiLU) (ops/group_norm.py). Slower than
  XLA on 32x32 activations; targets memory-bound 256^2 paths.
* ``attention``: flash attention (ops/attention.py). Measured 22% faster
  than XLA at the LDM 4096-token shape and avoids the (N, N) score
  materialization; only engages for >= min_tokens sequences.
"""

_FLAGS = {"group_norm": False, "attention": False}


def set_pallas_enabled(on: bool = True, *, group_norm=None, attention=None) -> None:
    """Backwards-compatible: positional `on` sets everything; keywords set
    individual ops."""
    if group_norm is None and attention is None:
        _FLAGS["group_norm"] = bool(on)
        _FLAGS["attention"] = bool(on)
        return
    if group_norm is not None:
        _FLAGS["group_norm"] = bool(group_norm)
    if attention is not None:
        _FLAGS["attention"] = bool(attention)


def pallas_enabled(op: str = "group_norm") -> bool:
    return _FLAGS.get(op, False)
