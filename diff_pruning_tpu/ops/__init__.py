"""TPU Pallas kernels and runtime toggles.

Per-op switches. Policy: a kernel ships default-ON only where measured
faster than XLA on the target shapes (tools/bench_pallas.py on v5e;
numbers recorded in docs/PALLAS_BENCH.md):

* ``attention`` (ON): flash attention with a hand-written Pallas backward
  (ops/attention.py). Shipping policy set by IN-MODEL measurement
  (docs/PALLAS_BENCH.md): the primal/inference path is plain XLA (fusible,
  never slower); under differentiation the Pallas forward+backward engage
  for sequences >= ``min_tokens=512`` (celebahq-256 train step +5.3%;
  CIFAR's 256-token blocks excluded — measured slightly slower there).
* ``group_norm`` (OFF): fused GroupNorm(+SiLU) (ops/group_norm.py).
  Loses IN-MODEL at every served scale (sampling −21% at 32², −4.6% at
  64² — docs/PALLAS_BENCH.md): the custom call severs XLA's GN-into-conv
  epilogue fusion. Kept for experimentation; big 256² slabs fall back to
  XLA automatically.
"""

_FLAGS = {"group_norm": False, "attention": True}


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
