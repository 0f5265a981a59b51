"""diff_pruning_tpu — TPU-native structural pruning framework for diffusion
models (JAX / XLA / Pallas / pjit rebuild of VainF/Diff-Pruning)."""

__version__ = "0.1.0"
