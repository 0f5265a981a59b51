"""Shared train-CLI plumbing: dispatch-chunk sizing and launch archiving.

One implementation for both train CLIs (ddpm_train / ldm_train) — the
chunk/interval alignment encodes a resume invariant (per-chunk RNG keys are
fold_in(seed_key, step) at multiples of the chunk, so a resumed run replays
the identical streams) that must not drift between them.
"""

from __future__ import annotations

import math
import os
import shlex
import sys
from typing import Optional, Sequence


def chunk_for_intervals(steps_per_dispatch: int, save_steps: int,
                        log_steps: int) -> int:
    """Largest chunk <= steps_per_dispatch dividing gcd(save, log) steps, so
    every log/save boundary lands on a chunk boundary and resumed runs
    re-derive the same per-chunk keys."""
    g = math.gcd(save_steps, log_steps)
    cap = max(1, min(steps_per_dispatch, g))
    return max(d for d in range(1, cap + 1) if g % d == 0)


def archive_command(output_dir: str, module: str,
                    argv: Optional[Sequence[str]]) -> None:
    """Append the exact (shell-quoted, replayable) launch command to
    output_dir/run.sh — the reference archives its command the same way
    (ddpm_train.py:376-378)."""
    args = list(argv if argv is not None else sys.argv[1:])
    with open(os.path.join(output_dir, "run.sh"), "a") as f:
        f.write(f"python -m {module} "
                + " ".join(shlex.quote(a) for a in args) + "\n")
