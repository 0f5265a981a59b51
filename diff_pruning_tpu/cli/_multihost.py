"""Shared ``--multihost`` CLI wiring — the torchrun/accelerate-launch
equivalent (scripts/sample_ddpm_cifar10_pretrained_distributed.sh:1).

On a TPU pod slice every process runs the same CLI command with
``--multihost`` and JAX auto-detects coordinator/rank from the pod
environment; off-pod (e.g. the CPU-mesh test rig, tests/_mp_worker.py) the
coordinator/rank triple can be given explicitly. Must run before the first
device access, so CLIs call :func:`maybe_init_distributed` immediately
after parsing args.
"""

from __future__ import annotations


def add_multihost_args(parser) -> None:
    parser.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize so the mesh spans every host "
             "in the slice (run the same command on every host). "
             "Single-host runs need no flag.")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (auto-detected on TPU "
                             "pods; required off-pod)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def maybe_init_distributed(args) -> None:
    if not getattr(args, "multihost", False):
        return
    from ..parallel.mesh import init_distributed

    init_distributed(coordinator_address=args.coordinator_address,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
