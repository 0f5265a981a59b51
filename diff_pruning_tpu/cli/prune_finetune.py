"""CLI: one-shot prune -> finetune — the `simple_cifar_our.sh` pipeline
(ddpm_exp/finetune_simple.py: prune with the diff-pruning sweep, then train).

    python -m diff_pruning_tpu.cli.prune_finetune \
        --model_path run/cifar10_base --dataset cifar10 \
        --output_dir run/cifar10_T005 --thr 0.05 --pruning_ratio 0.3

Canonical CIFAR hyperparams baked in as defaults (scripts/finetune_ddpm_
cifar10.sh: bs128, 100k iters, lr 2e-4, EMA 0.9999, dropout 0.1).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--pruning_ratio", type=float, default=0.3)
    p.add_argument("--pruner", type=str, default="diff-pruning")
    p.add_argument("--thr", type=float, default=0.05)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_iters", type=int, default=100_000)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--mixed_precision", type=str, default="bf16")
    p.add_argument("--kd", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--prune_args", type=str, default="",
                   help="extra args forwarded to ddpm_prune")
    p.add_argument("--train_args", type=str, default="",
                   help="extra args forwarded to ddpm_train")
    args = p.parse_args(argv)

    from . import ddpm_prune, ddpm_train

    pruned_dir = os.path.join(args.output_dir, "pruned")
    prune_argv = [
        "--model_path", args.model_path,
        "--save_path", pruned_dir,
        "--pruning_ratio", str(args.pruning_ratio),
        "--pruner", args.pruner,
        "--thr", str(args.thr),
        "--dataset", args.dataset,
        "--batch_size", str(args.batch_size),
        "--seed", str(args.seed),
    ] + args.prune_args.split()
    print(f"[prune_finetune] pruning -> {pruned_dir}")
    ddpm_prune.main(prune_argv)

    train_argv = [
        "--model_path", pruned_dir,
        "--dataset", args.dataset,
        "--output_dir", args.output_dir,
        "--train_batch_size", str(args.batch_size),
        "--num_iters", str(args.num_iters),
        "--learning_rate", str(args.learning_rate),
        "--dropout", str(args.dropout),
        "--mixed_precision", args.mixed_precision,
        "--seed", str(args.seed),
    ] + (["--kd", "--teacher_path", args.model_path] if args.kd else []) \
      + args.train_args.split()
    print(f"[prune_finetune] finetuning -> {args.output_dir}")
    ddpm_train.main(train_argv)


if __name__ == "__main__":
    main()
