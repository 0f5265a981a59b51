#!/usr/bin/env python
"""Drive the pruned cin256-v2 finetune leg on-chip (VERDICT r4 next #3) —
the one reference workflow (ldm_exp/main.py:533-566, README.md:174-181's
4-epoch finetune) never executed at flagship scale. Wraps cli.ldm_train as
a subprocess so we can SIGKILL it mid-run and verify the resume splice,
exactly like tools/fullrun.py does for the CIFAR recipe.

Usage:
  python tools/ldm400_finetune.py <pruned_dir> <data_dir> <out_dir>
      [--kill_at N | --resume] [--num_iters N] [--batch N] [--dispatch N]

Conservative dispatch (default 8 fused steps) keeps the serialized program
small — the remote compile service 413s very large programs; frozen codec
params ride as jit ARGUMENTS (cli/ldm_train.py), not constants, for the
same reason.
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_step(mpath):
    step = None
    if os.path.exists(mpath):
        with open(mpath) as f:
            for line in f:
                try:
                    step = json.loads(line).get("step", step)
                except json.JSONDecodeError:
                    pass
    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("pruned_dir")
    ap.add_argument("data_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--kill_at", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num_iters", type=int, default=1100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dispatch", type=int, default=8)
    ap.add_argument("--save_every", type=int, default=200,
                    help="save cadence; VERDICT r4 weak #7: the 200-step "
                         "cadence paid a 38->16.6 imgs/s dip amortizing a "
                         "203M snapshot — the 1000-step leg measures the "
                         "claimed 5x overhead-fraction drop")
    args = ap.parse_args()

    argv = [
        sys.executable, "-m", "diff_pruning_tpu.cli.ldm_train",
        "--model_path", args.pruned_dir,
        "--dataset", args.data_dir,
        "--output_dir", args.out_dir,
        "--train_batch_size", str(args.batch),
        "--num_iters", str(args.num_iters),
        "--steps_per_dispatch", str(args.dispatch),
        "--save_model_steps", str(args.save_every),
        "--log_steps", str(args.dispatch),
        "--mixed_precision", "bf16",
        "--uncond_prob", "0.1",
    ]
    if args.resume:
        argv += ["--resume_from_checkpoint",
                 os.path.join(args.out_dir, "ckpt")]
    mpath = os.path.join(args.out_dir, "metrics.jsonl")
    print("[ldm400_ft]", " ".join(argv), flush=True)
    t0 = time.time()
    proc = subprocess.Popen(argv, cwd=REPO, start_new_session=True)
    if args.kill_at is None:
        rc = proc.wait()
    else:
        rc = None
        while rc is None:
            time.sleep(5)
            rc = proc.poll()
            step = last_step(mpath)
            if rc is None and step is not None and step >= args.kill_at:
                print(f"[ldm400_ft] SIGKILL at step {step} "
                      f"(>= {args.kill_at})", flush=True)
                os.killpg(proc.pid, signal.SIGKILL)
                rc = proc.wait()
    dt = time.time() - t0
    step = last_step(mpath)
    print(json.dumps({"phase": "ldm400_finetune",
                      "resume": args.resume, "kill_at": args.kill_at,
                      "rc": rc, "secs": round(dt, 1),
                      "last_step": step}), flush=True)
    if args.kill_at is not None:
        # killed on purpose: success means the child DID die mid-run
        sys.exit(0 if rc != 0 else 1)
    sys.exit(0 if rc == 0 else 1)


if __name__ == "__main__":
    main()
