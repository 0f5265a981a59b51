#!/usr/bin/env python
"""Flagship full-scale, full-duration recipe runner (docs/FULLRUN.md).

Executes the reference's headline CIFAR pipeline end-to-end ON THE REAL CHIP
at reference hyperparameters, through the actual CLIs (never library
shortcuts), with a mid-run SIGKILL + resume proving durable checkpointing:

  data      procedural 50k-image 32x32 dataset (zero-egress stand-in for
            CIFAR-10 — data/procedural.py)
  base      scratch-train the 35.75M ddpm_cifar10 UNet (cli.ddpm_train)
  basesample  same-seed grid + bulk base samples for SSIM/FID reference
  prune     diff-pruning thr=0.05 ratio=0.3 (cli.ddpm_prune; reference
            scripts/prune_ddpm_cifar10.sh)
  finetune  100k-step bs128 finetune (cli.ddpm_train; reference
            scripts/finetune_ddpm_cifar10.sh) — SIGKILLed mid-run by this
            orchestrator, then resumed from the crash-atomic checkpoint
  sample    50k images to disk (cli.ddpm_sample; ddpm_sample.py:55-77)
  eval      FID vs the dataset (random-init inception: deterministic
            relative distance — zero-egress), same-seed SSIM vs base
            (cli.compute_ssim), for both base and pruned+finetuned

Each phase appends to <out>/fullrun_state.json, so re-running the script
continues where it left off (the orchestrator itself is resumable). All
subprocess output is teed to <out>/logs/<phase>.log.

Usage:
  python tools/fullrun.py --out run/fullrun              # the real thing
  python tools/fullrun.py --out /tmp/fullrun_smoke --smoke   # minutes-long
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sh(out_dir, phase, argv, kill_at_step=None):
    """Run a CLI as a subprocess, teeing output to logs/<phase>.log.

    With kill_at_step, watch the child's metrics.jsonl (last arg after
    --output_dir) and SIGKILL the process group once it reports a step
    >= kill_at_step; returns the signalled returncode."""
    logdir = os.path.join(out_dir, "logs")
    os.makedirs(logdir, exist_ok=True)
    logpath = os.path.join(logdir, f"{phase}.log")
    print(f"[fullrun] {phase}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    with open(logpath, "a") as log:
        log.write(f"\n==== {time.strftime('%F %T')} {' '.join(argv)}\n")
        log.flush()
        proc = subprocess.Popen(
            [sys.executable, "-m"] + argv, cwd=REPO,
            stdout=log, stderr=subprocess.STDOUT,
            start_new_session=True)
        if kill_at_step is None:
            rc = proc.wait()
        else:
            mpath = os.path.join(argv[argv.index("--output_dir") + 1],
                                 "metrics.jsonl")
            mpath = os.path.join(REPO, mpath) if not os.path.isabs(mpath) else mpath
            rc = None
            while rc is None:
                time.sleep(5)
                rc = proc.poll()
                step = _last_step(mpath)
                if rc is None and step is not None and step >= kill_at_step:
                    print(f"[fullrun] SIGKILL at reported step {step} "
                          f"(>= {kill_at_step})", flush=True)
                    os.killpg(proc.pid, signal.SIGKILL)
                    rc = proc.wait()
                    break
    dt = time.time() - t0
    print(f"[fullrun] {phase} done rc={rc} in {dt:.0f}s", flush=True)
    return rc, dt


def _last_step(metrics_path):
    try:
        with open(metrics_path, "rb") as f:
            lines = f.read().splitlines()
        for line in reversed(lines):
            try:
                return json.loads(line)["step"]
            except Exception:
                continue
    except OSError:
        return None
    return None


def tail_log(out_dir, phase, n=8):
    p = os.path.join(out_dir, "logs", f"{phase}.log")
    try:
        with open(p) as f:
            return "".join(f.readlines()[-n:])
    except OSError:
        return ""


class State:
    def __init__(self, out_dir):
        self.path = os.path.join(out_dir, "fullrun_state.json")
        self.d = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.d = json.load(f)

    def done(self, phase):
        return phase in self.d

    def mark(self, phase, **info):
        self.d[phase] = {"t": time.time(), **info}
        with open(self.path, "w") as f:
            json.dump(self.d, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="run/fullrun")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny step counts, same phases/CLIs (orchestration "
                         "shakeout; minutes instead of hours)")
    ap.add_argument("--base_steps", type=int, default=None)
    ap.add_argument("--finetune_steps", type=int, default=None)
    ap.add_argument("--kill_at", type=int, default=None,
                    help="SIGKILL the finetune once metrics report this step")
    ap.add_argument("--total_samples", type=int, default=None)
    ap.add_argument("--data_n", type=int, default=50_000)
    ap.add_argument("--stop_after", "--stop-after", default=None,
                    choices=["basesample_fid", "basesample_fid_noeval"],
                    help="exit cleanly after this phase (e.g. "
                         "'basesample_fid' runs data/base/basesample/"
                         "basesample_fid + the base FID eval only — the "
                         "round-4 equal-footing base-FID recapture, which "
                         "needs none of the prune/finetune legs; the "
                         "_noeval variant skips the FID eval too, for "
                         "callers like tools/cost_quality.py that score "
                         "the base themselves against cached data stats)")
    args = ap.parse_args()

    if args.smoke:
        base_steps = args.base_steps or 384
        ft_steps = args.finetune_steps or 512
        kill_at = args.kill_at or 200
        total_samples = args.total_samples or 512
        save_every, log_every, bs = 128, 64, 128
        ssim_n = 128
    else:
        base_steps = args.base_steps or 30_000
        ft_steps = args.finetune_steps or 100_000
        kill_at = args.kill_at or 37_000
        total_samples = args.total_samples or 50_000
        save_every, log_every, bs = 1000, 100, 128
        ssim_n = 1024

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    st = State(out)
    report = {}

    # ---- data ------------------------------------------------------------
    data_npz = os.path.join(out, "data.npz")
    if not st.done("data"):
        import numpy as np

        from diff_pruning_tpu.data.procedural import make_procedural_dataset

        t0 = time.time()
        n = args.data_n if not args.smoke else 4096
        imgs = make_procedural_dataset(n=n, hw=32, seed=0)
        np.savez_compressed(data_npz, images=imgs)
        st.mark("data", n=n, secs=round(time.time() - t0, 1))

    # ---- base scratch train ---------------------------------------------
    base_init = os.path.join(out, "base_init")
    base_dir = os.path.join(out, "base")
    if not st.done("base"):
        if not os.path.exists(os.path.join(base_init, "unet", "params.npz")):
            # init needs no TPU; a CPU subprocess avoids an uncached
            # multi-minute remote compile of the init program
            env = dict(os.environ, JAX_PLATFORMS="cpu")
            rc = subprocess.run(
                [sys.executable, "-c",
                 "import sys; sys.path.insert(0, %r)\n"
                 "import jax\n"
                 "from diff_pruning_tpu.models.unet2d import UNet2D, "
                 "ddpm_cifar10_config\n"
                 "from diff_pruning_tpu.utils.checkpoint import save_model\n"
                 "cfg = ddpm_cifar10_config()\n"
                 "save_model(%r, cfg, UNet2D(cfg).init(jax.random.key(0)), "
                 "subfolder='unet')\n" % (REPO, base_init)],
                cwd=REPO, env=env).returncode
            assert rc == 0, "base init failed"
        rc, dt = sh(out, "base", [
            "diff_pruning_tpu.cli.ddpm_train",
            "--dataset", data_npz, "--model_path", base_init,
            "--output_dir", base_dir,
            "--train_batch_size", str(bs), "--num_iters", str(base_steps),
            "--learning_rate", "2e-4", "--dropout", "0.1",
            "--mixed_precision", "bf16",
            "--save_model_steps", str(save_every), "--log_steps", str(log_every),
        ])
        assert rc == 0, f"base train failed:\n{tail_log(out, 'base')}"
        st.mark("base", steps=base_steps, secs=round(dt, 1))

    # ---- base samples (SSIM/FID reference) -------------------------------
    base_samples = os.path.join(out, "samples_base")
    if not st.done("basesample"):
        rc, dt = sh(out, "basesample", [
            "diff_pruning_tpu.cli.ddpm_sample",
            "--model_path", base_dir, "--output_dir", base_samples,
            "--batch_size", str(bs), "--total_samples", str(ssim_n),
            "--ddim_steps", "100", "--skip_type", "quad", "--style", "ddim_exp",
            "--use_ema", "--dtype", "bfloat16", "--seed", "42",
        ])
        assert rc == 0, f"base sampling failed:\n{tail_log(out, 'basesample')}"
        st.mark("basesample", n=ssim_n, secs=round(dt, 1))

    # ---- base samples at FULL FID count (equal footing) -------------------
    # VERDICT r3 weak #4: the FID table compared 50k pruned samples against
    # 1,024 base samples; small-n FID is biased upward, so the base row was
    # not an equal-footing comparison. Sample the base model at the same
    # total as the pruned model (seed 0, matching the pruned FID set).
    base_fid_samples = os.path.join(out, "samples_base_fid")
    if not st.done("basesample_fid"):
        rc, dt = sh(out, "basesample_fid", [
            "diff_pruning_tpu.cli.ddpm_sample",
            "--model_path", base_dir, "--output_dir", base_fid_samples,
            "--batch_size", str(bs), "--total_samples", str(total_samples),
            "--ddim_steps", "100", "--skip_type", "quad", "--style", "ddim_exp",
            "--use_ema", "--dtype", "bfloat16", "--seed", "0",
        ])
        assert rc == 0, (
            f"base FID sampling failed:\n{tail_log(out, 'basesample_fid')}")
        st.mark("basesample_fid", n=total_samples, secs=round(dt, 1))

    if args.stop_after in ("basesample_fid", "basesample_fid_noeval"):
        # equal-footing recapture mode: score the base 50k set now and exit
        # (the pruned side's 50k FID protocol is identical — seed-0
        # random-init inception over the same seed-0 procedural data npz —
        # so this row is directly comparable to the r3 pruned number).
        if not st.done("eval_base_fid") and args.stop_after == "basesample_fid":
            rc, dt = sh(out, "fid_base_vs_data", [
                "diff_pruning_tpu.cli.fid_score", base_fid_samples, data_npz,
                "--random-init-seed", "0", "--batch-size", "256"])
            assert rc == 0, (
                f"base FID failed:\n{tail_log(out, 'fid_base_vs_data')}")
            evals = {}
            for line in tail_log(out, "fid_base_vs_data", 4).splitlines():
                if line.startswith("FID"):
                    evals["fid_base_vs_data"] = float(line.split()[-1])
            st.mark("eval_base_fid", **evals)
        print("[fullrun] STOPPED after basesample_fid (equal-footing mode)")
        print(json.dumps(st.d, indent=1))
        return

    # ---- prune -----------------------------------------------------------
    pruned_dir = os.path.join(out, "pruned")
    if not st.done("prune"):
        rc, dt = sh(out, "prune", [
            "diff_pruning_tpu.cli.ddpm_prune",
            "--dataset", data_npz,
            "--model_path", os.path.join(base_dir),
            "--save_path", pruned_dir,
            "--pruning_ratio", "0.3", "--pruner", "diff-pruning",
            "--thr", "0.05", "--batch_size", str(bs),
        ])
        assert rc == 0, f"prune failed:\n{tail_log(out, 'prune')}"
        st.mark("prune", secs=round(dt, 1))

    # ---- finetune with mid-run SIGKILL + resume --------------------------
    ft_dir = os.path.join(out, "finetuned")
    ft_args = [
        "diff_pruning_tpu.cli.ddpm_train",
        "--dataset", data_npz, "--model_path", pruned_dir,
        "--output_dir", ft_dir,
        "--train_batch_size", str(bs), "--num_iters", str(ft_steps),
        "--learning_rate", "2e-4", "--dropout", "0.1",
        "--mixed_precision", "bf16",
        "--save_model_steps", str(save_every), "--log_steps", str(log_every),
    ]
    if not st.done("finetune_kill"):
        rc, dt = sh(out, "finetune", ft_args, kill_at_step=kill_at)
        killed = rc != 0
        st.mark("finetune_kill", killed=killed, rc=rc, secs=round(dt, 1),
                last_step=_last_step(os.path.join(ft_dir, "metrics.jsonl")))
        assert killed, "finetune finished before the scheduled kill"
    if not st.done("finetune"):
        rc, dt = sh(out, "finetune", ft_args + [
            "--resume_from_checkpoint", os.path.join(ft_dir, "ckpt")])
        assert rc == 0, f"finetune resume failed:\n{tail_log(out, 'finetune')}"
        st.mark("finetune", steps=ft_steps, secs=round(dt, 1))

    # ---- 50k sampling run ------------------------------------------------
    samples_dir = os.path.join(out, "samples_pruned")
    if not st.done("sample"):
        rc, dt = sh(out, "sample", [
            "diff_pruning_tpu.cli.ddpm_sample",
            "--model_path", ft_dir, "--output_dir", samples_dir,
            "--batch_size", str(bs), "--total_samples", str(total_samples),
            "--ddim_steps", "100", "--skip_type", "quad", "--style", "ddim_exp",
            "--use_ema", "--dtype", "bfloat16", "--seed", "0",
        ])
        assert rc == 0, f"sampling failed:\n{tail_log(out, 'sample')}"
        st.mark("sample", n=total_samples, secs=round(dt, 1))

    # same-seed grid for SSIM (seed 42, matching basesample)
    ssim_dir = os.path.join(out, "samples_pruned_seed42")
    if not st.done("ssimsample"):
        rc, dt = sh(out, "ssimsample", [
            "diff_pruning_tpu.cli.ddpm_sample",
            "--model_path", ft_dir, "--output_dir", ssim_dir,
            "--batch_size", str(bs), "--total_samples", str(ssim_n),
            "--ddim_steps", "100", "--skip_type", "quad", "--style", "ddim_exp",
            "--use_ema", "--dtype", "bfloat16", "--seed", "42",
        ])
        assert rc == 0, f"ssim sampling failed:\n{tail_log(out, 'ssimsample')}"
        st.mark("ssimsample", secs=round(dt, 1))

    # ---- eval ------------------------------------------------------------
    if not st.done("eval"):
        evals = {}
        for tag, d in (("fid_pruned_vs_data", samples_dir),
                       ("fid_base_vs_data", base_fid_samples)):
            rc, dt = sh(out, tag, [
                "diff_pruning_tpu.cli.fid_score", d, data_npz,
                "--random-init-seed", "0", "--batch-size", "256"])
            assert rc == 0, f"{tag} failed:\n{tail_log(out, tag)}"
            for line in tail_log(out, tag, 4).splitlines():
                if line.startswith("FID"):
                    evals[tag] = float(line.split()[-1])
        rc, dt = sh(out, "ssim", [
            "diff_pruning_tpu.cli.compute_ssim", base_samples, ssim_dir])
        assert rc == 0, f"ssim failed:\n{tail_log(out, 'ssim')}"
        for line in tail_log(out, "ssim", 4).splitlines():
            if line.startswith(("SSIM", "MSE")):
                evals["sameseed_" + line.split(":")[0].lower()] = \
                    float(line.split()[-1])
        st.mark("eval", **evals)
        report.update(evals)

    print("[fullrun] COMPLETE")
    print(json.dumps(st.d, indent=1))


if __name__ == "__main__":
    main()
