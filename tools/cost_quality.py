#!/usr/bin/env python
"""Cost-aware pruning QUALITY measurement (VERDICT r4 next #2): the +61%
throughput-at-equal-params result (docs/PERF.md "Cost-aware sparsity
allocation") was measured with the quality comparison explicitly scoped out.
An allocation that concentrates drops into wide convs could cost real
FID/SSIM — this runner measures BOTH columns at equal params, through the
product CLIs, on the round-4 scratch-trained 35.75M base
(run/fullrun_r4/base, 30k steps on the 50k procedural set):

  pruneA    importance-only global diff-pruning at ratio 0.3
            (reference semantics, ddpm_prune.py:94-131)
  pruneB    --cost_aware hybrid --match_params (equal param budget,
            --max_sparsity 0.75)
  finetune  identical recipe for both arms (cli.ddpm_train)
  sample    same-seed grids (seed 42, vs the base's samples_base) + FID
            sets (seed 0) for both arms
  eval      FID_rand vs data (equal n incl. a base subset), pairwise SSIM
            vs base (ddpm_exp/compute_ssim.py:39-52 protocol), and timed
            DDIM-100 bs128 sampling throughput per arm

Logs tee into docs/logs/r5/cost_quality/. ONE experiment on the chip at a
time — run alone (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOGDIR = os.path.join(REPO, "docs", "logs", "r5", "cost_quality")


def sh(phase, argv):
    os.makedirs(LOGDIR, exist_ok=True)
    logpath = os.path.join(LOGDIR, f"{phase}.log")
    print(f"[cost_quality] {phase}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    with open(logpath, "a") as log:
        log.write(f"\n==== {time.strftime('%F %T')} {' '.join(argv)}\n")
        log.flush()
        rc = subprocess.run([sys.executable, "-m"] + argv, cwd=REPO,
                            stdout=log, stderr=subprocess.STDOUT).returncode
    dt = time.time() - t0
    print(f"[cost_quality] {phase} done rc={rc} in {dt:.0f}s", flush=True)
    assert rc == 0, f"{phase} failed — see {logpath}"
    return dt


def tail(phase, n=8):
    try:
        with open(os.path.join(LOGDIR, f"{phase}.log")) as f:
            return f.readlines()[-n:]
    except OSError:
        return []


class State:
    def __init__(self, out_dir):
        self.path = os.path.join(out_dir, "cost_quality_state.json")
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
    ap.add_argument("--base", default="run/fullrun_r4")
    ap.add_argument("--out", default="run/cost_quality")
    ap.add_argument("--ft_steps", type=int, default=20000)
    ap.add_argument("--fid_n", type=int, default=10000)
    ap.add_argument("--ssim_n", type=int, default=1024)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.ft_steps, args.fid_n, args.ssim_n = 128, 256, 128

    base = os.path.abspath(args.base)
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    st = State(out)
    data_npz = os.path.join(base, "data.npz")
    base_dir = os.path.join(base, "base")
    base_grid = os.path.join(base, "samples_base")  # seed-42, 1024 imgs
    base_fid_full = os.path.join(base, "samples_base_fid")  # seed-0, 50k

    arms = {
        "A_importance_only": [
            "--pruning_ratio", "0.3", "--pruner", "diff-pruning",
            "--thr", "0.05", "--global_pruning"],
        "B_cost_aware": [
            "--pruning_ratio", "0.3", "--pruner", "diff-pruning",
            "--thr", "0.05", "--global_pruning",
            "--cost_aware", "hybrid", "--match_params",
            "--max_sparsity", "0.75"],
    }

    for arm, flags in arms.items():
        pruned = os.path.join(out, f"pruned_{arm}")
        if not st.done(f"prune_{arm}"):
            dt = sh(f"prune_{arm}", [
                "diff_pruning_tpu.cli.ddpm_prune",
                "--dataset", data_npz, "--model_path", base_dir,
                "--save_path", pruned, "--batch_size", "128",
                "--skip_vis"] + flags)
            params_m = None
            for line in tail(f"prune_{arm}", 12):
                if line.startswith("#Params"):
                    params_m = float(line.split("=>")[-1].replace("M", ""))
            st.mark(f"prune_{arm}", secs=round(dt, 1), params_m=params_m)

        ft = os.path.join(out, f"ft_{arm}")
        if not st.done(f"finetune_{arm}"):
            dt = sh(f"finetune_{arm}", [
                "diff_pruning_tpu.cli.ddpm_train",
                "--dataset", data_npz, "--model_path", pruned,
                "--output_dir", ft,
                "--train_batch_size", "128",
                "--num_iters", str(args.ft_steps),
                "--learning_rate", "2e-4", "--dropout", "0.1",
                "--mixed_precision", "bf16",
                "--save_model_steps", str(max(1000, args.ft_steps // 4)),
                "--log_steps", "100"])
            st.mark(f"finetune_{arm}", steps=args.ft_steps, secs=round(dt, 1))

        if not st.done(f"sample_{arm}"):
            dt = sh(f"grid_{arm}", [
                "diff_pruning_tpu.cli.ddpm_sample",
                "--model_path", ft,
                "--output_dir", os.path.join(out, f"grid_{arm}"),
                "--batch_size", "128", "--total_samples", str(args.ssim_n),
                "--ddim_steps", "100", "--skip_type", "quad",
                "--style", "ddim_exp", "--use_ema", "--dtype", "bfloat16",
                "--seed", "42"])
            dt += sh(f"fid_samples_{arm}", [
                "diff_pruning_tpu.cli.ddpm_sample",
                "--model_path", ft,
                "--output_dir", os.path.join(out, f"fid_{arm}"),
                "--batch_size", "128", "--total_samples", str(args.fid_n),
                "--ddim_steps", "100", "--skip_type", "quad",
                "--style", "ddim_exp", "--use_ema", "--dtype", "bfloat16",
                "--seed", "0"])
            st.mark(f"sample_{arm}", secs=round(dt, 1))

    # equal-n base subset for the FID column (symlinks, no copy)
    base_fid_sub = os.path.join(out, "base_fid_subset")
    if not st.done("base_subset"):
        os.makedirs(base_fid_sub, exist_ok=True)
        files = sorted(glob.glob(os.path.join(base_fid_full, "*.png")))
        assert len(files) >= args.fid_n, (
            f"base FID set has {len(files)} < {args.fid_n}")
        for f in files[:args.fid_n]:
            dst = os.path.join(base_fid_sub, os.path.basename(f))
            if not os.path.exists(dst):
                os.symlink(f, dst)
        st.mark("base_subset", n=args.fid_n)

    # data-side Inception stats computed ONCE and reused by all three FID
    # evals (fid_score accepts .npz stats paths) — the data set is the
    # largest side of every comparison, so this cuts eval chip time ~4x
    data_stats = os.path.join(out, "data_stats.npz")
    if not st.done("data_stats"):
        dt = sh("data_stats", ["diff_pruning_tpu.cli.fid_score",
                               data_npz, data_stats, "--save-stats",
                               "--random-init-seed", "0",
                               "--batch-size", "256"])
        st.mark("data_stats", secs=round(dt, 1))

    if not st.done("eval"):
        evals = {}
        for tag, d in [("fid_base", base_fid_sub)] + [
                (f"fid_{arm}", os.path.join(out, f"fid_{arm}"))
                for arm in arms]:
            sh(f"eval_{tag}", ["diff_pruning_tpu.cli.fid_score", d, data_stats,
                               "--random-init-seed", "0",
                               "--batch-size", "256"])
            for line in tail(f"eval_{tag}", 4):
                if line.startswith("FID"):
                    evals[tag] = float(line.split()[-1])
        for arm in arms:
            sh(f"eval_ssim_{arm}", ["diff_pruning_tpu.cli.compute_ssim",
                                    base_grid, os.path.join(out, f"grid_{arm}")])
            for line in tail(f"eval_ssim_{arm}", 4):
                if line.startswith("SSIM"):
                    evals[f"ssim_{arm}"] = float(line.split()[-1])
        st.mark("eval", **evals)

    # timed DDIM-100 bs128 sampling throughput per arm (the +61% protocol,
    # now alongside the quality columns) — one experiment at a time
    if not st.done("throughput"):
        rows = {}
        for arm in arms:
            code = f"""
import sys, time, json; sys.path.insert(0, {REPO!r})
from diff_pruning_tpu.utils.compile_cache import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import jax, jax.numpy as jnp
from diff_pruning_tpu.cli.ddpm_prune import load_unet
from diff_pruning_tpu.models.unet2d import UNet2D
from diff_pruning_tpu.sampling.ddim_sampler import SamplerConfig, make_sampler
from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
cfg, params = load_unet({os.path.join(out, f"ft_{arm}")!r})
model = UNet2D(cfg)
s = make_sampler(model, params, DiffusionSchedule.create(),
                 SamplerConfig(num_inference_steps=100, skip_type="quad",
                               style="ddim_exp", dtype="bfloat16"))
for w in range(2):
    float(jnp.sum(s(jax.random.key(w), 128, 32, 3)))
t0 = time.perf_counter()
for i in range(3):
    float(jnp.sum(s(jax.random.key(i + 2), 128, 32, 3)))
dt = (time.perf_counter() - t0) / 3
print(json.dumps({{"arm": {arm!r}, "imgs_per_sec": round(128 / dt, 1)}}))
"""
            os.makedirs(LOGDIR, exist_ok=True)
            lp = os.path.join(LOGDIR, f"throughput_{arm}.log")
            with open(lp, "a") as log:
                rc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                                    stdout=log,
                                    stderr=subprocess.STDOUT).returncode
            assert rc == 0, f"throughput {arm} failed — see {lp}"
            for line in tail(f"throughput_{arm}", 3):
                if line.startswith("{"):
                    rows[arm] = json.loads(line)["imgs_per_sec"]
            print(f"[cost_quality] throughput {arm}: {rows.get(arm)} imgs/s",
                  flush=True)
        st.mark("throughput", **rows)

    print("[cost_quality] COMPLETE")
    print(json.dumps(st.d, indent=1))


if __name__ == "__main__":
    main()
