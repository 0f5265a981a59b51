#!/usr/bin/env python
"""The LDM workflow end-to-end in PIXEL space, with a scratch-trained first
stage (docs/PIXELRUN.md) — the full CompVis recipe of ldm_exp/run.sh:1-2 +
sample_for_FID.py:76-105 under zero egress:

  data       class-conditional procedural dataset (8 classes whose identity
             is pixel-decodable — data/procedural.py palette classifier)
  ae         scratch-train the REAL vq-f4 first stage (55.3M) at 64px
             (cli.autoencoder_train — ldm autoencoder.py's objective)
  ae_check   reconstruction PSNR + grid through the trained codec
  ldm_init   assemble the LDM checkpoint: class-conditional UNetCond over
             16x16x3 latents + ClassEmbedder + the trained codec; the
             scale_factor is set to 1/std(z) over a data batch (the LDM
             std-rescaling trick, ddpm.py on_train_batch_start)
  ldm_train  train the LDM in latent space w/ CFG label dropout
             (cli.ldm_train)
  basesample same-seed grid + FID set, sampled with CFG DDIM and DECODED
             TO PIXELS (cli.ldm_sample)
  prune      diff-pruning at 0.3 from self-sampled CFG latents
             (cli.ldm_prune — prune_ldm.py semantics)
  finetune   latent-space finetune of the pruned UNet (cli.ldm_train)
  prunedsample  pruned grid + FID set in pixels
  eval       FID_rand (pruned and base vs data), same-seed SSIM
             base-vs-pruned, and CLASS CONSISTENCY: the palette classifier
             must decode the requested class from the DECODED PIXELS —
             the zero-egress equivalent of "class 25 looks like an ostrich"

Every phase log tees straight into docs/logs/r5/pixelrun/ (committed — the
CLAUDE.md evidence-retention rule), artifacts under --out (gitignored).

Usage:
  python tools/pixelrun.py --out run/pixelrun             # the real thing
  python tools/pixelrun.py --out /tmp/pixel_smoke --smoke # minutes-long
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOGDIR = os.path.join(REPO, "docs", "logs", "r5", "pixelrun")


SMOKE_CPU = False  # set by main(); --smoke runs every CLI on the host
# backend (DIFF_PRUNING_TPU_PLATFORM=cpu — plain JAX_PLATFORMS is ignored
# by the axon site hook, utils/compile_cache.py)


def _env(env):
    if env is None and SMOKE_CPU:
        env = dict(os.environ, DIFF_PRUNING_TPU_PLATFORM="cpu")
    return env


def sh(phase, argv, env=None):
    os.makedirs(LOGDIR, exist_ok=True)
    logpath = os.path.join(LOGDIR, f"{phase}.log")
    print(f"[pixelrun] {phase}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    with open(logpath, "a") as log:
        log.write(f"\n==== {time.strftime('%F %T')} {' '.join(argv)}\n")
        log.flush()
        rc = subprocess.run([sys.executable, "-m"] + argv, cwd=REPO,
                            stdout=log, stderr=subprocess.STDOUT,
                            env=_env(env)).returncode
    dt = time.time() - t0
    print(f"[pixelrun] {phase} done rc={rc} in {dt:.0f}s", flush=True)
    return rc, dt


def pysub(phase, code, cpu=False):
    """Run a python snippet as a subprocess (tee'd like sh); cpu=True pins
    JAX to host — model INIT must never compile on the chip (CLAUDE.md)."""
    env = dict(os.environ)
    if cpu or SMOKE_CPU:
        env["DIFF_PRUNING_TPU_PLATFORM"] = "cpu"
    # honor the platform override before any device access (the axon hook
    # ignores JAX_PLATFORMS; jax.config does win)
    shim = ("import os as _os, jax as _jax\n"
            "if _os.environ.get('DIFF_PRUNING_TPU_PLATFORM'):\n"
            "    _jax.config.update('jax_platforms',"
            " _os.environ['DIFF_PRUNING_TPU_PLATFORM'])\n")
    os.makedirs(LOGDIR, exist_ok=True)
    logpath = os.path.join(LOGDIR, f"{phase}.log")
    print(f"[pixelrun] {phase}: <python>", flush=True)
    t0 = time.time()
    with open(logpath, "a") as log:
        log.write(f"\n==== {time.strftime('%F %T')} python -c <{phase}>\n")
        log.flush()
        rc = subprocess.run([sys.executable, "-c", shim + code], cwd=REPO,
                            stdout=log, stderr=subprocess.STDOUT,
                            env=env).returncode
    dt = time.time() - t0
    print(f"[pixelrun] {phase} done rc={rc} in {dt:.0f}s", flush=True)
    return rc, dt


def tail_log(phase, n=10):
    try:
        with open(os.path.join(LOGDIR, f"{phase}.log")) as f:
            return "".join(f.readlines()[-n:])
    except OSError:
        return ""


class State:
    def __init__(self, out_dir):
        self.path = os.path.join(out_dir, "pixelrun_state.json")
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


# the scratch LDM's UNetCond: cross-attention class conditioning over the
# vq-f4 16x16x3 latent space (same family as cin256-v2, sized for a 64px
# 8-class distribution instead of 256px ImageNet)
LDM_UNET = dict(image_size=16, in_channels=3, out_channels=3,
                model_channels=128, num_res_blocks=2,
                attention_resolutions=(4, 2), channel_mult=(1, 2, 2),
                num_heads=-1, num_head_channels=32, transformer_depth=1,
                context_dim=192)
N_CLASSES = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="run/pixelrun")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny step counts, same phases/CLIs (CPU-able)")
    ap.add_argument("--scale", type=float, default=3.0, help="CFG scale")
    ap.add_argument("--sparsity", type=float, default=0.3)
    args = ap.parse_args()
    global SMOKE_CPU, LOGDIR
    SMOKE_CPU = args.smoke
    if args.smoke:  # keep shakeout noise out of the real run's evidence
        LOGDIR = os.path.join(REPO, "docs", "logs", "r5", "pixelrun_smoke")

    if args.smoke:
        n_per_class, hw = 24, 32  # vq-f4 -> 8x8 latents
        ae_steps, ldm_steps, ft_steps = 8, 8, 8
        ipc_fid, ipc_grid, ddim_steps = 4, 2, 5
        bs_ae, bs_ldm, bs_sample = 8, 8, 8
        save_every, log_every = 8, 4
        prune_steps, prune_bs = 3, 2
        unet = dict(LDM_UNET, image_size=8, model_channels=32,
                    num_head_channels=16, context_dim=32,
                    norm_num_groups=16)
    else:
        n_per_class, hw = 2500, 64  # 20k images
        ae_steps, ldm_steps, ft_steps = 8000, 20000, 10000
        ipc_fid, ipc_grid, ddim_steps = 256, 32, 100
        bs_ae, bs_ldm, bs_sample = 64, 64, 256
        save_every, log_every = 1000, 100
        prune_steps, prune_bs = 1000, 6
        unet = LDM_UNET

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    st = State(out)

    data_dir = os.path.join(out, "data")
    data_npz = os.path.join(out, "data.npz")

    # ---- data --------------------------------------------------------------
    if not st.done("data"):
        import numpy as np

        from diff_pruning_tpu.data.procedural import (
            make_procedural_class_dataset, write_labeled_folder)

        t0 = time.time()
        imgs, labels = make_procedural_class_dataset(
            n_per_class=n_per_class, hw=hw, n_classes=N_CLASSES, seed=0)
        write_labeled_folder(imgs, labels, data_dir)
        np.savez_compressed(data_npz, images=imgs)
        st.mark("data", n=len(imgs), hw=hw, secs=round(time.time() - t0, 1))

    # ---- first-stage training (the REAL vq-f4 at this resolution) ----------
    ae_dir = os.path.join(out, "ae")
    if not st.done("ae"):
        rc, dt = sh("ae", [
            "diff_pruning_tpu.cli.autoencoder_train",
            "--preset", "vq-f4", "--dataset", data_npz,
            "--resolution", str(hw), "--output_dir", ae_dir,
            "--train_batch_size", str(bs_ae), "--num_iters", str(ae_steps),
            "--disc_start", str(ae_steps + 1),  # recon-only: L1+LPIPS+VQ
            "--steps_per_dispatch", "8",
            "--save_model_steps", str(max(save_every, ae_steps // 4)),
            "--log_steps", str(log_every)])
        assert rc == 0, f"ae train failed:\n{tail_log('ae')}"
        st.mark("ae", steps=ae_steps, secs=round(dt, 1))

    # ---- codec sanity: reconstruction PSNR + grid ---------------------------
    if not st.done("ae_check"):
        rc, dt = pysub("ae_check", f"""
import sys; sys.path.insert(0, {REPO!r})
import json, os
import numpy as np
import jax, jax.numpy as jnp
from diff_pruning_tpu.models.vae import AutoencoderConfig, make_first_stage
from diff_pruning_tpu.utils.checkpoint import load_params_npz
from diff_pruning_tpu.sampling.ddim_sampler import save_image_grid
d = os.path.join({ae_dir!r}, "first_stage")
with open(os.path.join(d, "config.json")) as f:
    cfg = AutoencoderConfig.from_json(f.read())
m = make_first_stage(cfg)
p = load_params_npz(os.path.join(d, "params.npz"))
x = np.load({data_npz!r})["images"][:64].astype(np.float32) / 127.5 - 1.0
rec = jax.jit(lambda p, x: m.decode(p, m.encode(p, x)))(p, jnp.asarray(x))
rec = np.asarray(rec, np.float32)
mse = float(np.mean((rec - x) ** 2))
psnr = 10 * np.log10(4.0 / mse)  # [-1,1] range
print(json.dumps(dict(recon_mse=mse, recon_psnr=round(psnr, 2))))
grid = np.concatenate([x[:8], rec[:8]], 0) * 0.5 + 0.5
save_image_grid(np.clip(grid, 0, 1), os.path.join({out!r}, "ae_recon.png"), nrow=8)
""")
        assert rc == 0, f"ae_check failed:\n{tail_log('ae_check')}"
        info = {}
        for line in tail_log("ae_check", 3).splitlines():
            if line.startswith("{"):
                info = json.loads(line)
        st.mark("ae_check", **info, secs=round(dt, 1))

    # ---- assemble the initial LDM checkpoint --------------------------------
    ldm_init = os.path.join(out, "ldm_init")
    if not st.done("ldm_init"):
        rc, dt = pysub("ldm_init", f"""
import sys; sys.path.insert(0, {REPO!r})
import json, os, shutil
import numpy as np
import jax, jax.numpy as jnp
from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
from diff_pruning_tpu.models.unet_cond import UNetCondConfig
from diff_pruning_tpu.models.vae import AutoencoderConfig, make_first_stage
from diff_pruning_tpu.utils.checkpoint import (load_params_npz, save_model,
                                               save_params_npz)
from diff_pruning_tpu.cli.ldm_prune import write_ldm_meta
ucfg = UNetCondConfig(**{unet!r})
fs_dir = os.path.join({ae_dir!r}, "first_stage")
with open(os.path.join(fs_dir, "config.json")) as f:
    vcfg = AutoencoderConfig.from_json(f.read())
fs = make_first_stage(vcfg)
fsp = load_params_npz(os.path.join(fs_dir, "params.npz"))
# LDM std-rescaling (ddpm.py on_train_batch_start): scale_factor = 1/std(z)
x = np.load({data_npz!r})["images"][:256].astype(np.float32) / 127.5 - 1.0
z = jax.jit(fs.encode)(fsp, jnp.asarray(x))
sf = float(1.0 / np.asarray(z, np.float32).std())
ldm = LatentDiffusion(ucfg, n_classes={N_CLASSES} + 1, first_stage=fs,
                      scale_factor=sf)
params = ldm.init(jax.random.key(0))
from diff_pruning_tpu.pruning.flops import count_params
print("unet params:", count_params(params["unet"]) / 1e6, "M;",
      "scale_factor:", sf, "; latent std:", float(np.asarray(z).std()))
d = {ldm_init!r}
save_model(d, ucfg, params["unet"], subfolder="unet")
os.makedirs(os.path.join(d, "cond_stage"), exist_ok=True)
save_params_npz(os.path.join(d, "cond_stage", "params.npz"), params["cond_stage"])
save_model(d, vcfg, fsp, subfolder="first_stage")
write_ldm_meta(d, ldm)
print("ldm_init written")
""", cpu=True)
        assert rc == 0, f"ldm_init failed:\n{tail_log('ldm_init')}"
        st.mark("ldm_init", secs=round(dt, 1))

    # ---- LDM training (base) ------------------------------------------------
    base_dir = os.path.join(out, "ldm_base")
    if not st.done("ldm_train"):
        rc, dt = sh("ldm_train", [
            "diff_pruning_tpu.cli.ldm_train",
            "--model_path", ldm_init, "--dataset", data_dir,
            "--output_dir", base_dir,
            "--train_batch_size", str(bs_ldm), "--num_iters", str(ldm_steps),
            "--learning_rate", str(2e-6 * bs_ldm),
            "--uncond_prob", "0.1", "--mixed_precision", "bf16",
            "--save_model_steps", str(save_every),
            "--log_steps", str(log_every)])
        assert rc == 0, f"ldm_train failed:\n{tail_log('ldm_train')}"
        st.mark("ldm_train", steps=ldm_steps, secs=round(dt, 1))

    def sample(phase, model_dir, outdir, ipc, seed):
        rc, dt = sh(phase, [
            "diff_pruning_tpu.cli.ldm_sample",
            "--model_path", model_dir, "--output_dir", outdir,
            "--ipc", str(ipc), "--num_classes", str(N_CLASSES),
            "--batch_size", str(min(bs_sample, ipc)),
            "--ddim_steps", str(ddim_steps), "--scale", str(args.scale),
            "--seed", str(seed)])
        assert rc == 0, f"{phase} failed:\n{tail_log(phase)}"
        return dt

    # ---- base samples: grid (seed 42) + FID set (seed 0), DECODED PIXELS ----
    base_grid = os.path.join(out, "samples_base_grid")
    base_fid = os.path.join(out, "samples_base_fid")
    if not st.done("basesample"):
        dt = sample("basesample_grid", base_dir, base_grid, ipc_grid, 42)
        dt += sample("basesample_fid", base_dir, base_fid, ipc_fid, 0)
        st.mark("basesample", n=ipc_fid * N_CLASSES, secs=round(dt, 1))

    # ---- prune (self-sampled CFG latents, prune_ldm.py semantics) -----------
    pruned_dir = os.path.join(out, "pruned")
    if not st.done("prune"):
        rc, dt = sh("prune", [
            "diff_pruning_tpu.cli.ldm_prune",
            "--model_path", base_dir, "--save_path", pruned_dir,
            "--sparsity", str(args.sparsity), "--pruner", "diff-pruning",
            "--thr", "0.1", "--batch_size", str(prune_bs),
            "--ddim_steps", "20" if not args.smoke else "4",
            "--max_steps", str(prune_steps),
            "--classes", "0", "3", "5", "7"])
        assert rc == 0, f"prune failed:\n{tail_log('prune')}"
        st.mark("prune", secs=round(dt, 1))

    # ---- finetune the pruned UNet -------------------------------------------
    ft_dir = os.path.join(out, "finetuned")
    if not st.done("finetune"):
        rc, dt = sh("finetune", [
            "diff_pruning_tpu.cli.ldm_train",
            "--model_path", pruned_dir, "--dataset", data_dir,
            "--output_dir", ft_dir,
            "--train_batch_size", str(bs_ldm), "--num_iters", str(ft_steps),
            "--learning_rate", str(2e-6 * bs_ldm),
            "--uncond_prob", "0.1", "--mixed_precision", "bf16",
            "--save_model_steps", str(save_every),
            "--log_steps", str(log_every)])
        assert rc == 0, f"finetune failed:\n{tail_log('finetune')}"
        st.mark("finetune", steps=ft_steps, secs=round(dt, 1))

    # ---- pruned samples ------------------------------------------------------
    pr_grid = os.path.join(out, "samples_pruned_grid")
    pr_fid = os.path.join(out, "samples_pruned_fid")
    if not st.done("prunedsample"):
        dt = sample("prunedsample_grid", ft_dir, pr_grid, ipc_grid, 42)
        dt += sample("prunedsample_fid", ft_dir, pr_fid, ipc_fid, 0)
        st.mark("prunedsample", n=ipc_fid * N_CLASSES, secs=round(dt, 1))

    # ---- eval ----------------------------------------------------------------
    if not st.done("eval"):
        evals = {}
        for tag, d in (("fid_base_vs_data", base_fid),
                       ("fid_pruned_vs_data", pr_fid)):
            rc, dt = sh(tag, ["diff_pruning_tpu.cli.fid_score", d, data_npz,
                              "--random-init-seed", "0", "--batch-size", "256"])
            assert rc == 0, f"{tag} failed:\n{tail_log(tag)}"
            for line in tail_log(tag, 4).splitlines():
                if line.startswith("FID"):
                    evals[tag] = float(line.split()[-1])
        rc, _ = sh("ssim", ["diff_pruning_tpu.cli.compute_ssim",
                            base_grid, pr_grid])
        assert rc == 0, f"ssim failed:\n{tail_log('ssim')}"
        for line in tail_log("ssim", 4).splitlines():
            if line.startswith(("SSIM", "MSE")):
                evals["sameseed_" + line.split(":")[0].lower()] = \
                    float(line.split()[-1])
        # class consistency: the palette classifier decodes the requested
        # class from the decoded pixels (files are written class-major:
        # label = index // ipc)
        rc, _ = pysub("class_consistency", f"""
import sys; sys.path.insert(0, {REPO!r})
import glob, json, os
import numpy as np
from PIL import Image
from diff_pruning_tpu.data.procedural import classify_by_palette
for tag, d, ipc in (("base", {base_fid!r}, {ipc_fid}),
                    ("pruned", {pr_fid!r}, {ipc_fid})):
    files = sorted(glob.glob(os.path.join(d, "*.png")))
    imgs = np.stack([np.asarray(Image.open(f)) for f in files])
    want = np.arange(len(files)) // ipc
    got = classify_by_palette(imgs, {N_CLASSES})
    print(json.dumps({{"tag": tag, "class_acc": float((got == want).mean()),
                       "n": len(files)}}))
""", cpu=True)
        assert rc == 0, f"class_consistency failed:\n{tail_log('class_consistency')}"
        for line in tail_log("class_consistency", 4).splitlines():
            if line.startswith("{"):
                r = json.loads(line)
                evals[f"class_acc_{r['tag']}"] = r["class_acc"]
        st.mark("eval", **evals)

    print("[pixelrun] COMPLETE")
    print(json.dumps(st.d, indent=1))


if __name__ == "__main__":
    main()
