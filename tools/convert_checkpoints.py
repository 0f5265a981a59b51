#!/usr/bin/env python
"""Checkpoint converters (tool-time; torch required for .pth/.bin/.ckpt).

Covers the reference's tools/convert_ddpm_original_checkpoint_to_diffusers_
cifar10.py and convert_ldm_original_checkpoint_to_diffusers.py, targeting
this framework's (config.json, params.npz) layout, plus the FID inception
weights and diffusers save_pretrained dirs.

  python tools/convert_checkpoints.py diffusers  <hf_model_dir> <out_dir>
  python tools/convert_checkpoints.py ddim       <ckpt.pth> <out_dir> --config cifar10|celeba|lsun
  python tools/convert_checkpoints.py compvis    <model.ckpt> <out_dir>   # cin256-v2 LDM
  python tools/convert_checkpoints.py inception  <pt_inception.pth> <out.npz>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["diffusers", "ddim", "compvis", "inception"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--config", default="cifar10",
                   choices=["cifar10", "celeba", "lsun",          # ddim kind
                            "cin256-v2", "txt2img-1p4B"])         # compvis kind
    args = p.parse_args()

    if args.kind == "diffusers":
        from diff_pruning_tpu.models.unet2d import UNet2DConfig
        from diff_pruning_tpu.utils.checkpoint import save_model
        from diff_pruning_tpu.utils.convert import load_diffusers_unet_checkpoint

        sub = "unet" if os.path.isdir(os.path.join(args.src, "unet")) else ""
        d = os.path.join(args.src, sub)
        with open(os.path.join(d, "config.json")) as f:
            cfg = UNet2DConfig.from_json(f.read())
        params = load_diffusers_unet_checkpoint(d)
        from diff_pruning_tpu.models.unet2d import UNet2D

        UNet2D(cfg).graph.validate(params)
        save_model(args.dst, cfg, params)
        print(f"wrote {args.dst}/unet")

    elif args.kind == "ddim":
        import torch

        from diff_pruning_tpu.models.unet2d import (
            UNet2D, ddpm_celeba64_config, ddpm_cifar10_config, ddpm_lsun256_config)
        from diff_pruning_tpu.utils.checkpoint import save_model
        from diff_pruning_tpu.utils.convert import ddim_original_state_dict_to_params

        cfg = {"cifar10": ddpm_cifar10_config, "celeba": ddpm_celeba64_config,
               "lsun": ddpm_lsun256_config}[args.config]()
        sd = torch.load(args.src, map_location="cpu", weights_only=True)
        if isinstance(sd, (list, tuple)):  # [model, optim, epoch, step, ema]
            sd = sd[-1] if isinstance(sd[-1], dict) else sd[0]
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        params = ddim_original_state_dict_to_params(
            sd, num_levels=len(cfg.block_out_channels))
        UNet2D(cfg).graph.validate(params)
        save_model(args.dst, cfg, params)
        print(f"wrote {args.dst}/unet ({args.config})")

    elif args.kind == "compvis":
        import torch

        from diff_pruning_tpu.models.unet_cond import (UNetCond,
                                                       cin256_v2_config,
                                                       txt2img_1p4B_config)
        from diff_pruning_tpu.utils.checkpoint import save_model, save_params_npz
        from diff_pruning_tpu.utils.convert import ldm_unet_state_dict_to_params

        pl_sd = torch.load(args.src, map_location="cpu", weights_only=False)
        sd = pl_sd.get("state_dict", pl_sd)
        unet_sd = {k[len("model.diffusion_model."):]: v for k, v in sd.items()
                   if k.startswith("model.diffusion_model.")}
        cfg = (txt2img_1p4B_config if args.config == "txt2img-1p4B"
               else cin256_v2_config)()
        params = ldm_unet_state_dict_to_params(unet_sd)
        UNetCond(cfg).graph.validate(params)
        save_model(args.dst, cfg, params)
        subs = ["unet"]
        cond = {k: v for k, v in sd.items() if k.startswith("cond_stage_model.")}
        if any(k.startswith("cond_stage_model.transformer.") for k in cond):
            # BERTEmbedder (txt2img-1p4B): the x-transformers TransformerWrapper
            from diff_pruning_tpu.models.text_encoder import (
                BERTEmbedder, bert_txt2img_config)
            from diff_pruning_tpu.utils.convert import (
                bert_embedder_state_dict_to_params)

            tsd = {k[len("cond_stage_model.transformer."):]: v
                   for k, v in cond.items()
                   if k.startswith("cond_stage_model.transformer.")}
            bcfg = bert_txt2img_config()
            bparams = bert_embedder_state_dict_to_params(tsd)
            BERTEmbedder(bcfg).graph.validate(bparams)
            os.makedirs(os.path.join(args.dst, "cond_stage"), exist_ok=True)
            with open(os.path.join(args.dst, "cond_stage", "config.json"), "w") as f:
                f.write(bcfg.to_json())
            save_params_npz(os.path.join(args.dst, "cond_stage", "params.npz"),
                            bparams)
            subs.append("cond_stage[bert]")
        elif "cond_stage_model.embedding.weight" in cond:
            # ClassEmbedder (cin256-v2)
            import numpy as np

            w = np.asarray(cond["cond_stage_model.embedding.weight"])
            os.makedirs(os.path.join(args.dst, "cond_stage"), exist_ok=True)
            save_params_npz(os.path.join(args.dst, "cond_stage", "params.npz"),
                            {"embedding": {"weight": w}})
            subs.append("cond_stage[class]")
        print(f"wrote {args.dst}/" + " + ".join(subs))

    elif args.kind == "inception":
        import torch

        from diff_pruning_tpu.eval.inception import torch_inception_state_dict_to_params
        from diff_pruning_tpu.utils.checkpoint import save_params_npz

        sd = torch.load(args.src, map_location="cpu", weights_only=True)
        params = torch_inception_state_dict_to_params(sd)
        save_params_npz(args.dst, params)
        print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
