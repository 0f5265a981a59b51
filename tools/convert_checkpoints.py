#!/usr/bin/env python
"""Checkpoint converters (tool-time; torch required for .pth/.bin/.ckpt).

Covers the reference's tools/convert_ddpm_original_checkpoint_to_diffusers_
cifar10.py and convert_ldm_original_checkpoint_to_diffusers.py, targeting
this framework's (config.json, params.npz) layout, plus the FID inception
weights and diffusers save_pretrained dirs.

  python tools/convert_checkpoints.py diffusers   <hf_model_dir> <out_dir>
  python tools/convert_checkpoints.py export-diffusers <model_dir> <out_dir>  # our (config.json,params.npz) -> HF save_pretrained layout
  python tools/convert_checkpoints.py ddim        <ckpt.pth> <out_dir> --config cifar10|celeba|lsun
  python tools/convert_checkpoints.py compvis     <model.ckpt> <out_dir>   # cin256-v2 LDM (+first stage)
  python tools/convert_checkpoints.py first-stage <model.ckpt> <out_dir>   # kl-f*/vq-f* autoencoder
  python tools/convert_checkpoints.py inception   <pt_inception.pth> <out.npz>
  python tools/convert_checkpoints.py lpips       <vgg16.pth> <out.npz> --lin <vgg_lpips.ckpt>
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_first_stage(sd, dst, resolution):
    """CompVis first-stage state_dict (standalone kl-f*/vq-f* model.ckpt, or
    the first_stage_model.* slice of a full LDM ckpt) -> dst/first_stage."""
    from diff_pruning_tpu.models.vae import make_first_stage
    from diff_pruning_tpu.utils.checkpoint import save_params_npz
    from diff_pruning_tpu.utils.convert import (compvis_vae_state_dict_to_params,
                                                infer_compvis_vae_config)

    cfg = infer_compvis_vae_config(sd, resolution=resolution)
    params = compvis_vae_state_dict_to_params(
        sd, num_levels=len(cfg.block_out_channels))
    make_first_stage(cfg).graph.validate(params)
    d = os.path.join(dst, "first_stage")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        f.write(cfg.to_json())
    save_params_npz(os.path.join(d, "params.npz"), params)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["diffusers", "export-diffusers", "ddim",
                                    "compvis", "first-stage", "inception",
                                    "lpips", "clip"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--config", default="cifar10",
                   choices=["cifar10", "celeba", "lsun",          # ddim kind
                            "cin256-v2", "txt2img-1p4B",          # compvis kind
                            "inpainting_big"])
    p.add_argument("--lin", default=None,
                   help="lpips kind: taming vgg_lpips lin-head checkpoint")
    p.add_argument("--pipeline", default="DDPMPipeline",
                   choices=["DDPMPipeline", "DDIMPipeline"],
                   help="export-diffusers kind: model_index.json class")
    p.add_argument("--scheduler", default="DDPMScheduler",
                   choices=["DDPMScheduler", "DDIMScheduler"],
                   help="export-diffusers kind: scheduler config class")
    p.add_argument("--resolution", type=int, default=256,
                   help="first-stage kind: training resolution (all zoo "
                        "models are 256); fixes attn_resolutions inference")
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

    elif args.kind == "export-diffusers":
        from diff_pruning_tpu.utils.checkpoint import load_model
        from diff_pruning_tpu.utils.convert import export_diffusers_pipeline

        cfg, params = load_model(args.src)
        export_diffusers_pipeline(args.dst, cfg, params,
                                  pipeline_class=args.pipeline,
                                  scheduler_class=args.scheduler)
        print(f"wrote {args.dst}/ (diffusers save_pretrained layout)")

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
                                                       inpainting_big_config,
                                                       txt2img_1p4B_config)
        from diff_pruning_tpu.utils.checkpoint import save_model, save_params_npz
        from diff_pruning_tpu.utils.convert import ldm_unet_state_dict_to_params

        pl_sd = torch.load(args.src, map_location="cpu", weights_only=False)
        sd = pl_sd.get("state_dict", pl_sd)
        unet_sd = {k[len("model.diffusion_model."):]: v for k, v in sd.items()
                   if k.startswith("model.diffusion_model.")}
        cfg = {"txt2img-1p4B": txt2img_1p4B_config,
               "inpainting_big": inpainting_big_config}.get(
                   args.config, cin256_v2_config)()
        model = UNetCond(cfg)
        # attn_heads de-interleaves fused-qkv AttentionBlock weights
        # (inpainting_big and the other non-spatial-transformer models)
        params = ldm_unet_state_dict_to_params(unet_sd,
                                               attn_heads=model.attn_heads)
        model.graph.validate(params)
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
        fs = {k[len("first_stage_model."):]: v for k, v in sd.items()
              if k.startswith("first_stage_model.")}
        if fs:
            _write_first_stage(fs, args.dst, args.resolution)
            subs.append("first_stage")
        print(f"wrote {args.dst}/" + " + ".join(subs))

    elif args.kind == "first-stage":
        import torch

        pl_sd = torch.load(args.src, map_location="cpu", weights_only=False)
        sd = pl_sd.get("state_dict", pl_sd)
        _write_first_stage(sd, args.dst, args.resolution)
        print(f"wrote {args.dst}/first_stage")

    elif args.kind == "lpips":
        import torch

        from diff_pruning_tpu.eval.lpips import torch_lpips_state_dicts_to_params
        from diff_pruning_tpu.utils.checkpoint import save_params_npz

        if not args.lin:
            p.error("lpips kind needs --lin <vgg_lpips.ckpt> (the taming "
                    "lin-head checkpoint)")
        vgg_sd = torch.load(args.src, map_location="cpu", weights_only=True)
        lin_sd = torch.load(args.lin, map_location="cpu", weights_only=True)
        lin_sd = lin_sd.get("state_dict", lin_sd)
        params = torch_lpips_state_dicts_to_params(vgg_sd, lin_sd)
        save_params_npz(args.dst, params)
        print(f"wrote {args.dst}")

    elif args.kind == "clip":
        import torch

        from diff_pruning_tpu.models.clip import (CLIP, clip_vit_l14_config,
                                                  openai_clip_state_dict_to_params)
        from diff_pruning_tpu.utils.checkpoint import save_params_npz

        # OpenAI clip.load downloads a TorchScript archive; plain state
        # dicts also accepted
        try:
            sd = torch.jit.load(args.src, map_location="cpu").state_dict()
        except RuntimeError:
            sd = torch.load(args.src, map_location="cpu", weights_only=True)
            sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        params = openai_clip_state_dict_to_params(sd)
        cfg = clip_vit_l14_config()
        CLIP(cfg).graph.validate(params)
        os.makedirs(args.dst, exist_ok=True)
        with open(os.path.join(args.dst, "config.json"), "w") as f:
            f.write(cfg.to_json())
        save_params_npz(os.path.join(args.dst, "params.npz"), params)
        print(f"wrote {args.dst}")

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
