"""PyTorch/diffusers <-> JAX parameter conversion for UNet2DModel.

Maps a diffusers ``UNet2DModel`` state_dict (reference layout:
diffusers/models/unet_2d.py) onto this framework's param pytree:

* dotted names -> '/'-nested dict (``to_out.0`` -> ``to_out``),
* norm ``weight`` -> ``scale``,
* conv kernels OIHW -> HWIO, linear kernels (out,in) -> (in,out).

Torch is a tool-time dependency only (checkpoint import / parity tests);
nothing on the compute path imports it.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..pruning.surgery import flatten_params, unflatten_params

def torch_state_dict_to_params(sd: Mapping[str, "object"]) -> dict:
    """Convert a diffusers UNet2DModel state_dict to a params pytree."""
    flat: Dict[str, np.ndarray] = {}
    for name, tensor in sd.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        # to_out.0.weight -> to_out.weight (drop the ModuleList index; index 1
        # is Dropout with no params)
        if len(parts) >= 2 and parts[-2] == "0" and parts[-3] == "to_out":
            parts = parts[:-2] + [parts[-1]]
        leaf = parts[-1]
        stem = parts[:-1]
        if leaf == "weight":
            if arr.ndim == 4:  # conv OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
                leaf = "kernel"
            elif arr.ndim == 2:
                if stem and stem[-1] in ("class_embedding", "embedding"):
                    leaf = "weight"  # nn.Embedding (num, dim): keep layout
                else:
                    arr = arr.transpose(1, 0)  # linear (out,in) -> (in,out)
                    leaf = "kernel"
            else:  # 1-D: a norm gamma
                leaf = "scale"
        flat["/".join(stem + [leaf])] = arr
    return unflatten_params(flat)


def params_to_torch_state_dict(params: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (numpy values; caller wraps in torch tensors)."""
    out: Dict[str, np.ndarray] = {}
    for path, arr in flatten_params(params).items():
        arr = np.asarray(arr)
        parts = path.split("/")
        leaf = parts[-1]
        stem = parts[:-1]
        if leaf == "kernel":
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            else:
                arr = arr.transpose(1, 0)
            leaf = "weight"
        elif leaf == "scale":
            leaf = "weight"
        if stem and stem[-1] == "to_out":
            stem = stem + ["0"]
        out[".".join(stem + [leaf])] = arr
    return out


def load_diffusers_unet_checkpoint(model_dir: str) -> dict:
    """Load a diffusers save_pretrained UNet dir (diffusion_pytorch_model.bin
    or .safetensors) into a params pytree."""
    import os

    bin_path = os.path.join(model_dir, "diffusion_pytorch_model.bin")
    st_path = os.path.join(model_dir, "diffusion_pytorch_model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return torch_state_dict_to_params(load_file(st_path))
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return torch_state_dict_to_params(sd)
    raise FileNotFoundError(f"no UNet weights in {model_dir}")


# -- diffusers save_pretrained EXPORT -----------------------------------------

_EXPORT_DIFFUSERS_VERSION = "0.11.1"  # the version the reference pins

_SCHEDULER_EXTRAS = {
    # reference pipeline saves: DDPMScheduler / DDIMScheduler config keys
    # beyond the shared beta family (diffusers scheduling_ddpm.py /
    # scheduling_ddim.py defaults as of the pinned version).
    "DDPMScheduler": {"clip_sample": True, "variance_type": "fixed_small",
                      "prediction_type": "epsilon", "trained_betas": None},
    "DDIMScheduler": {"clip_sample": True, "set_alpha_to_one": True,
                      "steps_offset": 0, "prediction_type": "epsilon",
                      "trained_betas": None},
}


def export_diffusers_pipeline(dst: str, cfg, params: dict, *,
                              pipeline_class: str = "DDPMPipeline",
                              scheduler_class: str = "DDPMScheduler",
                              num_train_timesteps: int = 1000,
                              beta_schedule: str = "linear",
                              beta_start: float = 0.0001,
                              beta_end: float = 0.02) -> None:
    """Write a diffusers ``save_pretrained``-layout pipeline directory.

    The reference persists its artifacts this way
    (``pipeline.save_pretrained(args.save_path)``, ddpm_prune.py:132) so HF
    ecosystem tooling can consume them; this is the export half of our
    importer (`load_diffusers_unet_checkpoint`). Layout:

      dst/model_index.json
      dst/unet/{config.json, diffusion_pytorch_model.safetensors}
      dst/scheduler/scheduler_config.json

    Pruned-shape caveat: stock diffusers reconstructs module shapes from
    config alone, which cannot express per-layer pruned channel counts — the
    reference itself falls back to pickling the whole pruned module
    (ddpm_prune.py:133-135, ``torch.save(model, .../unet_pruned.pth)``). We
    keep ``channel_sizes`` in the exported unet/config.json (diffusers
    ignores unknown config keys) so OUR importer round-trips pruned models,
    but only unpruned-shape exports instantiate in stock diffusers.
    """
    import dataclasses
    import json
    import os

    from safetensors.numpy import save_file

    unet_dir = os.path.join(dst, "unet")
    sched_dir = os.path.join(dst, "scheduler")
    os.makedirs(unet_dir, exist_ok=True)
    os.makedirs(sched_dir, exist_ok=True)

    with open(os.path.join(dst, "model_index.json"), "w") as f:
        json.dump({"_class_name": pipeline_class,
                   "_diffusers_version": _EXPORT_DIFFUSERS_VERSION,
                   "scheduler": ["diffusers", scheduler_class],
                   "unet": ["diffusers", "UNet2DModel"]}, f, indent=2)

    d = dataclasses.asdict(cfg)
    if not d.get("channel_sizes"):
        d.pop("channel_sizes", None)
    d.pop("_JSON_SKIP", None)
    d["_class_name"] = "UNet2DModel"
    d["_diffusers_version"] = _EXPORT_DIFFUSERS_VERSION
    with open(os.path.join(unet_dir, "config.json"), "w") as f:
        json.dump(d, f, indent=2, sort_keys=True)

    sd = params_to_torch_state_dict(params)
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        a = np.asarray(v)
        if a.dtype not in (np.float32, np.float64) and a.dtype.kind == "V":
            a = a.astype(np.float32)  # ml_dtypes bfloat16 -> f32 for torch
        elif a.dtype == np.float64:
            a = a.astype(np.float32)
        out[k] = np.ascontiguousarray(a)
    save_file(out, os.path.join(unet_dir,
                                "diffusion_pytorch_model.safetensors"))

    sched = {"_class_name": scheduler_class,
             "_diffusers_version": _EXPORT_DIFFUSERS_VERSION,
             "num_train_timesteps": num_train_timesteps,
             "beta_schedule": beta_schedule,
             "beta_start": beta_start, "beta_end": beta_end}
    sched.update(_SCHEDULER_EXTRAS.get(scheduler_class, {}))
    with open(os.path.join(sched_dir, "scheduler_config.json"), "w") as f:
        json.dump(sched, f, indent=2, sort_keys=True)


# -- CompVis LDM UNetModel (openaimodel) conversion ---------------------------

_LDM_RENAMES = [
    ("in_layers.0.", "in_norm."),
    ("in_layers.2.", "in_conv."),
    ("emb_layers.1.", "emb_proj."),
    ("out_layers.0.", "out_norm."),
    ("out_layers.3.", "out_conv."),
    ("ff.net.0.proj.", "ff.proj."),
    ("ff.net.2.", "ff.out."),
    ("to_out.0.", "to_out."),
]


def ldm_unet_state_dict_to_params(sd: Mapping[str, "object"],
                                  attn_heads: Mapping[str, int] = None) -> dict:
    """CompVis openaimodel.UNetModel state_dict -> UNetCond params pytree.

    Handles: input_blocks.0.0 (conv_in) -> input_blocks/0/conv; ResBlock
    sequential indices -> named leaves (_LDM_RENAMES); SpatialTransformer
    names pass through; conv OIHW->HWIO; linear transpose; norm weight->scale.

    Non-spatial-transformer AttentionBlocks (openaimodel.py:278-341) store a
    fused qkv conv1d whose channel layout is HEAD-INTERLEAVED
    (QKVAttentionLegacy:314: (B, 3C, T) viewed as (H, 3, ch, T)); pass
    ``attn_heads`` (UNetCond.attn_heads: block path -> heads) so the fused
    weights de-interleave into to_q/to_k/to_v correctly.
    """
    flat: Dict[str, np.ndarray] = {}
    qkv_blocks = {name.split(".qkv.")[0] for name in sd if ".qkv." in name}
    for name, tensor in sd.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        n = name
        blk = n.rsplit(".", 2)[0] if n.count(".") >= 2 else ""
        if ".qkv." in n:
            block = n.split(".qkv.")[0]
            bpath = block.replace(".", "/")
            if attn_heads is None or bpath not in attn_heads:
                raise ValueError(
                    f"fused qkv at {block}: pass attn_heads (UNetCond.attn_heads)")
            h = attn_heads[bpath]
            if n.endswith("weight"):  # conv1d (3C, C, 1)
                w = arr[..., 0] if arr.ndim == 3 else arr
                c3, cin = w.shape
                ch = c3 // 3 // h
                w = w.reshape(h, 3, ch, cin)
                for i, nm in enumerate(("to_q", "to_k", "to_v")):
                    flat[f"{bpath}/{nm}/kernel"] = (
                        w[:, i].reshape(h * ch, cin).transpose(1, 0))
            else:  # bias (3C,)
                b = arr.reshape(h, 3, -1)
                for i, nm in enumerate(("to_q", "to_k", "to_v")):
                    flat[f"{bpath}/{nm}/bias"] = b[:, i].reshape(-1)
            continue
        if blk in qkv_blocks:
            # the same block's norm/proj_out map to SelfAttention2D names
            n = n.replace(".norm.", ".group_norm.").replace(
                ".proj_out.", ".to_out.")
            if n.endswith("weight"):
                arr = arr[..., 0] if arr.ndim == 3 else arr  # conv1d squeeze
        if n.startswith("input_blocks.0.0."):
            n = n.replace("input_blocks.0.0.", "input_blocks.0.conv.")
        for old, new in _LDM_RENAMES:
            n = n.replace(old, new)
        parts = n.split(".")
        leaf = parts[-1]
        stem = parts[:-1]
        if leaf == "weight":
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)
                leaf = "kernel"
            elif arr.ndim == 2:
                if stem and stem[-1] in ("label_emb", "embedding"):
                    pass  # embeddings keep (num, dim)
                else:
                    arr = arr.transpose(1, 0)
                    leaf = "kernel"
            else:
                leaf = "scale"
        flat["/".join(stem + [leaf])] = arr
    return unflatten_params(flat)


# -- ermongroup/DDIM original checkpoint conversion ---------------------------

def ddim_original_state_dict_to_params(sd: Mapping[str, "object"],
                                       num_levels: int) -> dict:
    """ermongroup DDIM `Model` state_dict (heibox ema checkpoints, loaded by
    ddpm_exp/runners/diffusion.py:150-174) -> UNet2D params pytree.

    Name plan (cf. the reference converter
    tools/convert_ddpm_original_checkpoint_to_diffusers_cifar10.py:19-233):
      temb.dense.{0,1} -> time_embedding/linear_{1,2};
      down.{i}.block.{j} -> down_blocks/{i}/resnets/{j} with
        temb_proj->time_emb_proj, nin_shortcut->conv_shortcut;
      down.{i}.attn.{j}: norm->group_norm, q/k/v 1x1 convs squeezed to
        linears, proj_out->to_out;
      mid.block_1/attn_1/block_2 -> mid_block resnets/attentions;
      up.{i} -> up_blocks/{num_levels-1-i} (the DDIM codebase indexes up
        levels by resolution, diffusers by application order);
      norm_out -> conv_norm_out.
    """
    flat: Dict[str, np.ndarray] = {}
    for name, tensor in sd.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        is_attn = len(parts) > 2 and parts[2] == "attn" or (parts[0] == "mid" and parts[1] == "attn_1")

        n = name
        n = n.replace("temb.dense.0.", "time_embedding.linear_1.")
        n = n.replace("temb.dense.1.", "time_embedding.linear_2.")
        n = n.replace("norm_out.", "conv_norm_out.")
        n = n.replace("mid.block_1.", "mid_block.resnets.0.")
        n = n.replace("mid.block_2.", "mid_block.resnets.1.")
        n = n.replace("mid.attn_1.", "mid_block.attentions.0.")
        if n.startswith("down."):
            n = "down_blocks." + n[len("down."):]
        if n.startswith("up."):
            segs = n.split(".")
            segs[0] = "up_blocks"
            segs[1] = str(num_levels - 1 - int(segs[1]))
            n = ".".join(segs)
        n = n.replace(".block.", ".resnets.")
        n = n.replace(".attn.", ".attentions.")
        n = n.replace(".downsample.conv.", ".downsamplers.0.conv.")
        n = n.replace(".upsample.conv.", ".upsamplers.0.conv.")
        n = n.replace(".temb_proj.", ".time_emb_proj.")
        n = n.replace(".nin_shortcut.", ".conv_shortcut.")
        if is_attn:
            n = n.replace(".norm.", ".group_norm.")
            n = n.replace(".q.", ".to_q.")
            n = n.replace(".k.", ".to_k.")
            n = n.replace(".v.", ".to_v.")
            n = n.replace(".proj_out.", ".to_out.")
            if arr.ndim == 4:  # 1x1 conv (O, I, 1, 1) -> linear kernel (I, O)
                arr = arr[:, :, 0, 0].transpose(1, 0)
                flat["/".join(n.split(".")[:-1] + ["kernel"])] = arr
                continue

        parts = n.split(".")
        leaf = parts[-1]
        stem = parts[:-1]
        if leaf == "weight":
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)
                leaf = "kernel"
            elif arr.ndim == 2:
                arr = arr.transpose(1, 0)
                leaf = "kernel"
            else:
                leaf = "scale"
        flat["/".join(stem + [leaf])] = arr
    return unflatten_params(flat)


def bert_embedder_state_dict_to_params(sd: Mapping[str, "object"]) -> dict:
    """Vendored x-transformers TransformerWrapper state_dict (the
    BERTEmbedder.transformer of txt2img-1p4B,
    ldm_exp/ldm/modules/x_transformer.py:548-641) -> BERTEmbedder params.

    Layer list layout: attn_layers.layers.{2i} = (LayerNorm, Attention,
    Residual) and .{2i+1} = (LayerNorm, FeedForward, Residual); FeedForward's
    Sequential is net.0.0 (Linear) / net.0.1 (GELU) / net.2 (Linear)."""

    def arr(k, t=False):
        a = sd[k]
        a = np.asarray(a.detach().cpu().numpy() if hasattr(a, "detach") else a)
        return a.T if t else a

    flat: Dict[str, np.ndarray] = {
        "token_emb/embedding": arr("token_emb.weight"),
        "pos_emb/embedding": arr("pos_emb.emb.weight"),
        "norm/scale": arr("norm.weight"),
        "norm/bias": arr("norm.bias"),
        "to_logits/kernel": arr("to_logits.weight", t=True),
        "to_logits/bias": arr("to_logits.bias"),
    }
    n_layer = (1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("attn_layers.layers."))) // 2
    for i in range(n_layer):
        a = f"attn_layers.layers.{2 * i}"
        f = f"attn_layers.layers.{2 * i + 1}"
        pre = f"layers/{i}"
        flat[f"{pre}/attn_norm/scale"] = arr(f"{a}.0.weight")
        flat[f"{pre}/attn_norm/bias"] = arr(f"{a}.0.bias")
        for proj in ("to_q", "to_k", "to_v"):
            flat[f"{pre}/attn/{proj}/kernel"] = arr(f"{a}.1.{proj}.weight", t=True)
        flat[f"{pre}/attn/to_out/kernel"] = arr(f"{a}.1.to_out.weight", t=True)
        flat[f"{pre}/attn/to_out/bias"] = arr(f"{a}.1.to_out.bias")
        flat[f"{pre}/ff_norm/scale"] = arr(f"{f}.0.weight")
        flat[f"{pre}/ff_norm/bias"] = arr(f"{f}.0.bias")
        flat[f"{pre}/ff/fc1/kernel"] = arr(f"{f}.1.net.0.0.weight", t=True)
        flat[f"{pre}/ff/fc1/bias"] = arr(f"{f}.1.net.0.0.bias")
        flat[f"{pre}/ff/fc2/kernel"] = arr(f"{f}.1.net.2.weight", t=True)
        flat[f"{pre}/ff/fc2/bias"] = arr(f"{f}.1.net.2.bias")
    return unflatten_params(flat)


def infer_compvis_vae_config(sd: Mapping[str, "object"], resolution: int = 256):
    """Derive an AutoencoderConfig from a CompVis first-stage state_dict
    (ldm autoencoder.py VQModel/AutoencoderKL over ldm model.py
    Encoder/Decoder). Every ddconfig field is recoverable from shapes/keys
    except the training resolution (all zoo models use 256 —
    models/first_stage_models/*/config.yaml)."""
    from ..models.vae import AutoencoderConfig

    def shape(k):
        v = sd[k]
        return tuple(v.shape)

    in_channels = shape("encoder.conv_in.weight")[1]
    blocks = []
    i = 0
    while f"encoder.down.{i}.block.0.conv1.weight" in sd:
        blocks.append(shape(f"encoder.down.{i}.block.0.conv1.weight")[0])
        i += 1
    num_levels = i
    j = 0
    while f"encoder.down.0.block.{j}.conv1.weight" in sd:
        j += 1
    enc_out = shape("encoder.conv_out.weight")[0]
    z_channels = shape("decoder.conv_in.weight")[1]
    double_z = enc_out == 2 * z_channels
    attn_res = tuple(sorted({resolution // (2 ** k) for k in range(num_levels)
                             if f"encoder.down.{k}.attn.0.norm.weight" in sd},
                            reverse=True))
    vq = "quantize.embedding.weight" in sd
    if vq:
        n_embed, embed_dim = shape("quantize.embedding.weight")
    else:
        embed_dim = shape("post_quant_conv.weight")[1]
        n_embed = None
    assert embed_dim == z_channels, (
        "zoo models all use embed_dim == z_channels; a differing pair needs "
        "a quant-dim extension")
    return AutoencoderConfig(
        in_channels=in_channels, out_channels=shape("decoder.conv_out.weight")[0],
        block_out_channels=tuple(blocks), layers_per_block=j,
        latent_channels=z_channels, sample_size=resolution,
        num_vq_embeddings=n_embed, vq_embed_dim=embed_dim if vq else None,
        attn_resolutions=attn_res,
        mid_block_attention="encoder.mid.attn_1.norm.weight" in sd)


def compvis_vae_state_dict_to_params(sd: Mapping[str, "object"],
                                     num_levels: int) -> dict:
    """CompVis first-stage (ldm model.py Encoder/Decoder + quantize/quant
    convs) state_dict -> VQModel/AutoencoderKL params pytree.

    The CompVis encoder/decoder use the pytorch_diffusion naming the DDIM
    UNet also uses (down.{i}.block.{j}, mid.block_1/attn_1/block_2, attn
    q/k/v as 1x1 convs, nin_shortcut, norm_out) — same name plan as
    ddim_original_state_dict_to_params minus the time embedding, applied
    under the encoder./decoder. prefixes. `loss.*` (LPIPS/discriminator)
    keys are dropped: the perceptual loss lives in eval/lpips.py and the
    discriminator in models/discriminator.py with their own converters.
    """
    flat: Dict[str, np.ndarray] = {}
    for name, tensor in sd.items():
        if name.startswith("loss."):
            continue
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        prefix = parts[0]
        if prefix in ("encoder", "decoder"):
            rest = parts[1:]
            is_attn = (len(rest) > 2 and rest[2] == "attn") or (
                rest[0] == "mid" and rest[1] == "attn_1")
            n = ".".join(rest)
            n = n.replace("norm_out.", "conv_norm_out.")
            n = n.replace("mid.block_1.", "mid_block.resnets.0.")
            n = n.replace("mid.block_2.", "mid_block.resnets.1.")
            n = n.replace("mid.attn_1.", "mid_block.attentions.0.")
            if n.startswith("down."):
                n = "down_blocks." + n[len("down."):]
            if n.startswith("up."):
                segs = n.split(".")
                segs[0] = "up_blocks"
                # CompVis indexes up levels by resolution (executed in
                # reverse, model.py Decoder:679), ours by application order
                segs[1] = str(num_levels - 1 - int(segs[1]))
                n = ".".join(segs)
            n = n.replace(".block.", ".resnets.")
            n = n.replace(".attn.", ".attentions.")
            n = n.replace(".downsample.conv.", ".downsamplers.0.conv.")
            n = n.replace(".upsample.conv.", ".upsamplers.0.conv.")
            n = n.replace(".nin_shortcut.", ".conv_shortcut.")
            if is_attn:
                n = n.replace(".norm.", ".group_norm.")
                n = n.replace(".q.", ".to_q.")
                n = n.replace(".k.", ".to_k.")
                n = n.replace(".v.", ".to_v.")
                n = n.replace(".proj_out.", ".to_out.")
                if arr.ndim == 4:  # 1x1 conv -> linear kernel (I, O)
                    arr = arr[:, :, 0, 0].transpose(1, 0)
                    flat["/".join([prefix] + n.split(".")[:-1] + ["kernel"])] = arr
                    continue
            n = prefix + "." + n
        elif prefix in ("quant_conv", "post_quant_conv", "quantize"):
            n = name.replace("quantize.embedding.", "quantize.embedding#")
        else:
            continue
        parts = n.replace("#", ".").split(".")
        leaf, stem = parts[-1], parts[:-1]
        if leaf == "weight":
            if name.startswith("quantize.embedding."):
                pass  # (n_embed, dim) embedding table keeps its layout
            elif arr.ndim == 4:
                arr, leaf = arr.transpose(2, 3, 1, 0), "kernel"
            elif arr.ndim == 2:
                arr, leaf = arr.transpose(1, 0), "kernel"
            else:
                leaf = "scale"
        flat["/".join(stem + [leaf])] = arr
    return unflatten_params(flat)


def torch_discriminator_state_dict_to_params(sd: Mapping[str, "object"],
                                             n_layers: int = 3) -> dict:
    """taming NLayerDiscriminator state_dict (`loss.discriminator.*` inside a
    first-stage checkpoint, stripped of that prefix) -> params for
    models/discriminator.NLayerDiscriminator.

    torch layout: main.{seq}.* where seq counts Sequential entries:
    conv(0), leaky(1), then per block [conv, norm, leaky], final conv.
    """
    # sequential index of each block's conv / norm
    conv_idx = {0: 0}
    norm_idx = {}
    pos = 2
    for b in range(1, n_layers + 1):
        conv_idx[b] = pos
        norm_idx[b] = pos + 1
        pos += 3
    conv_idx["out"] = pos

    def arr(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    out: Dict[str, np.ndarray] = {}
    for b, ci in conv_idx.items():
        w = arr(f"main.{ci}.weight")
        out[f"main/{b}/conv/kernel"] = w.transpose(2, 3, 1, 0)
        if f"main.{ci}.bias" in sd:
            out[f"main/{b}/conv/bias"] = arr(f"main.{ci}.bias")
    for b, ni in norm_idx.items():
        if f"main.{ni}.weight" in sd:  # BatchNorm
            out[f"main/{b}/norm/scale"] = arr(f"main.{ni}.weight")
            out[f"main/{b}/norm/bias"] = arr(f"main.{ni}.bias")
        else:  # ActNorm (loc/scale shaped (1,C,1,1))
            out[f"main/{b}/norm/scale"] = arr(f"main.{ni}.scale").reshape(-1)
            out[f"main/{b}/norm/loc"] = arr(f"main.{ni}.loc").reshape(-1)
    return unflatten_params(out)
