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

import re
from typing import Dict, Mapping

import numpy as np

from ..pruning.surgery import flatten_params, unflatten_params

_NORM_PAT = re.compile(r"(norm1|norm2|group_norm|conv_norm_out)$")


def _is_conv_kernel(path_parts, arr) -> bool:
    return arr.ndim == 4


def _is_linear_kernel(arr) -> bool:
    return arr.ndim == 2


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


def ldm_unet_state_dict_to_params(sd: Mapping[str, "object"]) -> dict:
    """CompVis openaimodel.UNetModel state_dict -> UNetCond params pytree.

    Handles: input_blocks.0.0 (conv_in) -> input_blocks/0/conv; ResBlock
    sequential indices -> named leaves (_LDM_RENAMES); SpatialTransformer
    names pass through; conv OIHW->HWIO; linear transpose; norm weight->scale.
    """
    flat: Dict[str, np.ndarray] = {}
    for name, tensor in sd.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        n = name
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
