"""Pin our MACs counter against the reference's op_counter on the full
CIFAR-10 UNet (VERDICT r1 weak #7 / next-round #10): the 6.05G (ours) vs
6.1G (reference print) gap must be an ASSERTED decomposition — the
reference total is conv+linear MACs (which we must match near-exactly)
plus its elementwise/norm/pool hook contributions — not an assumed
"counter-semantics slop".

Reference counter: ddpm_exp/torch_pruning/utils/op_counter.py (ptflops
fork; conv hook :75-103, linear :53-58, and empty/elementwise hooks that
still add counts for BN/ReLU/pool/upsample)."""

import importlib.util
import sys

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config
from diff_pruning_tpu.pruning.flops import count_ops_and_params
from diff_pruning_tpu.utils.convert import torch_state_dict_to_params

from test_unet_parity import _load_reference_unet  # shimmed reference import

OP_COUNTER = "/root/reference/ddpm_exp/torch_pruning/utils/op_counter.py"


def _load_op_counter():
    spec = importlib.util.spec_from_file_location("ref_op_counter", OP_COUNTER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_macs_match_reference_counter_on_cifar_unet():
    cfg = ddpm_cifar10_config()
    ref = _load_reference_unet(cfg).eval()
    oc = _load_op_counter()

    import copy

    import torch.nn as nn

    fm = oc.add_flops_counting_methods(copy.deepcopy(ref))
    fm.eval()
    fm.start_flops_count(ost=sys.stdout, verbose=False, ignore_list=[])
    with torch.no_grad():
        fm(torch.zeros(1, 3, 32, 32), torch.zeros((1,), dtype=torch.long))
    ref_total, ref_params = fm.compute_average_flops_cost()
    ref_conv_linear = sum(
        int(m.__flops__) for m in fm.modules()
        if isinstance(m, (nn.Conv2d, nn.Linear)))
    ref_other = ref_total - ref_conv_linear
    fm.stop_flops_count()

    params = torch_state_dict_to_params(ref.state_dict())
    model = UNet2D(cfg)
    our_macs, our_params = count_ops_and_params(model, params, (1, 32, 32, 3))

    # params must agree exactly
    assert our_params == int(ref_params)
    # our counter is conv+linear only (SURVEY §2.2 op_counter row); it must
    # match the reference's conv+linear component to <0.1%
    assert abs(our_macs - ref_conv_linear) / ref_conv_linear < 1e-3, (
        f"ours {our_macs} vs reference conv+linear {ref_conv_linear}")
    # and the printed 6.1G vs our 6.05G gap is exactly the reference's
    # elementwise/norm/pool hook contributions
    assert ref_other > 0
    assert abs((our_macs + ref_other) - ref_total) / ref_total < 1e-3
    print(f"ours {our_macs/1e9:.4f}G + other-hooks {ref_other/1e9:.4f}G "
          f"= reference {ref_total/1e9:.4f}G")
