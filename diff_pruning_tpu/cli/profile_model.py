"""CLI: MACs / params / exact-FLOPs / memory report — covers the reference's
compute_flops.py, profile_ldm.py (tp.utils.count_ops_and_params +
torch.cuda.max_memory_allocated) with the XLA-native equivalents."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--train_step", action="store_true",
                   help="profile fwd+bwd of the training loss instead of fwd")
    p.add_argument("--device", action="store_true",
                   help="compile on the accelerator backend (default: CPU — "
                        "this is static analysis; remote TPU compile adds "
                        "minutes of latency for no extra information)")
    p.add_argument("--trace", type=str, default=None, metavar="LOGDIR",
                   help="capture a jax.profiler timeline of the profiled "
                        "step into LOGDIR (view with xprof/tensorboard; the "
                        "reference has no timeline tracer — SURVEY.md §5). "
                        "Implies --device.")
    args = p.parse_args(argv)
    if args.trace:
        args.device = True

    import jax

    if not args.device:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..models.unet2d import UNet2D
    from ..pruning.flops import count_ops_and_params, xla_flops
    from ..schedulers.ddpm import DiffusionSchedule
    from .ddpm_prune import load_unet

    cfg, params = load_unet(args.model_path)
    model = UNet2D(cfg)
    hw = cfg.sample_size or 32
    shape = (args.batch_size, hw, hw, cfg.in_channels)

    macs, n = count_ops_and_params(model, params, shape)
    print(f"#Params: {n/1e6:.4f} M")
    print(f"#MACs (conv/linear, reference-counter semantics): {macs/1e9:.4f} G")

    x = jnp.zeros(shape)
    t = jnp.zeros((args.batch_size,), jnp.int32)
    if args.train_step:
        sched = DiffusionSchedule.create()

        def fn(p):
            def loss(p):
                out = model(p, x, t)
                return ((out - x) ** 2).sum()

            return jax.grad(loss)(p)

        flops = xla_flops(fn, params)
        label = "train fwd+bwd"
    else:
        flops = xla_flops(lambda p: model(p, x, t), params)
        label = "forward"
    print(f"XLA exact FLOPs ({label}, batch {args.batch_size}): {flops/1e9:.4f} G")

    if args.trace:
        run = jax.jit((lambda p: fn(p)) if args.train_step
                      else (lambda p: model(p, x, t)))
        run(params)  # compile outside the trace
        with jax.profiler.trace(args.trace):
            out = run(params)
            # force a host transfer: block_until_ready does not reliably
            # synchronize on this platform (CLAUDE.md), and an early return
            # here would end the trace mid-step
            float(jnp.sum(jax.tree.leaves(out)[0]))
        print(f"wrote profiler trace to {args.trace} "
              "(inspect with xprof or tensorboard --logdir)")

    # compiled memory analysis (the TPU answer to cuda.max_memory_allocated)
    compiled = jax.jit(lambda p: model(p, x, t)).lower(params).compile()
    try:
        mem = compiled.memory_analysis()
        print(f"temp allocation: {mem.temp_size_in_bytes/1e6:.1f} MB, "
              f"arguments: {mem.argument_size_in_bytes/1e6:.1f} MB, "
              f"output: {mem.output_size_in_bytes/1e6:.1f} MB")
    except Exception as e:  # some backends lack memory_analysis
        print(f"(memory analysis unavailable: {e})")


if __name__ == "__main__":
    main()
