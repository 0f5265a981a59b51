"""One JAX process of a 2-process CPU 'slice' for tests/test_multiprocess.py.

Not collected by pytest (no test_ prefix). Each worker owns 2 virtual CPU
devices; jax.distributed joins them into one 4-device slice — the CPU-mesh
analog of the reference's torchrun 8-process sampling fan-out
(scripts/sample_ddpm_cifar10_pretrained_distributed.sh:1,
ddpm_sample.py:55-77).

Usage: python tests/_mp_worker.py <process_id> <coordinator_port> <outdir>
"""

import os
import sys


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    # config.update, not the JAX_PLATFORMS env var: the axon site hook can
    # hang a fresh process on a dead TPU tunnel before the env var is
    # consulted (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from diff_pruning_tpu.parallel.mesh import init_distributed, make_mesh
    init_distributed(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2, jax.local_devices()

    from diff_pruning_tpu.models.unet2d import UNet2D, tiny_unet_config
    from diff_pruning_tpu.sampling.ddim_sampler import (SamplerConfig,
                                                        make_sampler)
    from diff_pruning_tpu.sampling.distributed import sample_many
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule

    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    # same key on every process -> identical replicated params
    params = model.init(jax.random.key(0))
    sched = DiffusionSchedule.create()
    mesh = make_mesh()  # 1-D data mesh over all 4 global devices
    sampler = make_sampler(model, params, sched,
                           SamplerConfig(num_inference_steps=3), mesh=mesh)
    sample_many(sampler, key=jax.random.key(7), total_images=16, batch_size=8,
                hw=16, channels=3, mesh=mesh, outdir=outdir)

    # one DP train step across both processes: the grad psum rides the
    # cross-process collective backend (≡ the reference's DDP all-reduce)
    import json

    import jax.numpy as jnp

    from diff_pruning_tpu.parallel.mesh import replicate, shard_batch
    from diff_pruning_tpu.training.finetune import (TrainConfig,
                                                    init_train_state,
                                                    make_train_step)

    tcfg = TrainConfig(learning_rate=1e-3, use_ema=True)
    state = replicate(mesh, init_train_state(params, tcfg))
    step_fn = make_train_step(model, sched, tcfg, mesh=mesh)
    batch = jax.random.normal(jax.random.key(3), (16, 16, 16, 3))
    state2, metrics = step_fn(state, shard_batch(mesh, batch),
                              jax.random.key(4))
    fingerprint = sum(float(jnp.sum(jnp.abs(x)))
                      for x in jax.tree.leaves(state2.params))
    print(json.dumps({"worker": pid, "loss": float(metrics["loss"]),
                      "params_l1": fingerprint}), flush=True)
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
