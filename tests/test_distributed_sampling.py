"""Sharded bulk sampling: the SPMD replacement for the reference's
8-process FID sampling fan-out (ddpm_sample.py:55-77).

Asserts (on the virtual 8-device CPU mesh) that a mesh-built sampler
(a) actually shards its output over every device and (b) produces exactly
the single-device result — per-device shards concatenate to the same
images, so a 50k-image FID run is invariant to the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diff_pruning_tpu.models.latent_diffusion import LatentDiffusion
from diff_pruning_tpu.models.unet2d import UNet2D, tiny_unet_config
from diff_pruning_tpu.parallel.mesh import make_mesh
from diff_pruning_tpu.sampling.ddim_sampler import SamplerConfig, make_sampler
from diff_pruning_tpu.sampling.distributed import sample_many
from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule


def _build():
    cfg = tiny_unet_config(attn=False)
    model = UNet2D(cfg)
    params = model.init(jax.random.key(0))
    return model, params, DiffusionSchedule.create()


def test_mesh_sampler_matches_single_device():
    model, params, sched = _build()
    scfg = SamplerConfig(num_inference_steps=3)
    mesh = make_mesh()  # 8-device 1-D data mesh
    ref = make_sampler(model, params, sched, scfg)(jax.random.key(7), 16, 16, 3)
    out = make_sampler(model, params, sched, scfg, mesh=mesh)(
        jax.random.key(7), 16, 16, 3)
    assert len(out.sharding.device_set) == 8, "output not sharded over the mesh"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_mesh_sampler_2d_mesh_data_axis():
    """On a (data, model) mesh the batch shards over 'data' only; output is
    still addressable from every device (replicated over 'model')."""
    model, params, sched = _build()
    scfg = SamplerConfig(num_inference_steps=2)
    mesh = make_mesh((("data", 4), ("model", 2)))
    out = make_sampler(model, params, sched, scfg, mesh=mesh)(
        jax.random.key(3), 8, 16, 3)
    assert out.shape == (8, 16, 16, 3)
    assert len(out.sharding.device_set) == 8


def test_sample_many_sharded_equals_unsharded(tmp_path):
    model, params, sched = _build()
    scfg = SamplerConfig(num_inference_steps=2)
    mesh = make_mesh()
    ref = sample_many(make_sampler(model, params, sched, scfg),
                      key=jax.random.key(1), total_images=20, batch_size=8,
                      hw=16)
    out = sample_many(make_sampler(model, params, sched, scfg, mesh=mesh),
                      key=jax.random.key(1), total_images=20, batch_size=8,
                      hw=16, mesh=mesh)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)
    assert out.shape == (20, 16, 16, 3)


def test_cfg_sampler_sharded_matches_single_device():
    """LDM class-conditional CFG sampling shards over the mesh too
    (sample_for_FID.py's per-process fan-out)."""
    from diff_pruning_tpu.models.unet_cond import tiny_cond_config

    ldm = LatentDiffusion(tiny_cond_config(), n_classes=11)
    params = ldm.init(jax.random.key(0))
    hw, ch = ldm.unet.cfg.image_size, ldm.unet.cfg.in_channels
    labels = jnp.arange(8, dtype=jnp.int32) % 10
    kw = dict(ddim_steps=2, guidance_scale=3.0, latent_hw=hw, latent_ch=ch)
    ref = ldm.make_cfg_sampler(params, **kw)(jax.random.key(5), labels, 8)
    mesh = make_mesh()
    out = ldm.make_cfg_sampler(params, mesh=mesh, **kw)(
        jax.random.key(5), labels, 8)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_tensor_parallel_sampler_matches_replicated():
    """TP sampling (beyond the reference): conv/linear out-axes sharded over
    the 'model' axis via the ChannelGraph; results must equal the
    replicated-params sampler."""
    model, params, sched = _build()
    scfg = SamplerConfig(num_inference_steps=2)
    mesh = make_mesh((("data", 2), ("model", 4)))
    ref = make_sampler(model, params, sched, scfg, mesh=mesh)(
        jax.random.key(9), 4, 16, 3)
    out = make_sampler(model, params, sched, scfg, mesh=mesh,
                       tensor_parallel=True)(jax.random.key(9), 4, 16, 3)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_params_as_args_override_single_program():
    """The training-vis contract (cli/ddpm_train.py): one sampler built with
    ``params_as_args=True`` serves evolving params via ``params_override=``
    without retracing — rebuilding a closure-constant sampler per checkpoint
    recompiled the whole 100-step program every save (~100 s each on v5e)."""
    model, params, sched = _build()
    scfg = SamplerConfig(num_inference_steps=2)
    s = make_sampler(model, params, sched, scfg, params_as_args=True)
    a = s(jax.random.key(0), 4, 16, 3)
    traced0 = s.jitted._cache_size()
    p2 = jax.tree.map(lambda x: x + 0.01, params)
    b = s(jax.random.key(0), 4, 16, 3, params_override=p2)
    c = s(jax.random.key(0), 4, 16, 3, params_override=params)
    assert bool(jnp.any(a != b)), "override params must change the output"
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert s.jitted._cache_size() == traced0 == 1, "param update retraced"
