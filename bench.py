"""Benchmark: DDPM CIFAR-10 prune / finetune / sampling throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "sub": {...}}

Headline metric (same name as round 1 for comparability): images/sec for
100-step DDIM sampling of the 35.7M-param DDPM CIFAR-10 UNet (the
reference's headline workload: 50k-image FID runs, ddpm_sample.py). The
whole 100-step trajectory is one compiled lax.scan. `sub` adds the other
two BASELINE.json workloads: finetune imgs/s (bf16, bs 128, reference
hyperparams) and the full 1000-step Diff-Pruning gradient sweep wall-clock
(ddpm_prune.py:94-106 as one lax.while_loop), plus measured sampling MFU.

Timing: this platform's block_until_ready does not reliably synchronize
(CLAUDE.md); every measurement forces a host transfer of a scalar reduction
instead, which cannot complete before the computation has.

Baseline: the reference publishes NO throughput numbers (SURVEY.md §6), so
vs_baseline is computed against an analytic A100 estimate of the reference
stack: 6.1 GMACs/eval x 2 FLOP/MAC x 100 steps = 1.22 TFLOP/img; an A100
running PyTorch eager fp16 at a generous 25% MFU of 312 TFLOP/s sustains
~64 imgs/s. value/vs_baseline > 1 means we beat that estimate per chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_REF_IMGS_PER_SEC = 64.0
V5E_PEAK_BF16_FLOPS = 197e12  # TPU v5e peak dense bf16

# ONE metric string everywhere — success, watchdog, and error paths — so the
# driver can key results by name (round-3 lesson: the watchdog used a
# different string and the error record was unattributable).
HEADLINE_METRIC = "ddpm_cifar10_ddim100_sampling_imgs_per_sec_per_chip"


def _emit_error(msg: str) -> None:
    """The ONE JSON line the driver needs when anything fails. rc stays 0:
    the parseable error record IS the result (round 3's BENCH was an rc=1
    traceback because the recovery path itself crashed, bench.py:181 then)."""
    print(json.dumps({"metric": HEADLINE_METRIC, "value": 0.0,
                      "unit": "imgs/s", "vs_baseline": 0.0,
                      "error": msg}), flush=True)


# module-level so tests can substitute a fast-failing / hanging probe
_PROBE_CODE = "import jax; d = jax.devices(); print(d[0].platform)"


def _probe_backend(attempt_delays=None) -> str | None:
    """Probe the TPU backend in a BOUNDED subprocess, retrying with backoff.

    The tunnel has died mid-round twice; when dead, jax.devices() in-process
    can hang forever (a 180 s judge probe had to be killed), so the probe
    must be a subprocess with a timeout. Returns None when the backend is
    reachable, else the last error string.
    """
    import subprocess

    if attempt_delays is None:
        raw = os.environ.get("BENCH_PROBE_DELAYS", "0,60,180,300")
        attempt_delays = tuple(int(x) for x in raw.split(",") if x != "")
    timeout_s = int(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    last = ""
    for delay in attempt_delays:
        if delay:
            time.sleep(delay)
        try:
            p = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=timeout_s)
            if p.returncode == 0:
                return None
            last = (p.stderr or p.stdout).strip().splitlines()[-1][-400:]
        except subprocess.TimeoutExpired:
            last = f"probe subprocess hung >{timeout_s}s (tunnel unreachable)"
        except Exception as e:  # noqa: BLE001 — never let the probe raise
            last = f"probe failed: {type(e).__name__}: {e}"
    return last or "backend init failed"


def _sync(x):
    """Force completion by pulling a scalar to the host (CLAUDE.md: do NOT
    trust block_until_ready on this platform)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def bench_sampling(model, params, schedule):
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.sampling.ddim_sampler import SamplerConfig, make_sampler

    bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    sampler = make_sampler(model, bf16, schedule,
                           SamplerConfig(num_inference_steps=100,
                                         skip_type="quad", style="ddim_exp",
                                         dtype="bfloat16"))
    batch = 128  # best measured batch on v5e (96 imgs/s vs 77 at bs256)
    _sync(sampler(jax.random.key(0), batch, 32, 3))  # warmup / compile
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        _sync(sampler(jax.random.key(i + 1), batch, 32, 3))
    dt = (time.perf_counter() - t0) / reps
    return batch / dt


def bench_pruned_sampling(model, params, schedule):
    """Sampling throughput AFTER Diff-Pruning at ratio 0.3 — the artifact the
    whole framework exists to produce (19.95M params / 3.39G MACs)."""
    import jax

    from diff_pruning_tpu.models.unet2d import UNet2D
    from diff_pruning_tpu.pruning.importance import make_importance
    from diff_pruning_tpu.pruning.pruner import apply_pruning, prune

    res = prune(model.graph, params, make_importance("magnitude"), sparsity=0.3)
    pp = apply_pruning(params, model.graph, res)
    pm = UNet2D(model.cfg.with_channel_sizes(res.channel_sizes))
    return bench_sampling(pm, pp, schedule)


def bench_finetune(model, params, schedule):
    """Finetune step throughput at the reference recipe (bs 128, bf16 compute,
    EMA on, sum-SE loss) — scripts/finetune_ddpm_cifar10.sh."""
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.training.finetune import (TrainConfig,
                                                    init_train_state,
                                                    make_chunked_train_step)

    cfg = TrainConfig(use_ema=True, mixed_precision="bf16")
    # the chunked step donates its state; train on a copy so the caller's
    # params survive for the following benchmarks
    state = init_train_state(jax.tree.map(jnp.copy, params), cfg)
    chunk = 32  # the train CLI's default dispatch (8->2410, 32->2585 imgs/s)
    step = make_chunked_train_step(model, schedule, cfg, chunk=chunk)
    batch = jnp.zeros((chunk, 128, 32, 32, 3), jnp.float32)
    # TWO warmup calls, not one: the first output's compiler-chosen layouts
    # differ from the freshly device_put inputs, so feeding state back
    # triggers ONE layout-specialization recompile (jax 0.9 keys executables
    # by input layout; measured 232 s + 102 s, then steady 1.42 s/call =
    # 2890 imgs/s). Timing from call 2 measures the steady state every real
    # training run reaches after its first dispatch.
    for w in range(2):
        state, m = step(state, batch, jax.random.key(0))
        _sync(m["loss"])
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = step(state, batch, jax.random.key(i + 1))
        _sync(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    return chunk * 128 / dt


def bench_train256():
    """256² train-step throughput (LSUN-church 113.7M, bs 8, chunk 4, bf16,
    EMA on, remat off — the production default measured fastest in
    docs/logs/r4/train256_remat.log). Rides as a sub-metric so the 256²
    train number is tracked per round (VERDICT r4 next #3). Returns imgs/s,
    or raises — the caller records the error string instead of a number."""
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_lsun256_config
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule
    from diff_pruning_tpu.training.finetune import (TrainConfig,
                                                    init_train_state,
                                                    make_chunked_train_step)

    model = UNet2D(ddpm_lsun256_config())
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.key(0))
    params = jax.device_put(params, jax.devices()[0])
    cfg = TrainConfig(use_ema=True, mixed_precision="bf16", remat=False)
    state = init_train_state(params, cfg)
    chunk, batch = 4, 8
    step = make_chunked_train_step(model, DiffusionSchedule.create(), cfg,
                                   chunk=chunk)
    batches = jnp.zeros((chunk, batch, 256, 256, 3), jnp.float32)
    # TWO warmups: cold compile + the jax-0.9 layout-keyed recompile on the
    # first donated-state feedback (see bench_finetune)
    for w in range(2):
        state, m = step(state, batches, jax.random.key(w))
        _sync(m["loss"])
    reps = 2
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = step(state, batches, jax.random.key(i + 2))
        _sync(m["loss"])
    dt = (time.perf_counter() - t0) / reps
    return chunk * batch / dt


def bench_sweep(model, params, schedule):
    """Full 1000-step Taylor gradient sweep (thr=None: no early exit), bs 128
    like ddpm_prune.py's grad loop — the paper's pruning workload."""
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.diffpruning.sweep import accumulate_taylor_grads_scan

    x0 = jax.random.uniform(jax.random.key(1), (128, 32, 32, 3),
                            jnp.float32, -1.0, 1.0)
    noise = jax.random.normal(jax.random.key(2), x0.shape)
    # compile probe at 2 steps would recompile at 1000 (T is baked into the
    # while bound's shape-independent cond, so one timed run includes compile
    # only once) -> run once untimed, once timed
    t0 = time.perf_counter()
    res = accumulate_taylor_grads_scan(model, params, schedule, x0, noise,
                                       thr=None, max_steps=1000)
    _sync(res.losses[-1])
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = accumulate_taylor_grads_scan(model, params, schedule, x0, noise,
                                       thr=None, max_steps=1000)
    _sync(res.losses[-1])
    dt = time.perf_counter() - t0
    return dt, first - dt  # (steady wall-clock, approx compile time)


class _Watchdog:
    """The remote TPU tunnel can die silently (jax.devices() then hangs
    forever); the driver needs ONE JSON line either way. A deadman timer:
    fires only if no progress (``pet()``) happens for ``seconds``, so a
    cold-cache run whose phases each compile for many minutes is never
    killed as long as phases keep completing (per-PHASE budget, not total —
    remote compiles serialize behind other clients and can take 20+ min
    across a whole run)."""

    def __init__(self, seconds: int = 1800):
        import threading

        self.seconds = seconds
        self._last = time.monotonic()
        t = threading.Thread(target=self._loop, daemon=True)
        t.start()

    def pet(self):
        self._last = time.monotonic()

    def _loop(self):
        while True:
            time.sleep(30)
            if time.monotonic() - self._last > self.seconds:
                print(json.dumps(
                    {"metric": HEADLINE_METRIC,
                     "value": 0.0, "unit": "imgs/s", "vs_baseline": 0.0,
                     "error": f"bench wedged: no phase progress for "
                              f">{self.seconds}s — TPU tunnel unreachable "
                              "or compile hung"}), flush=True)
                os._exit(0)


def _run():
    wd = _Watchdog()
    import jax
    import jax.numpy as jnp

    from diff_pruning_tpu.models.unet2d import UNet2D, ddpm_cifar10_config
    from diff_pruning_tpu.pruning.flops import count_ops_and_params
    from diff_pruning_tpu.schedulers.ddpm import DiffusionSchedule

    cfg = ddpm_cifar10_config()
    model = UNet2D(cfg)
    # init on the host CPU backend (CLAUDE.md: never init on-chip — the
    # init program is its own cold remote compile); compute stays on TPU
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.key(0))
    params = jax.device_put(params, jax.devices()[0])
    schedule = DiffusionSchedule.create()
    macs, _ = count_ops_and_params(model, params, (1, 32, 32, 3))

    wd.pet()
    imgs_per_sec = bench_sampling(model, params, schedule)
    flops_per_img = 2.0 * macs * 100  # conv/linear MACs x 100 DDIM evals
    mfu = imgs_per_sec * flops_per_img / V5E_PEAK_BF16_FLOPS
    wd.pet()

    pruned_imgs_per_sec = bench_pruned_sampling(model, params, schedule)
    wd.pet()
    ft_imgs_per_sec = bench_finetune(model, params, schedule)
    # train step ~= 3x forward FLOPs (fwd + bwd-wrt-inputs + bwd-wrt-weights)
    ft_mfu = ft_imgs_per_sec * 2.0 * macs * 3.0 / V5E_PEAK_BF16_FLOPS
    wd.pet()
    sweep_s, sweep_compile_s = bench_sweep(model, params, schedule)
    wd.pet()
    # guarded: the 256² program is a multi-minute remote compile and the
    # compile service has 500'd on big programs before — a failure here must
    # not cost the headline metric
    try:
        train256_ips = bench_train256()
        train256_sub = {"train256_imgs_per_sec": round(train256_ips, 2)}
    except Exception as e:  # noqa: BLE001
        train256_sub = {"train256_error": f"{type(e).__name__}: {e}"[:200]}
    wd.pet()

    print(json.dumps({
        "metric": HEADLINE_METRIC,
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / A100_REF_IMGS_PER_SEC, 3),
        "sub": {
            "sampling_mfu_pct": round(100 * mfu, 1),
            "pruned30_sampling_imgs_per_sec": round(pruned_imgs_per_sec, 2),
            "pruned30_speedup": round(pruned_imgs_per_sec / imgs_per_sec, 2),
            "finetune_imgs_per_sec": round(ft_imgs_per_sec, 1),
            "finetune_mfu_pct": round(100 * ft_mfu, 1),
            "sweep_1000step_bs128_seconds": round(sweep_s, 1),
            "sweep_compile_seconds": round(sweep_compile_s, 1),
            "macs_per_eval_g": round(macs / 1e9, 2),
            **train256_sub,
        },
    }))


def main():
    """Never dies without the one JSON line: probe the backend (bounded
    subprocess, backoff retries) before importing heavy state, then run the
    bench with a catch-all that emits the error record instead of a bare
    traceback (VERDICT r3 weak #1)."""
    err = _probe_backend()
    if err is not None:
        _emit_error(f"TPU backend init failed after retries: {err}")
        return
    try:
        _run()
    except BaseException as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        _emit_error(f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
