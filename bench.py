"""Headline benchmark: CIFAR-10 OT-GAN full MED training step throughput.

Config matches the BASELINE.json north-star: DCGAN generator + critic,
global batch 256, two-batch matching, lam=500, 500 Sinkhorn iterations,
fused Pallas Sinkhorn — the complete per-step work of the reference
``train.py`` (generator update; plus the 1-in-6 critic/ascent update folded
in at the reference's 5:1 schedule, train.py:24,213-226).

Prints ONE JSON line:
  {"metric": ..., "value": img_per_sec_per_chip, "unit": "img/s/chip",
   "vs_baseline": value / REF_IMG_PER_SEC_PER_GPU}

Baseline: the reference publishes no wall-clock numbers (BASELINE.md). We
use a documented FLOPs/bandwidth estimate of its 2018 setup — 8x V100,
global batch 5000: ~40 GFLOP/image/step (critic 2.5 GFLOP fwd x2 + gen 10
GFLOP fwd + backward 2x) at ~8 TFLOPS/GPU effective f32 plus ~0.2s/step of
unfused Sinkhorn HBM traffic => ~3.3 s/step => ~190 img/s per GPU. Images
are synthetic (CIFAR shape); data loading is not measured (the loader
prefetches on the host in both frameworks).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_IMG_PER_SEC_PER_GPU = 190.0  # documented estimate above


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from otgan_tpu.config import TrainConfig
    from otgan_tpu.engine import Engine

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    cycles = int(os.environ.get("BENCH_CYCLES", "5"))
    cfg = TrainConfig(model="dcgan", batch_size=batch)

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    eng = Engine(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(-1.0, 1.0, (batch, 32, 32, 3)).astype(np.float32)
    )

    t0 = time.time()
    state, nf = eng.init_state(1, eng.shard(x))
    log(f"init ({nf} features): {time.time() - t0:.1f}s")

    # warm / compile both steps, force full completion via host readback
    t0 = time.time()
    state, met = eng.gen_step(state, eng.shard(x))
    log(f"gen compile+run: {time.time() - t0:.1f}s dist={float(met.dist):.4f}")
    t0 = time.time()
    state, met = eng.disc_step(state, eng.shard(x))
    log(f"disc compile+run: {time.time() - t0:.1f}s dist={float(met.dist):.4f}")

    # steady state: reference schedule = 5 gen steps per disc step, fused
    # into ONE executable per cycle (engine.cycle_step)
    per_cycle = cfg.nr_gen_per_disc + 1
    # pre-place the input stack once: H2D is pipelined/overlapped in real
    # training (background prefetch); measuring it synchronously here would
    # only measure this environment's tunnel bandwidth
    xs = eng.shard_steps(
        jnp.broadcast_to(jnp.asarray(x), (per_cycle,) + x.shape)
    )
    t0 = time.time()
    state, mets = eng.cycle_step(state, xs)
    log(f"cycle compile+run: {time.time() - t0:.1f}s")
    times = []
    for c in range(cycles):
        t0 = time.time()
        state, mets = eng.cycle_step(state, xs)
        _ = float(mets.dist[-1])  # host readback: forces the whole cycle
        times.append(time.time() - t0)
        log(f"cycle {c}: {times[-1]*1000:.1f} ms for {per_cycle} steps")

    sec_per_cycle = float(np.median(times))
    n_chips = len(eng.mesh.devices.flat)
    img_per_sec = per_cycle * batch / sec_per_cycle / n_chips
    result = {
        "metric": "cifar10_otgan_full_med_step_throughput",
        "value": round(img_per_sec, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / REF_IMG_PER_SEC_PER_GPU, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
