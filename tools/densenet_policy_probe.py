"""Characterize the DenseNet save-policy compile failure (VERDICT r03
weak #4 / next #5).

Round 3 recorded only "save-policy variants crash/OOM the remote compile
helper" (docs/ROUND3_NOTES.md item 3). This probe turns that into data:
for one policy it AOT-lowers and compiles the DenseNet disc/gen update
steps ONE AT A TIME on the target backend, recording per-request wall
time, success/error text, and (on success) ``memory_analysis()`` — so
the round-4 notes can say exactly WHICH request dies and whether the
footprint matches the 25.4 G per-segment-remat blowup from round 2
(docs/BACKLOG.md item 5).

Reference family: /root/reference/models/densenet.py, train.py:29,38-41.

Usage (real chip; run alone — one TPU process at a time):

    PYTHONPATH=/root/repo:/root/.axon_site \
      OTGAN_POLICY="disc_d2,disc_d3" OTGAN_PROBE_BATCH=256 \
      python -u tools/densenet_policy_probe.py

On CPU (compile-footprint hypothesis check, no chip/compile service):

    OTGAN_PROBE_CPU=1 OTGAN_POLICY=... python -u tools/densenet_policy_probe.py
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    batch = int(os.environ.get("OTGAN_PROBE_BATCH", "256"))
    # weight/optimizer shapes are batch-independent, so the (slow,
    # data-dependent) init can run at a small batch while the step is
    # lowered at the probe batch — essential for CPU-backend runs on
    # this 1-core host, where a b512 DenseNet init forward takes ~30 min
    init_batch = int(os.environ.get("OTGAN_PROBE_INIT_BATCH", str(batch)))
    policy = os.environ.get("OTGAN_POLICY", "disc_d2,disc_d3")
    if os.environ.get("OTGAN_PROBE_CPU", "0") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from otgan_tpu.config import TrainConfig
    from otgan_tpu.engine import Engine

    print(
        json.dumps(
            {
                "probe": "densenet_policy",
                "backend": jax.default_backend(),
                "batch": batch,
                "policy": policy,
            }
        ),
        flush=True,
    )
    cfg = TrainConfig(
        model="densenet", batch_size=batch, remat=True, remat_policy=policy
    )
    eng = Engine(cfg)
    x = jnp.asarray(np.zeros((batch, 32, 32, 3)), jnp.uint8)
    x_init = jnp.asarray(np.zeros((init_batch, 32, 32, 3)), jnp.uint8)
    t0 = time.time()
    state, _ = eng.init_state(0, eng.shard(x_init))
    print(
        json.dumps({"stage": "init", "sec": round(time.time() - t0, 1)}),
        flush=True,
    )
    # OTGAN_PROBE_MODE=jit routes the compile through a PLAIN first call
    # of jax.jit (device-attached compilation) instead of the explicit
    # .lower().compile() AOT path — the round-4 crash signature is the
    # chipless TpuAotCompiler helper subprocess dying, so this tests
    # whether the device-attached service path survives the same modules
    # (VERDICT r04 next #5).
    mode = os.environ.get("OTGAN_PROBE_MODE", "aot")
    for step_name, fn in (("disc", eng._disc_step), ("gen", eng._gen_step)):
        rec = {"stage": f"compile_{step_name}", "policy": policy,
               "mode": mode}
        t0 = time.time()
        if mode == "jit":
            try:
                jitted = jax.jit(fn, donate_argnums=(0,))
                out = jitted(state, eng.shard(x))  # compile + run fused
                jax.block_until_ready(out)
                rec["first_call_sec"] = round(time.time() - t0, 1)
                rec["ran"] = True
                # time a steady-state call for img/s (state was donated;
                # the new state is the call's own output)
                state, _met = out
                t0 = time.time()
                out = jitted(state, eng.shard(x))
                jax.block_until_ready(out)
                state, _met = out
                rec["steady_sec"] = round(time.time() - t0, 3)
                rec["img_per_sec"] = round(batch / rec["steady_sec"], 1)
                # re-init so the next step probes from a fresh state
                t0 = time.time()
                state, _ = eng.init_state(0, eng.shard(x_init))
                rec["reinit_sec"] = round(time.time() - t0, 1)
            except Exception as e:
                rec["ran"] = False
                rec["error"] = repr(e)[:2000]
                rec["fail_sec"] = round(time.time() - t0, 1)
            print(json.dumps(rec), flush=True)
            continue
        try:
            lowered = jax.jit(fn, donate_argnums=(0,)).lower(
                state, eng.shard(x)
            )
            rec["lower_sec"] = round(time.time() - t0, 1)
            t0 = time.time()
            compiled = lowered.compile()
            rec["compile_sec"] = round(time.time() - t0, 1)
            # on the CPU backend the compiler runs in-process, so the RSS
            # high-water mark bounds the compile-memory footprint (the
            # remote-helper-crash hypothesis: docs/BACKLOG.md item 5's
            # 25.4 G per-segment-remat blowup)
            import resource

            rec["peak_rss_gb"] = round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
            )
            try:
                stats = compiled.memory_analysis()
                rec["temp_gb"] = round(stats.temp_size_in_bytes / 1e9, 3)
                rec["argument_gb"] = round(
                    stats.argument_size_in_bytes / 1e9, 3
                )
                if hasattr(stats, "peak_memory_in_bytes"):
                    rec["peak_gb"] = round(
                        stats.peak_memory_in_bytes / 1e9, 3
                    )
            except Exception as e:  # stats API varies per backend
                rec["memory_analysis_error"] = repr(e)
            if os.environ.get("OTGAN_PROBE_RUN", "0") == "1":
                # ground truth for the stats: a program whose reported
                # peak exceeds HBM either OOMs here or proves the
                # memory_analysis numbers are allocation sums, not
                # liveness peaks
                t0 = time.time()
                try:
                    out = compiled(state, eng.shard(x))
                    jax.block_until_ready(out)
                    rec["run_sec"] = round(time.time() - t0, 1)
                    rec["ran"] = True
                    del out
                    # state was donated to the call; re-init for the next
                    t0 = time.time()
                    state, _ = eng.init_state(0, eng.shard(x))
                    rec["reinit_sec"] = round(time.time() - t0, 1)
                except Exception as e:
                    rec["ran"] = False
                    rec["run_error"] = repr(e)[:2000]
            del compiled, lowered
        except Exception as e:
            rec["error"] = repr(e)[:2000]
            rec["fail_sec"] = round(time.time() - t0, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
