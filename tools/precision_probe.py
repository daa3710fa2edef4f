"""Measure the --matching_precision speed/accuracy trade on the real chip.

Two phases (run separately so each gets a clean HBM picture):

  OTGAN_PROBE=matcher  — match_two_batch at the reference's exact headline
      shape (B=5000, d=32768; lam=500, 500 iters, Pallas tier) for each
      precision: sec/call (host readback, median of N), max-abs deltas of
      the four matched-feature outputs vs HIGHEST, and the transport
      distance delta (the number the trainer logs / the losses consume).
  OTGAN_PROBE=e2e      — full Engine fused 5:1 cycle at b5000 with the SAFE
      4-save remat policy (the 5-save peak program is known to wedge the
      execution service — .claude/skills/verify/SKILL.md), timed for
      matching_precision=highest vs high: the end-to-end img/s the knob is
      worth.

The knob exists because on TPU a float32 matmul is a multi-pass bf16 MXU
decomposition (HIGHEST = full accuracy, HIGH = 3 passes): the reference's
cuBLAS matmuls have no such trade (utils/matching.py:41-75). Results are
recorded in docs/DESIGN.md section 7.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

B = int(os.environ.get("OTGAN_PROBE_B", "5000"))
D = int(os.environ.get("OTGAN_PROBE_D", "32768"))
REPS = int(os.environ.get("OTGAN_PROBE_REPS", "3"))


def _features(seed: int) -> jax.Array:
    f = jax.random.normal(jax.random.PRNGKey(seed), (B, D), jnp.float32)
    return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


def probe_matcher():
    from otgan_tpu.ops.matching import calc_distance, match_two_batch

    on_tpu = jax.default_backend() == "tpu"
    fa, fb = _features(0), _features(1)
    out = {"phase": "matcher", "B": B, "d": D, "reps": REPS}
    base = None
    for prec in ("highest", "high", "default"):
        kw = dict(lam=500.0, n_iters=500, use_pallas=on_tpu, precision=prec)
        m = match_two_batch(fa, fb, **kw)  # compile + warm
        dist = calc_distance(fa, fb, m)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            m = match_two_batch(fa, fb, **kw)
            float(calc_distance(fa, fb, m))  # host readback fence
            times.append(time.perf_counter() - t0)
        times.sort()
        sec = times[len(times) // 2]
        out[f"{prec}_sec_per_match"] = round(sec, 4)
        out[f"{prec}_dist"] = float(dist)
        if prec == "highest":
            base = m
        else:
            out[f"{prec}_max_abs_matched_delta"] = max(
                float(jnp.max(jnp.abs(x - y)))
                for x, y in zip(base[:4], m[:4])
            )
            out[f"{prec}_dist_delta"] = abs(
                float(dist) - out["highest_dist"]
            )
            out[f"{prec}_speedup"] = round(
                out["highest_sec_per_match"] / sec, 3
            )
    print(json.dumps(out), flush=True)


def probe_e2e():
    import numpy as np

    from otgan_tpu.config import TrainConfig
    from otgan_tpu.engine import Engine

    cycles = int(os.environ.get("OTGAN_PROBE_CYCLES", "3"))
    # variants: comma-separated "precision:tol" pairs (tol 0 = exact 500
    # iters). OTGAN_PROBE_VARIANTS="highest:0,high:0,high:1e-3" measures
    # the knob-composition story in ONE process (wedge-risk hygiene).
    variants = [
        (v.split(":")[0], float(v.split(":")[1]) if ":" in v else 0.0)
        for v in os.environ.get(
            "OTGAN_PROBE_VARIANTS", "highest:0,high:0"
        ).split(",")
    ]
    out = {"phase": "e2e", "B": B, "cycles": cycles}
    for prec, tol in variants:
        cfg = TrainConfig(
            batch_size=B,
            nr_gen_per_disc=5,
            synthetic_data=True,
            remat=True,
            remat_policy="gen_g1,disc_c4,gen_g2,disc_c3",  # SAFE 4-save
            matching_precision=prec,
            sinkhorn_tol=tol,
        )
        tag = prec if tol == 0 else f"{prec}_tol{tol:g}"
        eng = Engine(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.integers(0, 256, (6, B, 32, 32, 3), dtype=np.uint8)
        )
        state, _ = eng.init_state(0, eng.shard(x[0][:128]))
        state, met = eng.cycle_step(state, x)  # compile + warm
        float(met.dist[-1])
        times = []
        for _ in range(cycles):
            t0 = time.perf_counter()
            state, met = eng.cycle_step(state, x)
            float(met.dist[-1])
            times.append(time.perf_counter() - t0)
        times.sort()
        sec = times[len(times) // 2]
        out[f"{tag}_sec_per_cycle"] = round(sec, 3)
        out[f"{tag}_img_per_sec"] = round(6 * B / sec, 1)
        out[f"{tag}_dist"] = float(met.dist[-1])
        print(json.dumps(out), flush=True)  # incremental (last-line-wins)
        del eng, state, met
        import gc

        gc.collect()
    if "highest_sec_per_cycle" in out and "high_sec_per_cycle" in out:
        out["e2e_speedup"] = round(
            out["highest_sec_per_cycle"] / out["high_sec_per_cycle"], 3
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    phase = os.environ.get("OTGAN_PROBE", "matcher")
    print(f"backend={jax.default_backend()} phase={phase}", flush=True)
    if phase == "matcher":
        probe_matcher()
    else:
        probe_e2e()
