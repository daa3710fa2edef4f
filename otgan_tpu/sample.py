"""Sampling / serving CLI: generate images from a trained checkpoint.

``python -m otgan_tpu.sample --save_dir /run --num_samples 100 --ema``
loads the latest (or named) full-state checkpoint, runs the jitted
generator on TPU, and writes a PNG grid + an .npz of raw samples. This is
the standalone equivalent of the reference driver's inline sampling blocks
(``train.py:233-243,245-258``) — the serving path, separated from training.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from otgan_tpu.config import TrainConfig
from otgan_tpu.engine import Engine
from otgan_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint
from otgan_tpu.utils.plotting import img_tile, save_tile_img


def build_run_config(args) -> TrainConfig:
    """Rebuild a run's TrainConfig from ``save_dir/config.json`` (written by
    the trainer) so model architecture — incl. densenet block settings —
    matches the checkpoint; CLI flags passed explicitly override it."""
    overrides = dict(batch_size=args.batch_size)
    for name in ("model", "nonlinearity", "layers_per_block", "filters_per_layer"):
        val = getattr(args, name, None)
        if val is not None:
            overrides[name] = val
    return TrainConfig.for_run(args.save_dir, **overrides)


def generate(
    cfg: TrainConfig,
    checkpoint: str,
    num_samples: int,
    ema: bool = False,
    seed: int = 0,
) -> np.ndarray:
    engine = Engine(cfg)
    # template for restore: init at the sampling batch size
    if cfg.model == "toy_mlp":
        from otgan_tpu.data.toy import sample_8gaussians

        x_init = sample_8gaussians(np.random.default_rng(0), cfg.batch_size)
    else:
        x_init = np.zeros((cfg.batch_size, 32, 32, 3), np.float32)
    state, _ = engine.init_state(cfg.seed, engine.shard(x_init))
    state = restore_checkpoint(checkpoint, state)

    out = []
    got = 0
    while got < num_samples:
        key = jax.random.PRNGKey(seed + len(out))
        x = np.asarray(engine.sample(state, key, cfg.batch_size, ema))
        out.append(x)
        got += x.shape[0]
    return np.concatenate(out)[:num_samples]


def main(argv=None):
    ap = argparse.ArgumentParser(description="OT-GAN sampler")
    ap.add_argument("--save_dir", required=True, help="training run directory")
    ap.add_argument("--checkpoint", default="", help="explicit checkpoint path")
    ap.add_argument("--model", default=None)
    ap.add_argument("--nonlinearity", default=None)
    ap.add_argument("--layers_per_block", type=int, default=None)
    ap.add_argument("--filters_per_layer", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--num_samples", type=int, default=100)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="", help="output prefix (default save_dir/samples)")
    args = ap.parse_args(argv)

    from otgan_tpu.utils.compile_cache import (
        DEFAULT_CACHE_DIR,
        enable_compilation_cache,
    )

    cfg = build_run_config(args)
    # honor the run's own setting (e.g. trained with the cache disabled);
    # pre-diff config.json files lack the field -> the default
    enable_compilation_cache(
        getattr(cfg, "compilation_cache_dir", DEFAULT_CACHE_DIR)
    )
    ckpt = args.checkpoint or latest_checkpoint(args.save_dir)
    if not ckpt:
        raise FileNotFoundError(f"no checkpoint found in {args.save_dir}")
    x = generate(cfg, ckpt, args.num_samples, ema=args.ema, seed=args.seed)

    prefix = args.out or os.path.join(args.save_dir, "samples")
    np.savez(prefix + ".npz", samples=x)
    if x.ndim == 4:  # images -> grid PNG
        grid = img_tile(x[:100], aspect_ratio=1.0, border_color=1.0)
        save_tile_img(grid, prefix + ".png")
        print(f"wrote {prefix}.png and {prefix}.npz ({x.shape[0]} samples)")
    else:
        print(f"wrote {prefix}.npz ({x.shape[0]} samples)")
    return x


if __name__ == "__main__":
    main()
