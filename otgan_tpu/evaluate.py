"""Standalone evaluation CLI: Inception score + FID from a checkpoint.

``python -m otgan_tpu.evaluate --save_dir /run [--data_dir /data] [--ema]``
loads the latest (or named) checkpoint, generates ``--num_samples`` images
on TPU, and reports the Inception score (reference protocol: 50 000
samples, 10 splits, ``train.py:245-273``) plus — when a data dir is
given — FID against the real training set. The reference can only compute
IS inline during training; this separates evaluation from training (run it
on any saved checkpoint).
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import numpy as np

from otgan_tpu.sample import generate
from otgan_tpu.utils.checkpoint import latest_checkpoint


def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(description="OT-GAN evaluation")
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--model", default=None)
    ap.add_argument("--nonlinearity", default=None)
    ap.add_argument("--layers_per_block", type=int, default=None)
    ap.add_argument("--filters_per_layer", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--num_samples", type=int, default=50000)
    ap.add_argument("--splits", type=int, default=10)
    ap.add_argument("--ema", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data_dir", default="", help="real data for FID (optional)")
    ap.add_argument(
        "--fid_stats_path", default="",
        help="precomputed real-data statistics (.npz from "
        "`python -m otgan_tpu.eval.fid`) — FID without raw data access",
    )
    ap.add_argument("--fid_samples", type=int, default=10000)
    args = ap.parse_args(argv)

    from otgan_tpu.utils.compile_cache import (
        DEFAULT_CACHE_DIR,
        enable_compilation_cache,
    )
    from otgan_tpu.sample import build_run_config

    cfg = build_run_config(args)
    # honor the run's own setting (pre-field config.json -> the default)
    enable_compilation_cache(
        getattr(cfg, "compilation_cache_dir", DEFAULT_CACHE_DIR)
    )
    ckpt = args.checkpoint or latest_checkpoint(args.save_dir)
    if not ckpt:
        raise FileNotFoundError(f"no checkpoint found in {args.save_dir}")

    x = generate(cfg, ckpt, args.num_samples, ema=args.ema, seed=args.seed)
    x255 = 127.5 * (np.asarray(x) + 1.0)  # [0, 255] (train.py:260-261)

    from otgan_tpu.eval.inception import get_inception_score

    is_mean, is_std = get_inception_score(x255, splits=args.splits)
    result = {
        "checkpoint": ckpt,
        "ema": args.ema,
        "num_samples": int(x255.shape[0]),
        "inception_score": round(float(is_mean), 4),
        "inception_std": round(float(is_std), 4),
    }

    if args.fid_stats_path:
        from otgan_tpu.eval import fid as fid_mod
        from otgan_tpu.eval.inception import get_variant

        mu_ref, sigma_ref = fid_mod.load_reference_statistics(
            args.fid_stats_path, expect_variant=get_variant()
        )
        mu, sigma = fid_mod.feature_statistics(
            fid_mod.pool_features(x255[: args.fid_samples])
        )
        result["fid"] = round(
            float(fid_mod.frechet_distance(mu, sigma, mu_ref, sigma_ref)), 4
        )
    elif args.data_dir:
        from otgan_tpu.data.cifar10 import load
        from otgan_tpu.eval.fid import get_fid

        import os

        real, _ = load(os.path.join(args.data_dir, "cifar-10-python"), "train")
        real = np.transpose(
            real[: args.fid_samples], (0, 2, 3, 1)
        ).astype(np.float32)
        result["fid"] = round(
            float(get_fid(x255[: args.fid_samples], real)), 4
        )

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
