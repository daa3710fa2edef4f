"""Fixed-seed random classifier weights for zero-egress rehearsals.

The real eval path needs converted frozen-graph weights
(``convert_tf2015_inception.py`` — reference ``utils/inception.py:55-96``),
which cannot be downloaded in a zero-egress environment. This module
produces a DETERMINISTIC, signal-propagating random InceptionV3 weight set
so the full eval chain (sampling -> resize -> trunk -> IS/FID) can be
driven end-to-end — in marathons, tests, and dress rehearsals — with
scores that actually depend on the inputs.

Why not raw ``init_params``: its 1/sqrt(fan_in) scale washes out the
input signal over the ~47-conv trunk (ReLU halves variance per layer),
giving the degenerate IS=1.0/FID=0.0 that any broken implementation also
produces. He-scaling the conv kernels (x sqrt(2), variance-preserving
under ReLU) and amplifying the fc head (x20) makes predictions
input-dependent and diverse. ``tests/test_eval_golden_pins.py`` pins the
resulting scores; this module is the single source of that recipe.

CLI::

    python -m otgan_tpu.eval.random_weights --out /tmp/rw.npz \
        [--seed 2024] [--variant tf2015]

The npz is byte-compatible with ``inception.load_params`` (flat
``a/b/c`` keys + ``__variant__`` marker, the converters' wire format).
"""

from __future__ import annotations

import argparse

import numpy as np

from otgan_tpu.eval import inception_net

# BN statistics / biases stay at their init values; everything else scales
_PASSTHROUGH_KEYS = ("mean", "bias", "b", "var", "scale")


def scaled_params(seed: int = 2024, num_classes: int = 1008):
    """He-scaled fixed-seed random parameter tree (see module docstring)."""

    def rec(tree, in_fc):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = rec(v, in_fc or k == "fc")
            elif k in _PASSTHROUGH_KEYS:
                out[k] = v
            else:
                out[k] = v * np.float32(
                    20.0 if (in_fc or k == "fc") else np.sqrt(2.0)
                )
        return out

    rng = np.random.default_rng(seed)
    return rec(inception_net.init_params(rng, num_classes=num_classes), False)


def _flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix=f"{key}/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def save_npz(path: str, seed: int = 2024, variant: str = "tf2015",
             num_classes: int = 1008) -> str:
    """Write the weight set in the converters' npz wire format."""
    flat = _flatten(scaled_params(seed=seed, num_classes=num_classes))
    flat["__variant__"] = np.frombuffer(
        variant.encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **flat)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--variant", default="tf2015",
                    choices=["tf2015", "torchvision"])
    ap.add_argument("--num_classes", type=int, default=1008)
    ns = ap.parse_args(argv)
    path = save_npz(ns.out, seed=ns.seed, variant=ns.variant,
                    num_classes=ns.num_classes)
    print(f"wrote fixed-seed random weights (seed={ns.seed}, "
          f"variant={ns.variant}) -> {path}")


if __name__ == "__main__":
    main()
