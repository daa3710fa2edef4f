"""8-Gaussians toy baselines: vanilla GAN, DAN-S, batch-energy DAN, MED-GAN.

The research-sandbox layer of the reference (SURVEY.md L7):
``toy_example/med_gan_toy_example1.ipynb`` compares a vanilla GAN, a
"sample classifier" discriminator over batch means (dan_s), and a
batch-statistic energy objective (dan_energy_batch) against the MED-GAN of
notebook 2 — the MED-GAN covers all 8 modes while the baselines collapse.
This script reproduces those four objectives as jitted JAX training loops.

Run:  python -m examples.toy_baselines --model med_gan --steps 6000
Outputs: sample scatter .npy snapshots + mode-coverage prints.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from otgan_tpu.data.toy import mode_coverage, sample_8gaussians
from otgan_tpu.nn.optim import adam_init, adam_update
from otgan_tpu.ops import (
    calc_distance,
    match_two_batch,
    med_discriminator_loss,
    med_generator_loss,
)
from otgan_tpu.ops.costs import scaled_sqeuclidean_cost

Z_DIM = 256


def init_mlp(key, sizes, scale):
    ps = []
    for i in range(len(sizes) - 1):
        key, k = jax.random.split(key)
        ps.append(
            {
                "w": scale(sizes[i]) * jax.random.normal(k, (sizes[i], sizes[i + 1])),
                "b": jnp.zeros((sizes[i + 1],)),
            }
        )
    return ps


def mlp(ps, x):
    for i, p in enumerate(ps):
        x = x @ p["w"] + p["b"]
        if i < len(ps) - 1:
            x = jax.nn.relu(x)
    return x


def xavier(n):  # notebook xavier_init: std = 1/sqrt(in/2)
    return jnp.sqrt(2.0 / n)


def make_losses(model: str):
    """Per-objective (gen_loss, disc_loss) closures over (gp, dp, z, x)."""
    gen = lambda gp, z: mlp(gp, z)
    feat = lambda dp, x: mlp(dp, x / 4.0)  # 16-d features (med) / logits

    if model == "med_gan":

        def g_loss(gp, dp, z, x):
            fg, fd = feat(dp, gen(gp, z)), feat(dp, x)
            m = match_two_batch(fg, fd, 50.0, 10, cost_fn=scaled_sqeuclidean_cost)
            return med_generator_loss(fg, m), calc_distance(fg, fd, m)

        def d_loss(dp, gp, z, x):
            fg, fd = feat(dp, gen(gp, z)), feat(dp, x)
            m = match_two_batch(fg, fd, 50.0, 10, cost_fn=scaled_sqeuclidean_cost)
            return med_discriminator_loss(fg, fd, m)  # maximized via -lr

        return g_loss, d_loss, True  # disc via negative lr (ascent)

    def logit(dp, x):  # scalar critic head for the GAN baselines
        return mlp(dp, x / 4.0)[:, :1]

    if model == "gan":  # vanilla non-saturating GAN (notebook 1 cell)

        def g_loss(gp, dp, z, x):
            lg = logit(dp, gen(gp, z))
            return -jnp.mean(jax.nn.log_sigmoid(lg)), jnp.mean(lg)

        def d_loss(dp, gp, z, x):
            lg, lr_ = logit(dp, gen(gp, z)), logit(dp, x)
            return -(
                jnp.mean(jax.nn.log_sigmoid(lr_))
                + jnp.mean(jnp.log1p(-jax.nn.sigmoid(lg) + 1e-8))
            )

        return g_loss, d_loss, False

    if model == "dan_s":  # batch-mean "sample classifier" discriminator

        def g_loss(gp, dp, z, x):
            lg = jnp.mean(logit(dp, gen(gp, z)))
            return -jax.nn.log_sigmoid(lg), lg

        def d_loss(dp, gp, z, x):
            lg = jnp.mean(logit(dp, gen(gp, z)))
            lr_ = jnp.mean(logit(dp, x))
            return -(
                jax.nn.log_sigmoid(lr_) + jnp.log1p(-jax.nn.sigmoid(lg) + 1e-8)
            )

        return g_loss, d_loss, False

    if model == "dan_energy":  # batch-statistic energy: -(D01+D10-D00-D11)

        def pair_energy(fa, fb):
            n = fa.shape[1]
            d = (
                0.5 * jnp.mean(jnp.square(fa), 1)[:, None]
                + 0.5 * jnp.mean(jnp.square(fb), 1)[None, :]
                - fa @ fb.T / n
            )
            return jnp.mean(d)

        def energy(dp, xg, x):
            fg, fd = feat(dp, xg), feat(dp, x)
            return (
                2 * pair_energy(fg, fd)
                - pair_energy(fg, fg)
                - pair_energy(fd, fd)
            )

        def g_loss(gp, dp, z, x):
            e = energy(dp, gen(gp, z), x)
            return e, e

        def d_loss(dp, gp, z, x):
            return energy(dp, gen(gp, z), x)  # maximized via -lr

        return g_loss, d_loss, True

    raise ValueError(f"unknown toy model {model!r}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="med_gan",
                    choices=["med_gan", "gan", "dan_s", "dan_energy"])
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--save_dir", default="/tmp/otgan_toy_baselines")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    os.makedirs(args.save_dir, exist_ok=True)
    g_loss, d_loss, ascent = make_losses(args.model)

    key = jax.random.PRNGKey(args.seed)
    gp = init_mlp(key, [Z_DIM, 128, 128, 128, 2], xavier)
    dp = init_mlp(jax.random.PRNGKey(args.seed + 1), [2, 32, 32, 32, 16], xavier)
    gs, ds = adam_init(gp), adam_init(dp)
    d_lr = -args.lr if ascent else args.lr

    @jax.jit
    def step(gp, dp, gs, ds, z1, z2, x):
        dg = jax.grad(lambda dp: d_loss(dp, gp, z1, x))(dp)
        dp, ds = adam_update(dp, dg, ds, d_lr, mom1=0.5, mom2=0.999)
        (_, aux), gg = jax.value_and_grad(
            lambda gp: g_loss(gp, dp, z2, x), has_aux=True
        )(gp)
        gp, gs = adam_update(gp, gg, gs, 5 * args.lr, mom1=0.5, mom2=0.999)
        return gp, dp, gs, ds, aux

    rng = np.random.default_rng(args.seed)
    snapshots = []
    for it in range(1, args.steps + 1):
        z1 = jax.random.normal(jax.random.PRNGKey(2 * it), (args.batch_size, Z_DIM))
        z2 = jax.random.normal(jax.random.PRNGKey(2 * it + 1), (args.batch_size, Z_DIM))
        x = jnp.asarray(sample_8gaussians(rng, args.batch_size))
        gp, dp, gs, ds, aux = step(gp, dp, gs, ds, z1, z2, x)
        if it % 500 == 0:
            z = jax.random.normal(jax.random.PRNGKey(999999 + it), (1000, Z_DIM))
            s = np.asarray(mlp(gp, z))
            np.save(os.path.join(args.save_dir, f"{args.model}_{it}.npy"), s)
            snapshots.append((it, s))
            print(
                f"[{args.model}] step {it}: modes={mode_coverage(s)}/8 "
                f"aux={float(aux):.4f}",
                flush=True,
            )
    if snapshots:
        # KDE evolution figure, the notebooks' final artifact
        # (med_gan_toy_example2.ipynb cell 2)
        from otgan_tpu.utils.plotting import kde_evolution_plot

        kde_evolution_plot(
            snapshots, os.path.join(args.save_dir, f"{args.model}_kde.png")
        )
    return gp, dp


if __name__ == "__main__":
    main()
