"""Golden-value fixtures for the tf2015 Inception eval path (VERDICT r2
weak #6 / next-round #5): hand-computed expectations for the exact
preprocessing/variant semantics the 8.47 Inception-score comparison stands
on. A one-pixel convention error (e.g. half-pixel vs legacy resize
sampling, include- vs exclude-pad divisors) changes these values and fails
here — BEFORE conversion day.

Reference behavior: the frozen 2015 ``classify_image`` GraphDef applied via
``/root/reference/utils/inception.py:79-93`` — legacy ``ResizeBilinear``
(align_corners=False, src = out * in/out), ``(x - 128) / 128`` scaling,
exclude-pad 3x3/1 average pools, and a MAX pool in mixed_10's pool branch.
"""

import numpy as np
import jax.numpy as jnp


def _resize(x, h, w):
    from otgan_tpu.eval.inception import _resize_bilinear_tf1

    return np.asarray(_resize_bilinear_tf1(jnp.asarray(x), h, w))


def test_resize_bilinear_tf1_ramp_golden():
    """2x2 ramp x[i,j] = 2i + j upscaled to 3x3. Legacy sampling puts the
    source grid at src = out * (in/out) = [0, 2/3, 4/3]: i0 = [0, 0, 1],
    frac = [0, 2/3, 1/3] with i1 clamped to 1 — so the last sample sits ON
    the final row/col (value unblended). Separable => out = row + col with
    row = [0, 4/3, 2], col = [0, 2/3, 1]."""
    x = np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1)
    x = x[:, [0, 1]] * np.asarray([1.0])  # (1,2,2,1), values [[0,1],[2,3]]
    got = _resize(x, 3, 3)[0, :, :, 0]
    row = np.asarray([0.0, 4.0 / 3.0, 2.0])
    col = np.asarray([0.0, 2.0 / 3.0, 1.0])
    want = row[:, None] + col[None, :]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_resize_bilinear_tf1_is_not_half_pixel():
    """The half-pixel convention (src = (out + 0.5) * in/out - 0.5, what
    jax.image.resize / TF2 use) gives DIFFERENT values on the same ramp —
    the fixture must distinguish the conventions, or a silent swap to the
    modern resize would pass."""
    x = np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1)
    got = _resize(x, 3, 3)[0, :, :, 0]
    # half-pixel 1-D [0,1] -> 3: src = [-1/6, 1/2, 7/6] -> clamped
    # [0, 1/2, 1]; rows [0, 1, 2] -> out = row + col
    half = np.asarray([0.0, 1.0, 2.0])[:, None] + np.asarray(
        [0.0, 0.5, 1.0]
    )[None, :]
    assert np.max(np.abs(got - half)) > 0.1


def test_resize_bilinear_tf1_identity_and_downscale():
    """Same-size resize is exact identity (src = out * 1 lands on the
    grid); 4 -> 2 downscale samples src = [0, 2]: rows/cols 0 and 2
    verbatim, no averaging (legacy bilinear is a point-sampler when the
    scale is integral — a known quirk the frozen graph inherits)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (2, 4, 4, 3)).astype(np.float32)
    np.testing.assert_allclose(_resize(x, 4, 4), x, atol=0)
    got = _resize(x, 2, 2)
    np.testing.assert_allclose(got, x[:, ::2, ::2, :], atol=0)


def test_preprocess_tf2015_scaling_golden():
    """(x - 128) / 128: constant images stay constant through the resize,
    so the scaling is directly observable. 255 -> 127/128 (NOT 1.0 — that
    is the torchvision x/127.5 - 1 variant), 0 -> -1, 128 -> 0."""
    from otgan_tpu.eval.inception import preprocess

    for value, want_tf in [(255.0, 127.0 / 128.0), (0.0, -1.0), (128.0, 0.0)]:
        x = jnp.full((1, 32, 32, 3), value, jnp.float32)
        out = np.asarray(preprocess(x, variant="tf2015"))
        assert out.shape == (1, 299, 299, 3)
        np.testing.assert_allclose(out, want_tf, atol=1e-6)
    # the torchvision variant maps 255 -> exactly 1.0: the two scalings
    # must disagree at the white point (0.9921875 vs 1.0)
    out_tv = np.asarray(
        preprocess(jnp.full((1, 32, 32, 3), 255.0), variant="torchvision")
    )
    np.testing.assert_allclose(out_tv, 1.0, atol=1e-6)


def test_avgpool3_exclude_pad_edge_divisors_golden():
    """3x3/stride-1 SAME avg pool on a 3x3 ramp 1..9. Include-pad divides
    every window sum by 9 (torchvision count_include_pad=True); the
    tf2015 exclude-pad variant divides by the VALID window size: 4 at
    corners, 6 at edges, 9 at the center."""
    from otgan_tpu.eval.inception_net import _avgpool3

    x = jnp.arange(1.0, 10.0).reshape(1, 3, 3, 1)
    sums = np.asarray(
        [
            [1 + 2 + 4 + 5, 1 + 2 + 3 + 4 + 5 + 6, 2 + 3 + 5 + 6],
            [1 + 2 + 4 + 5 + 7 + 8, 45.0, 2 + 3 + 5 + 6 + 8 + 9],
            [4 + 5 + 7 + 8, 4 + 5 + 6 + 7 + 8 + 9, 5 + 6 + 8 + 9],
        ],
        dtype=np.float32,
    )
    counts = np.asarray(
        [[4, 6, 4], [6, 9, 6], [4, 6, 4]], dtype=np.float32
    )
    got_ex = np.asarray(_avgpool3(x, exclude_pad=True))[0, :, :, 0]
    np.testing.assert_allclose(got_ex, sums / counts, atol=1e-6)
    got_in = np.asarray(_avgpool3(x, exclude_pad=False))[0, :, :, 0]
    np.testing.assert_allclose(got_in, sums / 9.0, atol=1e-6)
    # the two variants must disagree everywhere except the center
    assert np.sum(np.abs(got_ex - got_in) > 1e-6) == 8


def test_mixed10_pool_branch_is_max_golden():
    """mixed_10's pool branch is a 3x3/stride-1 SAME MAX pool in the 2015
    graph (the only E-block topology difference vs torchvision). Golden on
    a 3x3 with a single hot corner: the max floods the 2x2 neighborhood of
    the hot pixel and nowhere else."""
    from otgan_tpu.eval.inception_net import _maxpool

    x = np.zeros((1, 3, 3, 1), np.float32)
    x[0, 0, 0, 0] = 7.0
    got = np.asarray(
        _maxpool(jnp.asarray(x), size=3, stride=1, padding="SAME")
    )[0, :, :, 0]
    want = np.asarray(
        [[7.0, 7.0, 0.0], [7.0, 7.0, 0.0], [0.0, 0.0, 0.0]], np.float32
    )
    np.testing.assert_allclose(got, want, atol=0)


def test_inception_e_pool_max_changes_output():
    """Wiring check: _inception_e(pool_max=True) must actually route the
    pool branch through the max pool — on a random input with identity-ish
    weights the avg and max variants must differ."""
    from otgan_tpu.eval import inception_net as inet

    rng = np.random.default_rng(1)
    cin = 8
    spec = inet._spec_e(cin)

    def build(s, key=""):
        if isinstance(s, tuple):
            w = rng.standard_normal(s).astype(np.float32) * 0.1
            if key == "var":  # BN variance must be non-negative
                w = np.abs(w) + 0.5
            return jnp.asarray(w)
        return {k: build(v, k) for k, v in s.items()}

    p = build(spec)
    x = jnp.asarray(rng.standard_normal((1, 5, 5, cin)).astype(np.float32))
    out_avg = np.asarray(inet._inception_e(p, x, pool_max=False))
    out_max = np.asarray(inet._inception_e(p, x, pool_max=True))
    assert out_avg.shape == out_max.shape
    assert np.max(np.abs(out_avg - out_max)) > 1e-6
