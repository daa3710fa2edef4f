"""Inception-score eval tests: score math (reference utils/inception.py:
46-52 semantics), network forward, converter mapping, API guards."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otgan_tpu.eval import inception as inc
from otgan_tpu.eval import inception_net
from otgan_tpu.eval.convert_torch_inception import (
    _BRANCH_MAP,
    _PART_MAP,
    convert_state_dict,
)


def test_score_math_uniform_is_one():
    preds = np.full((500, 10), 0.1)
    mean, std = inc.inception_score_from_preds(preds, splits=10)
    assert abs(mean - 1.0) < 1e-9 and std < 1e-9


def test_score_math_confident_diverse_is_nclasses():
    n, c = 1000, 10
    preds = np.full((n, c), 1e-12)
    preds[np.arange(n), np.arange(n) % c] = 1.0
    preds /= preds.sum(1, keepdims=True)
    mean, _ = inc.inception_score_from_preds(preds, splits=10)
    assert abs(mean - c) / c < 1e-3


def test_score_math_collapsed_is_one():
    """Mode collapse: every image classified identically -> score 1."""
    n, c = 300, 10
    preds = np.full((n, c), 1e-12)
    preds[:, 3] = 1.0
    preds /= preds.sum(1, keepdims=True)
    mean, _ = inc.inception_score_from_preds(preds, splits=10)
    assert abs(mean - 1.0) < 1e-3


def test_score_math_exact_zero_probs_finite():
    """f32 softmax underflows entries to exact 0 for extreme logits (seen
    at every non-EMA eval of the random-weights b8000 marathon: score=nan
    while FID from the same features was finite). Both reduction paths
    must apply the x*log(x)->0 limit and stay finite, matching the
    float64 score computed on the same distribution with the zeros
    replaced by a tiny mass (continuity check)."""
    n, c = 400, 10
    rng = np.random.default_rng(7)
    preds = rng.dirichlet(np.full(c, 0.3), size=n).astype(np.float32)
    # force exact zeros like underflowed softmax outputs
    preds[preds < 0.05] = 0.0
    preds /= preds.sum(1, keepdims=True)
    assert (preds == 0.0).any()

    mean_host, std_host = inc.inception_score_from_preds(preds, splits=10)
    assert np.isfinite(mean_host) and np.isfinite(std_host)

    # continuity: epsilon-mass version must agree closely
    eps = np.where(preds == 0.0, 1e-20, preds)
    eps /= eps.sum(1, keepdims=True)
    mean_eps, _ = inc.inception_score_from_preds(eps, splits=10)
    assert abs(mean_host - mean_eps) < 1e-4

    # device sufficient-statistics path on the same zeros
    splits = 10
    s1 = jnp.zeros((splits, c), jnp.float32)
    s2 = jnp.zeros((splits,), jnp.float32)
    upper = jnp.asarray(
        [n * (i + 1) // splits for i in range(splits)], jnp.int32
    )
    s1, s2, _ = inc._split_update(
        jnp.asarray(preds), jnp.int32(0), jnp.int32(n), jnp.int32(n),
        upper, s1, s2,
    )
    mean_dev, std_dev = inc._finalize_split_scores(s1, s2, n, splits)
    assert np.isfinite(mean_dev) and np.isfinite(std_dev)
    assert abs(mean_dev - mean_host) < 1e-4


def test_network_forward_shape():
    rng = np.random.default_rng(0)
    params = inception_net.init_params(rng, num_classes=1000)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 299, 299, 3)), jnp.float32)
    logits = inception_net.apply(params, x)
    assert logits.shape == (1, 1000)
    assert bool(jnp.isfinite(logits).all())


def test_get_inception_score_end_to_end(monkeypatch):
    """Full API with random weights and small batches."""
    monkeypatch.setattr(inc, "_BATCH", 2)
    rng = np.random.default_rng(1)
    params = inception_net.init_params(rng, num_classes=20)
    images = rng.uniform(0, 255, (4, 32, 32, 3)).astype(np.float32)
    mean, std = inc.get_inception_score(images, splits=2, params=params)
    # IS >= 1 mathematically; float accumulation can land an epsilon below
    assert np.isfinite(mean) and np.isfinite(std) and mean >= 1.0 - 1e-6


def test_get_inception_score_range_guard():
    images = np.zeros((4, 32, 32, 3), np.float32)  # [-1,1]-style input
    with pytest.raises(AssertionError):
        inc.get_inception_score(images, splits=2, params={})


def test_missing_weights_raise_with_instructions(monkeypatch, tmp_path):
    monkeypatch.setattr(inc, "_params_cache", None)
    monkeypatch.setenv("OTGAN_INCEPTION_WEIGHTS", str(tmp_path / "nope.npz"))
    with pytest.raises(FileNotFoundError) as e:
        inc.load_params()
    assert "convert_torch_inception" in str(e.value)


def _fake_torch_state_dict(spec):
    """Invert the converter mapping: our spec -> torchvision-style names."""
    inv_branch = {v: k for k, v in _BRANCH_MAP.items()}
    inv_part = {v: k for k, v in _PART_MAP.items()}
    rng = np.random.default_rng(2)
    sd = {}
    for block, sub in spec.items():
        if block == "fc":
            sd["fc.weight"] = rng.standard_normal(sub["w"][::-1]).astype(np.float32)
            sd["fc.bias"] = rng.standard_normal(sub["b"]).astype(np.float32)
            continue
        if isinstance(next(iter(sub.values())), tuple):  # plain conv block
            for part, shape in sub.items():
                tname = inv_part[part]
                arr_shape = (
                    (shape[3], shape[2], shape[0], shape[1])  # HWIO->OIHW
                    if part == "w"
                    else shape
                )
                sd[f"{block}.{tname}"] = (0.03 * rng.standard_normal(arr_shape)).astype(np.float32)
            continue
        for branch, params in sub.items():
            bname = inv_branch[branch]
            for part, shape in params.items():
                tname = inv_part[part]
                arr_shape = (
                    (shape[3], shape[2], shape[0], shape[1])
                    if part == "w"
                    else shape
                )
                sd[f"{block}.{bname}.{tname}"] = (
                    0.03 * rng.standard_normal(arr_shape)
                ).astype(np.float32)
    return sd


def test_converter_mapping_round_trip():
    spec = inception_net.param_spec(num_classes=1000)
    sd = _fake_torch_state_dict(spec)
    # noise entries the converter must skip
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((1,), np.float32)
    sd["Mixed_5b.branch1x1.bn.num_batches_tracked"] = np.zeros((), np.int64)
    flat = convert_state_dict(sd)

    def check(spec, prefix=""):
        for k, v in spec.items():
            key = f"{prefix}{k}"
            if isinstance(v, tuple):
                assert key in flat, f"missing {key}"
                assert tuple(flat[key].shape) == v, (key, flat[key].shape, v)
            else:
                check(v, prefix=f"{key}/")

    check(spec)


def test_load_params_from_converted_npz(tmp_path, monkeypatch):
    """convert -> savez -> load_params -> apply: the full weight path."""
    spec = inception_net.param_spec(num_classes=1000)
    flat = convert_state_dict(_fake_torch_state_dict(spec))
    # make BN vars positive (they are variances)
    for k in list(flat):
        if k.endswith("/var"):
            flat[k] = np.abs(flat[k]) + 0.5
    path = tmp_path / "w.npz"
    np.savez(path, **flat)
    monkeypatch.setattr(inc, "_params_cache", None)
    monkeypatch.setenv("OTGAN_INCEPTION_WEIGHTS", str(path))
    params = inc.load_params()
    x = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (1, 299, 299, 3)), jnp.float32
    )
    logits = inception_net.apply(params, x)
    assert logits.shape == (1, 1000) and bool(jnp.isfinite(logits).all())
    monkeypatch.setattr(inc, "_params_cache", None)


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------


def test_frechet_distance_identical_is_zero():
    from otgan_tpu.eval.fid import frechet_distance, feature_statistics

    rng = np.random.default_rng(5)
    f = rng.standard_normal((500, 16))
    mu, sig = feature_statistics(f)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-8


def test_frechet_distance_gaussian_analytic():
    """For isotropic Gaussians N(m1, a*I), N(m2, b*I):
    FID = ||m1-m2||^2 + d*(a + b - 2 sqrt(ab))."""
    from otgan_tpu.eval.fid import frechet_distance

    d = 8
    m1, m2 = np.zeros(d), np.full(d, 0.5)
    a, b = 2.0, 0.5
    got = frechet_distance(m1, a * np.eye(d), m2, b * np.eye(d))
    want = 0.25 * d + d * (a + b - 2 * np.sqrt(a * b))
    assert abs(got - want) < 1e-9


def test_fid_end_to_end_random_weights(monkeypatch):
    from otgan_tpu.eval import fid as fid_mod

    monkeypatch.setattr(fid_mod, "_BATCH", 2)
    rng = np.random.default_rng(6)
    params = inception_net.init_params(rng, num_classes=10)
    a = rng.uniform(0, 255, (6, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 255, (6, 16, 16, 3)).astype(np.float32)
    v_same = fid_mod.get_fid(a, a, params=params)
    v_diff = fid_mod.get_fid(a, b, params=params)
    assert abs(v_same) < 1e-4
    assert np.isfinite(v_diff) and v_diff >= 0.0


def test_fid_sampler_stats_match_host_path(monkeypatch):
    """Device-reduced feature statistics (sum f / sum f^T f on device) must
    match pool_features + feature_statistics on identical samples,
    including ragged chunk padding and the tail past num_samples."""
    from otgan_tpu.eval import fid as fid_mod

    monkeypatch.setattr(fid_mod, "_BATCH", 4)
    rng = np.random.default_rng(9)
    params = inception_net.init_params(rng, num_classes=10)
    batches = [
        jnp.asarray(rng.uniform(-1, 1, (5, 16, 16, 3)), jnp.float32)
        for _ in range(3)
    ]

    def sampler(seed):
        return batches[seed]

    mu_s, sig_s = fid_mod.feature_statistics_from_sampler(
        sampler, 13, params=params
    )

    stacked = 127.5 * (np.concatenate([np.asarray(b) for b in batches]) + 1.0)
    feats = fid_mod.pool_features(stacked[:13], params=params)
    mu_h, sig_h = fid_mod.feature_statistics(feats)
    np.testing.assert_allclose(mu_s, mu_h, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(sig_s, sig_h, rtol=1e-3, atol=1e-6)

    # FID against the host-side stats of the same samples ~ 0
    fid_self = fid_mod.fid_from_sampler(sampler, 13, mu_h, sig_h, params=params)
    assert abs(fid_self) < 1e-2


def test_combined_eval_matches_separate_paths(monkeypatch):
    """The one-pass IS+FID scorer must reproduce BOTH the device-reduce
    Inception score and the streamed FID statistics computed separately on
    identical samples (shared trunk, same masking semantics)."""
    from otgan_tpu.eval import fid as fid_mod

    monkeypatch.setattr(fid_mod, "_BATCH", 4)
    monkeypatch.setattr(inc, "_BATCH", 4)
    rng = np.random.default_rng(3)
    params = inception_net.init_params(rng, num_classes=7)
    batches = [
        jnp.asarray(rng.uniform(-1, 1, (5, 16, 16, 3)), jnp.float32)
        for _ in range(3)
    ]

    def sampler(seed):
        return batches[seed]

    (m_c, s_c), (mu_c, sig_c) = fid_mod.combined_eval_from_sampler(
        sampler, 13, splits=3, params=params
    )
    m_i, s_i = inc.inception_score_from_sampler(
        sampler, 13, splits=3, params=params, device_reduce=True
    )
    mu_f, sig_f = fid_mod.feature_statistics_from_sampler(
        sampler, 13, params=params
    )
    np.testing.assert_allclose(m_c, m_i, rtol=1e-6)
    np.testing.assert_allclose(s_c, s_i, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(mu_c, mu_f, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(sig_c, sig_f, rtol=1e-4, atol=1e-7)


def test_reference_statistics_roundtrip(tmp_path):
    """save/load of dataset FID statistics preserves values and enforces
    the weight-variant guard."""
    from otgan_tpu.eval import fid as fid_mod

    mu = np.arange(4, dtype=np.float64)
    sigma = np.eye(4) * 2.0
    p = str(tmp_path / "stats.npz")
    fid_mod.save_reference_statistics(p, mu, sigma, "tf2015", 50000)
    mu2, sig2 = fid_mod.load_reference_statistics(p, expect_variant="tf2015")
    np.testing.assert_array_equal(mu, mu2)
    np.testing.assert_array_equal(sigma, sig2)
    with pytest.raises(ValueError, match="variant"):
        fid_mod.load_reference_statistics(p, expect_variant="torchvision")


def test_fid_stats_cli(tmp_path, monkeypatch):
    """``python -m otgan_tpu.eval.fid`` precomputes dataset statistics
    from an image stack (--images) usable as --fid_stats_path: NCHW input
    is transposed, --limit honored, the variant is pinned in the output."""
    from otgan_tpu.eval import fid as fid_mod

    params = inception_net.init_params(np.random.default_rng(0), num_classes=5)
    monkeypatch.setattr(inc, "_params_cache", params)
    monkeypatch.setattr(inc, "_variant_cache", "torchvision")
    monkeypatch.setattr(fid_mod, "_BATCH", 4)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (7, 3, 16, 16), np.uint8)  # NCHW on purpose
    src = str(tmp_path / "imgs.npy")
    np.save(src, imgs)
    out = str(tmp_path / "stats.npz")
    fid_mod.main(["--images", src, "--out", out, "--limit", "6"])
    mu, sigma = fid_mod.load_reference_statistics(
        out, expect_variant="torchvision"
    )
    assert mu.shape == (2048,) and sigma.shape == (2048, 2048)
    ref = fid_mod.reference_statistics(
        np.transpose(imgs[:6], (0, 2, 3, 1)).astype(np.float32), params=params
    )
    np.testing.assert_allclose(mu, ref[0], rtol=1e-6)
    np.testing.assert_allclose(sigma, ref[1], rtol=1e-5, atol=1e-8)
    with np.load(out) as data:
        assert int(data["count"]) == 6


def test_streaming_sampler_score_matches_host_path(monkeypatch):
    """Device-streaming eval (sampler -> on-device classify) must produce
    the same score as the host-staged reference path on identical samples,
    including the [-1,1] -> [0,255] rescale and padding of ragged tails."""
    monkeypatch.setattr(inc, "_BATCH", 4)
    rng = np.random.default_rng(7)
    params = inception_net.init_params(rng, num_classes=12)
    # 3 sampler batches of 5 -> 15 generated, score over num_samples=13
    batches = [
        jnp.asarray(rng.uniform(-1, 1, (5, 16, 16, 3)), jnp.float32)
        for _ in range(3)
    ]

    def sampler(seed):
        return batches[seed]

    # default path: on-device split-statistic reduction (f32 accumulation,
    # ragged splits 4/4/5 exercising the i*n//splits edge assignment)
    mean_s, std_s = inc.inception_score_from_sampler(
        sampler, 13, splits=3, params=params
    )
    # opt-out path: host-staged probabilities, float64 reduction
    mean_f, std_f = inc.inception_score_from_sampler(
        sampler, 13, splits=3, params=params, device_reduce=False
    )

    stacked = 127.5 * (np.concatenate([np.asarray(b) for b in batches]) + 1.0)
    mean_h, std_h = inc.get_inception_score(
        stacked[:13], splits=3, params=params
    )
    np.testing.assert_allclose(mean_s, mean_h, rtol=1e-5)
    # the split scores here are ~1.0 with near-zero spread, so the f32
    # device accumulation's std is pure rounding noise at the ulp(1.0)
    # = 1.19e-7 scale; atol must sit above one ulp (the guarded x*log(x)
    # changed fusion and moved it from 3e-12 to 1.3e-7)
    np.testing.assert_allclose(std_s, std_h, rtol=1e-4, atol=5e-7)
    np.testing.assert_allclose(mean_f, mean_h, rtol=1e-6)
    np.testing.assert_allclose(std_f, std_h, rtol=1e-6, atol=1e-9)
