"""GraphDef wire-format parser + TF-2015 weight converter tests.

The real ``classify_image_graph_def.pb`` cannot be downloaded here
(zero egress), so these tests synthesize GraphDefs with the same wire
format, node naming, and tensor shapes using the module's own encoders —
exercising the full parse -> map -> npz -> load -> forward path the real
file will take (reference download: ``utils/inception.py:19,55-70``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from otgan_tpu.eval import graphdef as gd
from otgan_tpu.eval import inception_net
from otgan_tpu.eval.convert_tf2015_inception import (
    BLOCK_SCOPES,
    TF2015_NUM_CLASSES,
    convert,
    map_tf2015_weights,
)


def test_wire_roundtrip():
    rng = np.random.default_rng(0)
    consts = {
        "a/b/c": rng.standard_normal((3, 5, 2, 7)).astype(np.float32),
        "scalar": np.asarray(3.25, np.float32).reshape(()),
        "ints": np.arange(12, dtype=np.int32).reshape(3, 4),
        "vec": rng.standard_normal((129,)).astype(np.float32),
    }
    got = gd.extract_constants(gd.encode_graphdef(consts))
    assert set(got) == set(consts)
    for k in consts:
        np.testing.assert_array_equal(got[k], consts[k])
        assert got[k].dtype == consts[k].dtype


def test_float_val_fallback_and_scalar_broadcast():
    """TensorProto may carry values in repeated float_val (packed) instead
    of tensor_content; a single float_val broadcasts over the shape."""
    # packed float_val, explicit shape (2, 2)
    vals = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    shape = b"".join(
        gd._len_field(2, gd._tag(1, 0) + gd._varint(d)) for d in (2, 2)
    )
    tensor = (
        gd._tag(1, 0) + gd._varint(gd.DT_FLOAT)
        + gd._len_field(2, shape)
        + gd._len_field(5, vals.tobytes())  # packed float_val
    )
    attr_value = gd._len_field(8, tensor)
    entry = gd._len_field(1, b"value") + gd._len_field(2, attr_value)
    node = (
        gd._len_field(1, b"n") + gd._len_field(2, b"Const")
        + gd._len_field(5, entry)
    )
    got = gd.extract_constants(gd._len_field(1, node))
    np.testing.assert_array_equal(got["n"], vals.reshape(2, 2))

    # single float_val broadcast to the full shape
    tensor1 = (
        gd._tag(1, 0) + gd._varint(gd.DT_FLOAT)
        + gd._len_field(2, shape)
        + gd._len_field(5, np.asarray([7.5], np.float32).tobytes())
    )
    attr_value1 = gd._len_field(8, tensor1)
    entry1 = gd._len_field(1, b"value") + gd._len_field(2, attr_value1)
    node1 = (
        gd._len_field(1, b"m") + gd._len_field(2, b"Const")
        + gd._len_field(5, entry1)
    )
    got1 = gd.extract_constants(gd._len_field(1, node1))
    np.testing.assert_array_equal(got1["m"], np.full((2, 2), 7.5, np.float32))


def test_non_numeric_consts_skipped():
    """The real classify_image graph holds a DT_STRING Const
    (``DecodeJpeg/contents``); extraction must skip it, not abort."""
    # DT_STRING = 7; string_val is TensorProto field 8 (LEN)
    tensor = (
        gd._tag(1, 0) + gd._varint(7)
        + gd._len_field(2, b"")  # scalar shape
        + gd._len_field(8, b"\xff\xd8jpeg-bytes")
    )
    attr_value = gd._len_field(8, tensor)
    entry = gd._len_field(1, b"value") + gd._len_field(2, attr_value)
    node = (
        gd._len_field(1, b"DecodeJpeg/contents") + gd._len_field(2, b"Const")
        + gd._len_field(5, entry)
    )
    numeric = gd.encode_graphdef({"w": np.ones((3,), np.float32)})
    got = gd.extract_constants(gd._len_field(1, node) + numeric)
    assert set(got) == {"w"}
    np.testing.assert_array_equal(got["w"], np.ones((3,), np.float32))


def test_non_const_and_unknown_fields_skipped():
    consts = {"keep": np.ones((2,), np.float32)}
    pb = gd.encode_graphdef(consts)
    # a non-Const node and a GraphDef-level unknown field must be ignored
    other = gd._len_field(1, b"x") + gd._len_field(2, b"Placeholder")
    pb += gd._len_field(1, other)
    pb += gd._len_field(4, b"\x01\x02")  # GraphDef.versions (skipped)
    got = gd.extract_constants(pb)
    assert set(got) == {"keep"}


# ---------------------------------------------------------------------------
# synthetic classify_image graph -> converter -> npz -> forward
# ---------------------------------------------------------------------------


def _synth_tf2015_consts(rng):
    """Constants with the 2015 graph's names and the real shapes."""
    spec = inception_net.param_spec(num_classes=TF2015_NUM_CLASSES)
    consts = {}

    def add_unit(scope, wshape):
        cout = wshape[-1]
        consts[f"{scope}/conv2d_params"] = (
            0.05 * rng.standard_normal(wshape)
        ).astype(np.float32)
        consts[f"{scope}/batchnorm/beta"] = (
            0.01 * rng.standard_normal((cout,))
        ).astype(np.float32)
        consts[f"{scope}/batchnorm/gamma"] = np.ones((cout,), np.float32)
        consts[f"{scope}/batchnorm/moving_mean"] = np.zeros((cout,), np.float32)
        consts[f"{scope}/batchnorm/moving_variance"] = np.ones(
            (cout,), np.float32
        )

    for key, scope in BLOCK_SCOPES.items():
        if isinstance(scope, str):
            add_unit(scope, spec[key]["w"])
        else:
            prefix, table = scope
            for sub in spec[key]:
                add_unit(f"{prefix}/{table[sub]}", spec[key][sub]["w"])
    consts["softmax/weights"] = (
        0.02 * rng.standard_normal((2048, TF2015_NUM_CLASSES))
    ).astype(np.float32)
    consts["softmax/biases"] = np.zeros((TF2015_NUM_CLASSES,), np.float32)
    return consts


def test_tf2015_convert_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    consts = _synth_tf2015_consts(rng)
    pb_path = tmp_path / "classify_image_graph_def.pb"
    pb_path.write_bytes(gd.encode_graphdef(consts))

    out = tmp_path / "w.npz"
    convert(str(pb_path), str(out))

    from otgan_tpu.eval import inception as inc

    monkeypatch.setattr(inc, "_params_cache", None)
    monkeypatch.setattr(inc, "_variant_cache", "torchvision")
    monkeypatch.setenv("OTGAN_INCEPTION_WEIGHTS", str(out))
    params = inc.load_params()
    assert inc.get_variant() == "tf2015"
    # spot-check a mapped weight survives the whole path bit-exactly
    np.testing.assert_array_equal(
        np.asarray(params["Mixed_7c"]["b3x3_2b"]["w"]),
        consts["mixed_10/tower/mixed/conv_1/conv2d_params"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["Conv2d_1a_3x3"]["bias"]),
        consts["conv/batchnorm/beta"],
    )
    # forward at the tf2015 topology: finite (1, 1008) logits
    x = jnp.asarray(rng.uniform(-1, 1, (1, 299, 299, 3)), jnp.float32)
    logits = inception_net.apply(params, x, variant="tf2015")
    assert logits.shape == (1, 1008)
    assert bool(jnp.isfinite(logits).all())
    monkeypatch.setattr(inc, "_params_cache", None)
    monkeypatch.setattr(inc, "_variant_cache", "torchvision")


def test_convert_digest_pinning(tmp_path):
    rng = np.random.default_rng(2)
    consts = {"x": rng.standard_normal((2,)).astype(np.float32)}
    pb_path = tmp_path / "g.pb"
    pb_path.write_bytes(gd.encode_graphdef(consts))
    with pytest.raises(ValueError, match="digest mismatch"):
        convert(str(pb_path), str(tmp_path / "o.npz"), expect_sha256="0" * 64)


def test_converter_missing_and_wrong_shape_errors():
    rng = np.random.default_rng(3)
    consts = _synth_tf2015_consts(rng)
    broken = dict(consts)
    del broken["mixed_4/tower_1/conv_2/conv2d_params"]
    with pytest.raises(KeyError, match="mixed_4/tower_1/conv_2"):
        map_tf2015_weights(broken)

    wrong = dict(consts)
    wrong["conv/conv2d_params"] = np.zeros((3, 3, 3, 7), np.float32)
    with pytest.raises(ValueError, match="expected"):
        map_tf2015_weights(wrong)


def test_variant_changes_pooling():
    """tf2015 pooling semantics (exclude-pad divisors, Mixed_7c max pool)
    must change the trunk output for identical weights."""
    rng = np.random.default_rng(4)
    params = inception_net.init_params(rng, num_classes=10)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 299, 299, 3)), jnp.float32)
    f_tv = inception_net.pool_features(params, x)
    f_tf = inception_net.pool_features(params, x, variant="tf2015")
    assert bool(jnp.isfinite(f_tf).all())
    assert float(jnp.max(jnp.abs(f_tv - f_tf))) > 1e-6


def test_legacy_resize_matches_numpy_reference():
    from otgan_tpu.eval.inception import _resize_bilinear_tf1

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    out_h, out_w = 11, 13
    got = np.asarray(_resize_bilinear_tf1(jnp.asarray(x), out_h, out_w))

    # straight TF1 ResizeBilinear semantics: src = i * in/out, edge-clamped
    want = np.empty((2, out_h, out_w, 3), np.float32)
    for i in range(out_h):
        sy = i * x.shape[1] / out_h
        y0, fy = int(np.floor(sy)), sy - int(np.floor(sy))
        y1 = min(y0 + 1, x.shape[1] - 1)
        for j in range(out_w):
            sx = j * x.shape[2] / out_w
            x0, fx = int(np.floor(sx)), sx - int(np.floor(sx))
            x1 = min(x0 + 1, x.shape[2] - 1)
            top = x[:, y0, x0] + (x[:, y0, x1] - x[:, y0, x0]) * fx
            bot = x[:, y1, x0] + (x[:, y1, x1] - x[:, y1, x0]) * fx
            want[:, i, j] = top + (bot - top) * fy
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_conversion_day_full_pipeline_cli_to_score(tmp_path, monkeypatch):
    """Conversion-day dry run (VERDICT r2 next-round #8): the EXACT command
    sequence the real classify_image_graph_def.pb will go through, with no
    mocked stages — converter CLI (incl. sha256 pinning) -> npz ->
    load_params (env discovery, variant detection) -> get_inception_score
    on a fixed image batch through the full 1008-class tf2015 network.
    Only the weights are synthetic (zero-egress env) and the eval batch is
    shrunk — both size knobs, not semantics."""
    import hashlib

    from otgan_tpu.eval import inception as inc
    from otgan_tpu.eval.convert_tf2015_inception import main as convert_cli

    rng = np.random.default_rng(6)
    consts = _synth_tf2015_consts(rng)
    pb_path = tmp_path / "classify_image_graph_def.pb"
    raw = gd.encode_graphdef(consts)
    pb_path.write_bytes(raw)
    digest = hashlib.sha256(raw).hexdigest()

    out = tmp_path / "inception_tf2015.npz"
    convert_cli(
        [
            "--pb", str(pb_path),
            "--out", str(out),
            "--expect_sha256", digest,  # the pinning path, passing
        ]
    )
    assert out.exists()

    monkeypatch.setattr(inc, "_params_cache", None)
    monkeypatch.setattr(inc, "_variant_cache", "torchvision")
    monkeypatch.setenv("OTGAN_INCEPTION_WEIGHTS", str(out))
    monkeypatch.setattr(inc, "_BATCH", 4)

    images = np.random.default_rng(7).integers(
        0, 256, (4, 32, 32, 3)
    ).astype(np.float32)
    mean, std = inc.get_inception_score(images, splits=2)
    assert np.isfinite(mean) and np.isfinite(std)
    # IS is bounded by exp(log n_classes) = 1008 and >= 1 by Jensen
    # (float accumulation can land an epsilon below 1 on random weights)
    assert 1.0 - 1e-6 <= mean <= 1008.0
    assert inc.get_variant() == "tf2015"  # detected from the npz, not set

    monkeypatch.setattr(inc, "_params_cache", None)
    monkeypatch.setattr(inc, "_variant_cache", "torchvision")
