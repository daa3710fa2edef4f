"""Native host-pipeline kernels (runtime/otgan_host.cpp): build via ctypes,
bit-exact parity with the numpy path, and DataLoader integration."""

import os

import numpy as np
import pytest

from otgan_tpu.data import native
from otgan_tpu.data.cifar10 import DataLoader


def _dataset(n=64):
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (n, 8, 6, 3)).astype(np.uint8)


def test_native_builds():
    assert native.native_available(), "g++ build of runtime kernels failed"


def test_assemble_parity_with_numpy():
    data = _dataset()
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 64, 32)
    flips = (rng.random(32) < 0.5).astype(np.uint8)

    got = native.assemble_batch_u8(data, idx, flips)

    want = data[idx].astype(np.float32) / 127.5 - 1.0
    m = flips.astype(bool)
    want[m] = want[m, :, ::-1, :]
    np.testing.assert_array_equal(got, want)  # bit-exact

    # no flips
    got2 = native.assemble_batch_u8(data, idx, None)
    np.testing.assert_array_equal(
        got2, data[idx].astype(np.float32) / 127.5 - 1.0
    )


def test_assemble_bf16_bit_identical_to_cast():
    """The native bf16 output must be bit-identical to
    astype(bfloat16) of the float32 output (RNE) — all 256 uint8 values,
    flipped and unflipped, and the numpy fallback path too."""
    import ml_dtypes

    # a dataset covering every uint8 value
    data = np.arange(256, dtype=np.uint8).reshape(1, 8, 8, 4)
    data = np.concatenate([data, data[:, :, ::-1, :]], axis=0)
    idx = np.asarray([0, 1, 0, 1])
    flips = np.asarray([0, 1, 1, 0], np.uint8)

    f32 = native.assemble_batch_u8(data, idx, flips)
    got = native.assemble_batch_u8(data, idx, flips, out_dtype="bfloat16")
    assert got.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        got.view(np.uint16), f32.astype(ml_dtypes.bfloat16).view(np.uint16)
    )

    # numpy fallback agrees with the native kernel
    x = data[idx].astype(np.float32) / 127.5 - 1.0
    m = flips.astype(bool)
    x[m] = x[m, :, ::-1, :]
    np.testing.assert_array_equal(
        got.view(np.uint16), x.astype(ml_dtypes.bfloat16).view(np.uint16)
    )


def test_stale_so_missing_symbol_triggers_rebuild(tmp_path, monkeypatch):
    """A prebuilt .so that passes the mtime check but lacks a symbol (e.g.
    copied with preserved mtimes from before the bf16 entry point) must
    force a rebuild, not silently abandon the whole native path."""
    import subprocess

    # an old-API library: only the f32 entry points
    src = tmp_path / "old.cpp"
    src.write_text(
        'extern "C" {\n'
        "void otgan_assemble_batch_u8() {}\n"
        "void otgan_nchw_to_nhwc_u8() {}\n"
        "}\n"
    )
    stale = tmp_path / "libotgan_host.so"
    subprocess.run(
        ["g++", "-shared", "-fPIC", str(src), "-o", str(stale)], check=True
    )
    future = os.path.getmtime(native._SRC) + 10
    os.utime(stale, (future, future))

    monkeypatch.setattr(native, "_SO", str(stale))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
    lib = native._load()
    assert lib is not None, "rebuild after missing symbol failed"
    assert hasattr(lib, "otgan_assemble_batch_u8_bf16")


def test_dataloader_unsupported_dtype_falls_back_to_f32():
    """compute dtypes without a native emission path (e.g. float16) fall
    back to float32 batches (the engine's boundary cast converts later)
    instead of crashing in assemble_batch_u8."""
    data = _dataset(32)
    dl = DataLoader(
        "", batch_size=8, data=data, out_dtype="float16",
        rng=np.random.default_rng(0),
    )
    assert dl.init_batch().dtype == np.float32
    assert next(iter(dl)).dtype == np.float32


def test_dataloader_bf16_out_dtype():
    import ml_dtypes

    data = _dataset(64)
    dl = DataLoader(
        "", batch_size=16, data=data, out_dtype="bfloat16",
        rng=np.random.default_rng(0),
    )
    assert dl.init_batch().dtype == ml_dtypes.bfloat16
    batch = next(iter(dl))
    assert batch.dtype == ml_dtypes.bfloat16
    assert batch.shape == (16,) + data.shape[1:]


def test_assemble_multithreaded_matches_single():
    data = _dataset(256)
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 256, 128)
    flips = (rng.random(128) < 0.5).astype(np.uint8)
    a = native.assemble_batch_u8(data, idx, flips, n_threads=1)
    b = native.assemble_batch_u8(data, idx, flips, n_threads=4)
    np.testing.assert_array_equal(a, b)


def test_nchw_to_nhwc_parity():
    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (5, 3, 8, 6)).astype(np.uint8)
    got = native.nchw_to_nhwc_u8(src)
    np.testing.assert_array_equal(got, np.transpose(src, (0, 2, 3, 1)))


def test_dataloader_uint8_path():
    data = _dataset(128)  # uint8 NHWC triggers the native path
    dl = DataLoader(
        "/nonexistent",
        batch_size=32,
        data=data,
        labels=np.zeros((128,), np.uint8),
        rng=np.random.default_rng(4),
    )
    batches = list(dl.epoch())
    assert len(batches) == 4
    for b in batches:
        assert b.dtype == np.float32
        assert b.min() >= -1.0 and b.max() <= 1.0


def test_dataloader_uint8_matches_float_path():
    data = _dataset(64)
    kw = dict(batch_size=32, labels=np.zeros((64,), np.uint8),
              shuffle=False, augment_flip=False)
    dl_u8 = DataLoader("/nonexistent", data=data, rng=np.random.default_rng(5), **kw)
    dl_f32 = DataLoader(
        "/nonexistent", data=data.astype(np.float32) / 127.5 - 1.0,
        rng=np.random.default_rng(5), **kw,
    )
    for a, b in zip(dl_u8.epoch(), dl_f32.epoch()):
        np.testing.assert_array_equal(a, b)
