"""ctypes bindings for the native host-side data kernels (runtime/).

Builds ``runtime/otgan_host.cpp`` with g++ on first use (cached as
``runtime/libotgan_host.so``); every entry point has a numpy fallback so the
package works without a toolchain. See ``runtime/otgan_host.cpp`` for what
the kernels fuse and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime",
)
_SRC = os.path.join(_RUNTIME_DIR, "otgan_host.cpp")
_SO = os.path.join(_RUNTIME_DIR, "libotgan_host.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> None:
    # build to a temp name + atomic rename: a fresh inode guarantees a
    # post-rebuild dlopen maps the NEW library (an in-place overwrite of
    # an already-dlopened path can hand back the stale mapping), and
    # concurrent processes never observe a half-written .so
    tmp = _SO + f".tmp{os.getpid()}"
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", "-pthread", _SRC, "-o", tmp,
        ],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, _SO)


def _bind(lib: ctypes.CDLL) -> None:
    """Resolve + type every entry point. AttributeError here means the .so
    predates the current source (e.g. copied with a newer mtime than the
    .cpp, defeating the staleness check) — the caller rebuilds."""
    lib.otgan_assemble_batch_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int,
    ]
    lib.otgan_assemble_batch_u8_bf16.argtypes = (
        lib.otgan_assemble_batch_u8.argtypes
    )
    lib.otgan_assemble_batch_u8_raw.argtypes = (
        lib.otgan_assemble_batch_u8.argtypes
    )
    lib.otgan_nchw_to_nhwc_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p,
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_SO)
            try:
                _bind(lib)
            except AttributeError:
                # stale .so missing a symbol: force one rebuild rather
                # than abandoning the whole native path. glibc dlopen
                # reuses an already-loaded library BY PATH NAME, so load
                # the fresh build through a unique alias (the mapping
                # survives the unlink)
                import shutil

                _build()
                alias = _SO + f".reload{os.getpid()}"
                shutil.copy2(_SO, alias)
                try:
                    lib = ctypes.CDLL(alias)
                    _bind(lib)
                finally:
                    os.remove(alias)
            _lib = lib
        except Exception as e:  # toolchain missing / sandboxed: fall back
            print(f"otgan_host native build unavailable ({e}); using numpy")
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def assemble_batch_u8(
    data_u8: np.ndarray,
    indices: np.ndarray,
    flip_mask: Optional[np.ndarray],
    n_threads: int = 0,
    out_dtype: str = "float32",
) -> np.ndarray:
    """Fused gather + hflip + uint8 -> [-1, 1] conversion (NHWC).

    ``out_dtype="bfloat16"`` emits bf16 straight from the assembly pass
    (RNE, bit-identical to ``astype(bfloat16)`` of the float32 output) —
    the models compute in bf16, so this skips a whole host-side float
    pass and halves the host->device transfer.

    ``out_dtype="uint8"`` skips the conversion entirely (gather + flip
    only): the [0,255] -> [-1,1] normalize then runs ON DEVICE inside the
    jitted training step (``engine._ingest``), halving H2D bytes again
    (3072 B/img vs bf16's 6144)."""
    assert data_u8.dtype == np.uint8 and data_u8.ndim == 4
    bf16 = out_dtype in ("bfloat16", "bf16")
    raw = out_dtype in ("uint8", "u8")
    if not bf16 and not raw and np.dtype(out_dtype) != np.float32:
        raise ValueError(f"unsupported out_dtype {out_dtype!r}")
    n, h, w, c = data_u8.shape
    indices = np.ascontiguousarray(indices, np.int64)
    batch = indices.shape[0]
    lib = _load()
    if lib is not None:
        import ml_dtypes

        if raw:
            out = np.empty((batch, h, w, c), np.uint8)
            fn = lib.otgan_assemble_batch_u8_raw
        else:
            out = np.empty(
                (batch, h, w, c), ml_dtypes.bfloat16 if bf16 else np.float32
            )
            fn = (
                lib.otgan_assemble_batch_u8_bf16
                if bf16
                else lib.otgan_assemble_batch_u8
            )
        data_u8 = np.ascontiguousarray(data_u8)
        fm = (
            np.ascontiguousarray(flip_mask, np.uint8)
            if flip_mask is not None
            else None
        )
        fn(
            data_u8.ctypes.data, indices.ctypes.data,
            fm.ctypes.data if fm is not None else None,
            batch, h, w, c, out.ctypes.data, n_threads,
        )
        return out
    # numpy fallback (identical math)
    if raw:
        x = data_u8[indices].copy()
        if flip_mask is not None:
            m = flip_mask.astype(bool)
            x[m] = x[m, :, ::-1, :]
        return x
    x = data_u8[indices].astype(np.float32) / 127.5 - 1.0
    if flip_mask is not None:
        m = flip_mask.astype(bool)
        x[m] = x[m, :, ::-1, :]
    if bf16:
        import ml_dtypes

        x = x.astype(ml_dtypes.bfloat16)
    return x


def nchw_to_nhwc_u8(src: np.ndarray) -> np.ndarray:
    assert src.dtype == np.uint8 and src.ndim == 4
    n, c, h, w = src.shape
    lib = _load()
    if lib is not None:
        src = np.ascontiguousarray(src)
        out = np.empty((n, h, w, c), np.uint8)
        lib.otgan_nchw_to_nhwc_u8(
            src.ctypes.data, n, c, h, w, out.ctypes.data
        )
        return out
    return np.ascontiguousarray(np.transpose(src, (0, 2, 3, 1)))
