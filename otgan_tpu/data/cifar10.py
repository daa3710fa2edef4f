"""CIFAR-10 data pipeline (reference ``data/cifar10_data.py``).

Same on-disk layout and API surface as the reference loader — download +
extract ``cifar-10-python.tar.gz`` (``data/cifar10_data.py:12-27``), unpickle
the 5 train / 1 test batches to ``(N, 3, 32, 32)`` uint8 (``:29-38``),
``load(data_dir, subset)`` (``:40-53``) — plus the host-side prep the
reference driver does inline (``train.py:158,163-170``): NCHW->NHWC
transpose, [-1, 1] scaling, random horizontal flip.

TPU-native upgrades over the reference:

* ``DataLoader`` is a double-buffered, background-thread prefetcher: batch
  t+1 is assembled (shuffle slice + flip) on the host while batch t is on
  device — the reference rebuilds feed_dicts synchronously every step.
* flips are vectorized numpy (one fancy-index per batch), not a per-image
  Python loop (``train.py:163-170``).
* batches are yielded as a single global array ready for device sharding;
  there is no per-GPU feed_dict split (``train.py:207-211``) because SPMD
  sharding handles placement.
"""

from __future__ import annotations

import os
import pickle
import queue
import tarfile
import threading
import urllib.request
from typing import Iterator, Optional, Tuple

import numpy as np

CIFAR_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"


def maybe_download_and_extract(data_dir: str, url: str = CIFAR_URL) -> None:
    """Fetch + untar if ``cifar-10-batches-py`` is absent
    (reference ``data/cifar10_data.py:12-27``, hardened: https + member
    validation so a tampered archive cannot write outside ``data_dir``)."""
    batches_dir = os.path.join(data_dir, "cifar-10-batches-py")
    if os.path.exists(batches_dir):
        return
    os.makedirs(data_dir, exist_ok=True)
    filename = url.split("/")[-1]
    filepath = os.path.join(data_dir, filename)
    if not os.path.exists(filepath):
        print(f"downloading {url} -> {filepath}")
        urllib.request.urlretrieve(url, filepath)
    with tarfile.open(filepath, "r:gz") as tar:
        try:
            tar.extractall(data_dir, filter="data")  # Python >= 3.12
        except TypeError:
            root = os.path.realpath(data_dir)
            for member in tar.getmembers():
                target = os.path.realpath(os.path.join(data_dir, member.name))
                if not target.startswith(root + os.sep):
                    raise ValueError(
                        f"unsafe tar member path: {member.name!r}"
                    )
            tar.extractall(data_dir)


def _unpickle(path: str):
    with open(path, "rb") as fo:
        d = pickle.load(fo, encoding="latin1")
    return (
        d["data"].reshape((-1, 3, 32, 32)),
        np.asarray(d["labels"], np.uint8),
    )


def load(data_dir: str, subset: str = "train") -> Tuple[np.ndarray, np.ndarray]:
    """Return ``(x, y)`` with x uint8 ``(N, 3, 32, 32)``
    (reference ``data/cifar10_data.py:40-53``)."""
    maybe_download_and_extract(data_dir)
    bdir = os.path.join(data_dir, "cifar-10-batches-py")
    if subset == "train":
        parts = [_unpickle(os.path.join(bdir, f"data_batch_{i}")) for i in range(1, 6)]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
    if subset == "test":
        return _unpickle(os.path.join(bdir, "test_batch"))
    raise NotImplementedError("subset should be either train or test")


def to_nhwc_float(x_uint8_nchw: np.ndarray) -> np.ndarray:
    """NCHW uint8 -> NHWC float32 in [-1, 1] (``train.py:158``)."""
    x = np.transpose(x_uint8_nchw, (0, 2, 3, 1)).astype(np.float32)
    return x / 127.5 - 1.0


def random_flip(x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Vectorized 50% horizontal flip (replaces the per-image loop at
    ``train.py:163-170``)."""
    mask = rng.random(x.shape[0]) < 0.5
    out = x.copy()
    out[mask] = out[mask, :, ::-1, :]
    return out


class DataLoader:
    """In-RAM epoch iterator with shuffle + flip and background prefetch.

    API shape follows the reference ``DataLoader``
    (``data/cifar10_data.py:55-120``): constructed from ``(data_dir, subset,
    batch_size)``, iterates batches of NHWC float32 images, optional labels.
    """

    def __init__(
        self,
        data_dir: str,
        subset: str = "train",
        batch_size: int = 256,
        rng: Optional[np.random.Generator] = None,
        shuffle: bool = True,
        augment_flip: bool = True,
        return_labels: bool = False,
        prefetch: int = 2,
        data: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        native: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        out_dtype: str = "float32",
    ):
        """``process_index/process_count``: multi-host data parallelism —
        this loader keeps only rows ``process_index::process_count`` of the
        dataset (disjoint per-host shards; ``batch_size`` is then the
        PER-PROCESS batch)."""
        self._u8 = False
        if data is None:
            from otgan_tpu.data import native as native_mod

            raw, labels = load(os.path.join(data_dir, "cifar-10-python"), subset)
            if native:
                # keep the dataset uint8 NHWC (4x less RAM than the
                # reference's float copy, train.py:158); batches convert in
                # the fused native kernel at assembly time
                data = native_mod.nchw_to_nhwc_u8(raw)
                self._u8 = True
            else:
                data = to_nhwc_float(raw)
        # dataset size BEFORE process sharding: multi-host callers derive a
        # common per-epoch batch count from it (shard sizes differ by one
        # row when global_rows % process_count != 0; every process must
        # still issue the same number of collective steps)
        self.global_rows = data.shape[0]
        self.process_count = process_count
        if process_count > 1:
            data = data[process_index::process_count]
            if labels is not None:
                labels = labels[process_index::process_count]
        if data.dtype == np.uint8:
            self._u8 = True
            self.data = np.ascontiguousarray(data)
        else:
            self.data = np.ascontiguousarray(data, np.float32)
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment_flip = augment_flip
        self.return_labels = return_labels
        self.prefetch = prefetch
        self.rng = rng if rng is not None else np.random.default_rng(1)
        # batches are emitted in this dtype:
        #   "uint8"   (default ingest, --ingest_dtype): gather + flip ONLY —
        #             the [0,255] -> [-1,1] normalize is fused into the
        #             jitted step on device (engine._ingest). 3072 B/img
        #             over H2D, half of bf16, quarter of f32. Requires the
        #             dataset to be stored uint8 (falls back to f32 when a
        #             pre-normalized float dataset was passed in).
        #   "bfloat16": fused native uint8 -> bf16 conversion (RNE) at
        #             assembly time; 6144 B/img.
        #   anything else: float32 batches; the engine's boundary cast
        #             handles the conversion.
        if out_dtype in ("uint8", "u8") and not self._u8:
            out_dtype = "float32"  # float dataset cannot emit raw uint8
        elif out_dtype not in ("bfloat16", "bf16", "uint8", "u8"):
            out_dtype = "float32"
        self.out_dtype = out_dtype

    @property
    def num_batches(self) -> int:
        """Whole batches in THIS process's shard. Multi-host drivers must
        use :attr:`common_num_batches` so every process issues the same
        number of collective steps per epoch."""
        return self.data.shape[0] // self.batch_size

    @property
    def common_num_batches(self) -> int:
        """Per-epoch batch count guaranteed identical on every process:
        computed from the SMALLEST shard (floor(global/process_count)), not
        the local one — uneven shards otherwise disagree by one batch and
        the pod deadlocks mid-epoch."""
        return (self.global_rows // self.process_count) // self.batch_size

    def observation_size(self):
        return self.data.shape[1:]

    def num_labels(self) -> int:
        return int(np.max(self.labels)) + 1

    def _epoch_indices(self) -> np.ndarray:
        n = self.data.shape[0]
        return self.rng.permutation(n) if self.shuffle else np.arange(n)

    def _make_batch(self, idx: np.ndarray):
        if self._u8:
            from otgan_tpu.data import native as native_mod

            flips = (
                (self.rng.random(idx.shape[0]) < 0.5).astype(np.uint8)
                if self.augment_flip
                else None
            )
            x = native_mod.assemble_batch_u8(
                self.data, idx, flips, out_dtype=self.out_dtype
            )
        else:
            x = self.data[idx]
            if self.augment_flip:
                x = random_flip(x, self.rng)
            x = self._cast(x)
        if self.return_labels:
            return x, self.labels[idx]
        return x

    def _cast(self, x: np.ndarray) -> np.ndarray:
        if self.out_dtype in ("bfloat16", "bf16"):
            import ml_dtypes

            return x.astype(ml_dtypes.bfloat16)
        return x

    def init_batch(self, n: Optional[int] = None) -> np.ndarray:
        """First ``n`` (default ``batch_size``) examples, unshuffled and
        unaugmented — for data-dependent init; consumes no RNG and starts
        no threads. Raises when ``n`` exceeds this process's shard: a
        silent clamp would give multi-host processes DIFFERENT local init
        shapes, making the inferred global shape inconsistent (crash/hang
        in ``make_array_from_process_local_data``)."""
        n = n or self.batch_size
        if n > self.data.shape[0]:
            raise ValueError(
                f"init_batch({n}) exceeds this process's {self.data.shape[0]}"
                " data rows — lower --init_batch_size (or --batch_size), or"
                " use fewer processes"
            )
        idx = np.arange(n)
        if self._u8:
            from otgan_tpu.data import native as native_mod

            return native_mod.assemble_batch_u8(
                self.data, idx, None, out_dtype=self.out_dtype
            )
        return self._cast(self.data[idx].copy())

    def images_255(self, limit: Optional[int] = None) -> np.ndarray:
        """This process's shard as NHWC images in uint8 range [0, 255]
        (unshuffled, unaugmented) — the real side of FID statistics. In a
        pod each process sees only its own slice; precompute global
        statistics offline (``--fid_stats_path``) when that matters."""
        n = self.data.shape[0] if limit is None else min(limit, self.data.shape[0])
        if self._u8:
            return self.data[:n]
        return (np.asarray(self.data[:n], np.float32) + 1.0) * 127.5

    def epoch(self) -> Iterator[np.ndarray]:
        """One pass over the data with background batch assembly.

        Emits :attr:`common_num_batches` batches (== :attr:`num_batches`
        single-process): in a pod every process must issue the same number
        of collective steps per epoch even when shard sizes differ by one
        row (dataset size not divisible by the process count)."""
        inds = self._epoch_indices()
        nb = self.common_num_batches
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for t in range(nb):
                    q.put(
                        self._make_batch(
                            inds[t * self.batch_size : (t + 1) * self.batch_size]
                        )
                    )
                q.put(sentinel)
            except BaseException as e:  # surface in the consumer, never hang
                q.put(e)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                th.join()
                raise item
            yield item
        th.join()

    def __iter__(self):
        return self.epoch()
