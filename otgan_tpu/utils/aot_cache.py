"""AOT-serialized executable cache: headline compiles survive sessions.

The jax persistent compilation cache reliably hits within one axon compile-
service lifetime but misses across service restarts (a salted key
component; forensics in ``cache_key_diag.py``, journal at
``~/.cache/otgan_tpu/cache_key_components.jsonl``). The result: the
paper-scale 5-save cycle program (~4 min) and the bench tail's 46-198 s
per-config compiles recur every session — the biggest recurring
operational cost in the stack (VERDICT r03 weak #1).

This cache sidesteps the salt entirely by keying on what actually
determines the program: the sha256 of the LOWERED STABLEHLO MODULE bytes
(+ jaxlib version + backend platform/platform_version + device ids).
Lowering is host-side and cheap (seconds, no compile service involved);
byte-identical module = byte-identical program, so a hit can never serve a
stale executable. On a hit the serialized executable
(``jax.experimental.serialize_executable``, supported by the axon plugin:
``platform_version`` advertises ``SerializedExecutable v9``) is
deserialized and loaded — no XLA compile at all. On a miss,
``lowered.compile()`` runs (itself still consulting jax's persistent cache
as a second tier) and the result is serialized to disk for the next
session.

Scope: single-process only (pod topologies change execution devices);
every failure degrades to the plain jit path — the cache must never take
a trainer down.

On-disk size is bounded: serialized step executables are large (77-350 MB
each on the v5e harness), so the directory is LRU-pruned to a byte budget
(mtime order; a hit refreshes the entry's mtime) at startup and after
every write. Budget: ``OTGAN_AOT_CACHE_MAX_GB`` (default 20; <= 0 =
unbounded) or the ``max_bytes`` constructor argument.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile
from typing import Any, Optional

_SCHEMA = "otgan-aot-v1"


def _log(msg: str) -> None:
    print(f"[aot-cache] {msg}", file=sys.stderr, flush=True)


class AotCache:
    """Directory-backed cache of serialized compiled executables."""

    def __init__(self, cache_dir: str, max_bytes: Optional[int] = None):
        self.cache_dir = os.path.expanduser(cache_dir)
        os.makedirs(self.cache_dir, exist_ok=True)
        # per-process telemetry (surfaced by bench.py / the train driver)
        self.hits: list = []
        self.misses: list = []
        self.errors: list = []
        if max_bytes is None:
            gb = float(os.environ.get("OTGAN_AOT_CACHE_MAX_GB", "20"))
            max_bytes = int(gb * 1e9) if gb > 0 else 0
        self.max_bytes = max_bytes  # 0 = unbounded
        self._prune()  # bound whatever earlier sessions left behind

    # -- keying --
    def _key(self, lowered, backend) -> str:
        import jax
        from jax._src.lib import version_str as jaxlib_version_str

        h = hashlib.sha256()
        h.update(_SCHEMA.encode())
        h.update(str(lowered.compiler_ir(dialect="stablehlo")).encode())
        h.update(jaxlib_version_str.encode())
        h.update(backend.platform.encode())
        h.update(backend.platform_version.encode())
        h.update(repr([d.id for d in jax.devices()]).encode())
        return h.digest().hex()

    def _path(self, label: str, key: str) -> str:
        return os.path.join(self.cache_dir, f"{label}-{key[:32]}.jaxexec")

    def _prune(self, keep: str = "") -> None:
        """LRU-prune the directory to ``max_bytes`` (mtime order — hits
        refresh mtime, so cold entries age out first). ``keep`` is never
        evicted (the entry just written). Best-effort: concurrent
        processes may race on deletion; every error is swallowed — pruning
        must never take a trainer down."""
        if not self.max_bytes:
            return
        try:
            entries = []
            with os.scandir(self.cache_dir) as it:
                for e in it:
                    if e.name.endswith(".jaxexec") and e.is_file():
                        st = e.stat()
                        entries.append((st.st_mtime, st.st_size, e.path))
            total = sum(s for _, s, _ in entries)
            for _, size, path in sorted(entries):
                if total <= self.max_bytes:
                    break
                if path == keep:
                    continue
                try:
                    os.remove(path)
                except OSError:
                    continue  # raced with another process
                total -= size
                _log(
                    f"pruned {os.path.basename(path)} ({size / 1e6:.1f} MB; "
                    f"LRU over the {self.max_bytes / 1e9:.1f} GB budget)"
                )
        except Exception as e:  # observability only — never raise
            self.errors.append(f"prune failed: {e!r}")
            _log(self.errors[-1])

    # -- core --
    def compile(self, jitted, args: tuple, label: str):
        """``jitted.lower(*args)`` -> a loaded ``jax.stages.Compiled``,
        served from disk when the module was compiled before (any session).
        Returns ``None`` when AOT is unusable here (caller falls back to
        the plain jit path)."""
        import jax
        from jax.experimental import serialize_executable as se

        backend = jax.devices()[0].client
        try:
            lowered = jitted.lower(*args)
            key = self._key(lowered, backend)
        except Exception as e:
            self.errors.append(f"{label}: lower failed: {e!r}")
            _log(self.errors[-1])
            return None
        path = self._path(label, key)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                compiled = se.deserialize_and_load(payload, in_tree, out_tree)
                self.hits.append(label)
                try:  # refresh the LRU clock: live entries never age out
                    os.utime(path, None)
                except OSError:
                    pass
                _log(f"{label}: loaded precompiled executable ({path})")
                return compiled
            except Exception as e:
                self.errors.append(f"{label}: deserialize failed: {e!r}")
                _log(self.errors[-1] + " — recompiling")
        try:
            compiled = lowered.compile()
        except Exception as e:
            self.errors.append(f"{label}: compile failed: {e!r}")
            _log(self.errors[-1])
            raise
        self.misses.append(label)
        try:
            payload, in_tree, out_tree = se.serialize(compiled)
            tmp = tempfile.mktemp(dir=self.cache_dir)
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)  # atomic: readers never see partials
            _log(
                f"{label}: compiled + serialized "
                f"({os.path.getsize(path) / 1e6:.1f} MB -> {path})"
            )
            self._prune(keep=path)
        except Exception as e:
            # e.g. "Compilation does not support serialization" on
            # backends without the capability — compiled still works
            self.errors.append(f"{label}: serialize failed: {e!r}")
            _log(self.errors[-1])
        return compiled

    def summary(self) -> dict:
        return {
            "aot_hits": sorted(set(self.hits)),
            "aot_misses": sorted(set(self.misses)),
            "aot_errors": len(self.errors),
        }


def _signature(args: tuple) -> str:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(args)
    return repr(treedef) + repr(
        [(getattr(a, "shape", None), str(getattr(a, "dtype", type(a))))
         for a in leaves]
    )


class AotJit:
    """Drop-in wrapper over a ``jax.jit`` function that dispatches through
    an :class:`AotCache` (per argument signature). Donation and sharding
    semantics are the lowered function's own. With ``cache=None`` it is the
    plain jit function."""

    def __init__(self, jitted, cache: Optional[AotCache], label: str):
        self._jitted = jitted
        self._cache = cache
        self._label = label
        self._by_sig: dict = {}

    def __call__(self, *args) -> Any:
        if self._cache is None:
            return self._jitted(*args)
        sig = _signature(args)
        fn = self._by_sig.get(sig)
        if fn is None:
            fn = self._cache.compile(self._jitted, args, self._label)
            if fn is None:  # AOT unusable: permanent fallback for this sig
                fn = self._jitted
            self._by_sig[sig] = fn
        return fn(*args)
