"""Persistent XLA compilation cache setup.

The reference pays TF1 graph-construction cost every launch; the rebuild's
analogous fixed cost is XLA compilation — substantial when compiles run on
a remote AOT service (measured on the v5e harness: the paper-scale
5-save-remat cycle program takes ~4 min cold). ``jax``'s persistent
compilation cache works through that path (verified: 15.8 s -> 0.6 s for a
fresh process on a cache hit), so the CLI drivers enable it by default.

Caveat observed on the harness: the cache key incorporates the backend's
compile options, and the axon service appears to contribute
session-specific state to them — entries reliably hit across processes
within one service lifetime but may miss after a service restart (three
distinct keys were recorded for the byte-identical cycle_step program
across service restarts). The cache is therefore a big win for repeated
CLI invocations in a session and a best-effort one across restarts.

Library callers are NOT affected implicitly (process-global config): call
:func:`enable_compilation_cache` yourself, or construct the CLI config.
"""

from __future__ import annotations

import logging
import os

# the one definition of the default cache location (config.py's field
# default, bench.py's env fallback, and the sample/evaluate CLIs all
# reference this — a drifting copy would silently split the cache)
DEFAULT_CACHE_DIR = "~/.cache/otgan_tpu/xla"


def enable_compilation_cache(cache_dir: str) -> None:
    """Point jax's persistent compilation cache at ``cache_dir`` (expanded;
    created on demand by jax). Empty/None disables — a no-op. Must run
    before the first compilation to cover it.

    The on-disk size is bounded via jax's own LRU eviction
    (``jax_compilation_cache_max_size``): ``OTGAN_XLA_CACHE_MAX_GB``
    (default 20; <= 0 = unbounded) — paper-scale entries are tens of MB
    each and a config sweep would otherwise grow the directory without
    limit, same rationale as the AOT cache's budget (aot_cache.py)."""
    if not cache_dir:
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
    )
    try:
        # jax's LRU eviction needs the filelock package at first compile —
        # with max_size set but filelock missing it RAISES there, so only
        # opt in when the dependency is importable
        import filelock  # noqa: F401

        gb = float(os.environ.get("OTGAN_XLA_CACHE_MAX_GB", "20"))
        jax.config.update(
            "jax_compilation_cache_max_size", int(gb * 1e9) if gb > 0 else -1
        )
    except ImportError:
        pass


class CacheTelemetry(logging.Handler):
    """Per-program persistent-cache observability (round-3 triage item).

    jax reports cache traffic three ways, none surfaced by default:
    hits/misses via ``log_persistent_cache_hit/miss`` (DEBUG-level unless
    opt-in flags are set) and put-failures as a ``UserWarning`` ("Error
    writing persistent compilation cache entry…"). Installation wraps the
    two log helpers to record program names WITHOUT lowering jax's logger
    to DEBUG (that would spray unrelated compiler debug output on stderr),
    and listens on ``py.warnings`` for the put-error warning. The CLI
    drivers and ``bench.py`` use the summary to state per program whether
    the big compiles (e.g. the ~4-min paper-scale 5-save cycle program)
    were served from cache, and to flag write errors that would silently
    re-pay that compile next launch.
    """

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.hits: list[str] = []
        self.misses: list[str] = []
        self.put_errors: list[str] = []

    def emit(self, record: logging.LogRecord) -> None:  # pragma: no cover
        try:
            msg = record.getMessage()
            if "Error writing persistent compilation cache entry" in msg:
                self.put_errors.append(msg)
            else:
                # captureWarnings(True) reroutes EVERY warnings.warn in the
                # process through this logger; with a handler attached,
                # logging's lastResort fallback never fires — so anything
                # we don't record must be forwarded to stderr ourselves or
                # the process silently loses all diagnostic warnings
                import sys

                print(msg, file=sys.stderr)
        except Exception:
            pass

    def summary(self) -> dict:
        return {
            "cache_hits": sorted(set(self.hits)),
            "cache_misses": sorted(set(self.misses)),
            "cache_put_errors": len(self.put_errors),
        }


def install_cache_telemetry() -> CacheTelemetry:
    """Install a :class:`CacheTelemetry`: wraps
    ``jax._src.compiler.log_persistent_cache_hit/miss`` with recording
    pass-throughs and routes the cache-put ``UserWarning`` through logging
    (``logging.captureWarnings``) onto a ``py.warnings`` handler. CLI-process
    use only (process-global side effects). Idempotent per process is NOT
    guaranteed — call once."""
    h = CacheTelemetry()
    try:
        # underscore-internal jax helpers: a jax upgrade may move them.
        # Telemetry is observability — it must never take the trainer down,
        # so degrade to an empty summary instead of raising at startup.
        from jax._src import compiler as _compiler

        orig_hit = _compiler.log_persistent_cache_hit
        orig_miss = _compiler.log_persistent_cache_miss

        def hit(module_name, *a, **kw):
            h.hits.append(str(module_name))
            return orig_hit(module_name, *a, **kw)

        def miss(module_name, *a, **kw):
            h.misses.append(str(module_name))
            return orig_miss(module_name, *a, **kw)

        _compiler.log_persistent_cache_hit = hit
        _compiler.log_persistent_cache_miss = miss
    except Exception as e:  # pragma: no cover
        print(f"compile-cache hit/miss telemetry unavailable: {e!r}")

    logging.getLogger("py.warnings").addHandler(h)
    logging.captureWarnings(True)
    return h
