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

import os

# the one definition of the default cache location (config.py's field
# default, bench.py's env fallback, and the sample/evaluate CLIs all
# reference this — a drifting copy would silently split the cache)
DEFAULT_CACHE_DIR = "~/.cache/otgan_tpu/xla"


def enable_compilation_cache(cache_dir: str) -> None:
    """Point jax's persistent compilation cache at ``cache_dir`` (expanded;
    created on demand by jax). Empty/None disables — a no-op. Must run
    before the first compilation to cover it."""
    if not cache_dir:
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
    )
