"""Compile-cache key forensics (VERDICT r03 next #2 / BACKLOG #4).

The persistent XLA compilation cache reliably hits within one axon compile-
service lifetime but was observed to MISS across service restarts — three
distinct keys were recorded for a byte-identical program (round 3). The key
is a sha256 over 8 components (``jax._src.cache_key.get``):

  computation, jax_lib version, backend version (platform_version),
  XLA flags, serialized compile options, accelerator config
  (serialized PjRtTopologyDescription), compression, custom_hook.

This tool computes EVERY component hash for a canonical tiny program
WITHOUT compiling (lowering is host-side; the key is normally computed
before the cache lookup), appends the record to
``~/.cache/otgan_tpu/cache_key_components.jsonl``, and diffs against all
prior records: the component whose hash changes across sessions IS the
salt. Run it at the start of any session (``python -m
otgan_tpu.utils.cache_key_diag``) — by the time a restart has happened at
least once, the journal pinpoints the culprit.

Once identified, the fix is targeted: a volatile env_option_override can be
appended to ``cache_key.env_override_flags_to_exclude_from_cache_key``; a
salted topology serialization falls back to
:func:`neutralize_topology_hash` below.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

RECORD_PATH = os.path.expanduser(
    "~/.cache/otgan_tpu/cache_key_components.jsonl"
)


def component_hashes() -> dict:
    """Per-component sha256 hex digests of the cache key for a canonical
    scalar program on the default backend (device init only — safe to run
    even when the compile service is down)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax._src import cache_key as ck
    from jax._src import compiler
    from jax._src.lib import xla_client

    dev = jax.devices()[0]
    backend = dev.client
    lowered = jax.jit(lambda x: x * 2 + 1).lower(
        jax.ShapeDtypeStruct((), jnp.float32)
    )
    module = lowered.compiler_ir()
    opts = compiler.get_compile_options(
        num_replicas=1,
        num_partitions=1,
        device_assignment=np.array([[dev.id]]),
    )

    out = {}

    def h(fn) -> str:
        obj = hashlib.sha256()
        fn(obj)
        return obj.digest().hex()

    out["computation"] = h(
        lambda o: ck._hash_computation(o, module, ck.IgnoreCallbacks.NO)
    )
    from jax._src.lib import version_str as jaxlib_version_str

    out["jax_lib_version"] = h(
        lambda o: o.update(jaxlib_version_str.encode("utf-8"))
    )
    out["backend_version"] = h(lambda o: ck._hash_platform(o, backend))
    out["xla_flags"] = h(
        lambda o: ck._hash_xla_flags(o, ck.get_flag_prefixes())
    )
    out["compile_options"] = h(
        lambda o: ck._hash_serialized_compile_options(o, opts)
    )
    out["accelerator_config"] = h(
        lambda o: ck._hash_accelerator_config(
            o, np.asarray([dev], dtype=object)
        )
    )
    # raw observables for eyeballing (not part of the key hash chain)
    out["platform_version_raw"] = backend.platform_version
    out["env_option_overrides_raw"] = repr(
        sorted(opts.env_option_overrides)
    )
    try:
        topo = xla_client.get_topology_for_devices([dev])
        out["topology_serialized_sha"] = hashlib.sha256(
            topo.serialize()
        ).digest().hex()
    except Exception as e:  # backends without serializable topologies
        out["topology_serialized_sha"] = f"unavailable: {e!r}"
    return out


def record_and_diff(path: str = RECORD_PATH) -> dict:
    """Append today's component hashes and report which components differ
    from any previously recorded session."""
    rec = component_hashes()
    rec["_time"] = time.strftime("%Y-%m-%d %H:%M:%S")
    rec["_pid"] = os.getpid()
    prior = []
    if os.path.exists(path):
        with open(path) as f:
            prior = [json.loads(l) for l in f if l.strip()]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    diffs: dict = {}
    for old in prior:
        for k, v in rec.items():
            if k.startswith("_"):
                continue
            if k in old and old[k] != v:
                diffs.setdefault(k, set()).add(old["_time"])
    return {
        "record": rec,
        "prior_sessions": len(prior),
        "changed_components": {k: sorted(v) for k, v in diffs.items()},
    }


def main():
    out = record_and_diff()
    rec = out["record"]
    print(f"prior records: {out['prior_sessions']}")
    for k, v in rec.items():
        if not k.startswith("_"):
            print(f"  {k}: {v if len(str(v)) < 100 else str(v)[:100] + '…'}")
    if out["changed_components"]:
        print("COMPONENTS THAT CHANGED vs prior sessions (the salt!):")
        for k, times in out["changed_components"].items():
            print(f"  {k} (differed from records at {times})")
    elif out["prior_sessions"]:
        print("no component drift vs prior records")


if __name__ == "__main__":
    sys.exit(main())
