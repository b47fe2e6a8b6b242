"""Persistent XLA compilation cache setup.

The block-fused Pallas kernels (ops/fused_block.py) cost minutes of Mosaic
compile time on first use; the jax persistent cache makes every later
process start near-instant (verified through the axon remote-compile
tunnel: 0.3s cached vs full recompile). Call once, before the first jit
execution. Safe to call on CPU (cache just holds CPU executables too).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/esvit_jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable jax's persistent compilation cache (idempotent).

    cache_dir defaults to $ESVIT_COMPILE_CACHE or ~/.cache/esvit_jax_cache;
    set ESVIT_COMPILE_CACHE=off to disable.
    """
    env = os.environ.get("ESVIT_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return
    path = cache_dir or env or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Only persist expensive compiles (the Pallas kernels take >> 5s; tiny
    # jits would bloat the cache for no win).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def cached_compile(jitted, *args, name: str = "fn", cache_dir: str | None = None):
    """lower+compile with an explicit on-disk executable cache.

    jax's persistent compilation cache misses across processes for this
    program (the runtime-built compile options hash differently per
    process even though the lowered module bytecode is bit-identical —
    measured round 2), so this keys the cache on a sha256 of the module
    bytecode itself and round-trips the compiled executable via
    jax.experimental.serialize_executable (verified working through the
    axon remote-compile tunnel). Falls back to a plain compile on any
    cache failure. Set ESVIT_COMPILE_CACHE=off to disable.
    """
    import hashlib
    import pickle

    from jax._src.interpreters import mlir

    env = os.environ.get("ESVIT_COMPILE_CACHE", "")
    lowered = jitted.lower(*args)
    if env.lower() in ("off", "0", "none"):
        return lowered.compile()
    path_dir = cache_dir or (env or _DEFAULT_DIR)
    os.makedirs(path_dir, exist_ok=True)
    # Key on the lowered module AND the toolchain/device identity: a cached
    # executable from another jaxlib/backend/device kind can deserialize
    # fine yet fail (or misbehave) at dispatch time.
    dev = jax.devices()[0]
    fingerprint = "|".join([
        jax.__version__,
        getattr(jax, "lib", jax).__version__ if hasattr(jax, "lib") else "",
        dev.platform,
        getattr(dev, "device_kind", ""),
    ])
    key = hashlib.sha256(
        mlir.module_to_bytecode(lowered.compiler_ir())
        + fingerprint.encode()).hexdigest()[:32]
    path = os.path.join(path_dir, f"{name}-{key}.jaxexe")
    if os.path.exists(path):
        try:
            from jax.experimental.serialize_executable import \
                deserialize_and_load

            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            exe = deserialize_and_load(payload, in_tree, out_tree)
            # Guard the first dispatch: a stale executable that slipped the
            # key can still die at call time; eat one step and recompile.
            jax.block_until_ready(exe(*args))
            return exe
        except Exception:
            pass                                  # corrupt/stale: recompile
    compiled = lowered.compile()
    try:
        from jax.experimental.serialize_executable import serialize

        blob = pickle.dumps(serialize(compiled))
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except Exception:
        pass                                      # cache write is best-effort
    return compiled
