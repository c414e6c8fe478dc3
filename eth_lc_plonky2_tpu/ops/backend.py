"""Array-backend selection: JAX (TPU/compiled) or numpy (host).

The proving stack's per-element code is written once against this
shim.  `ELP_BACKEND=jax` (default) runs everything through
jax.numpy + jit — the TPU path.  `ELP_BACKEND=numpy` executes the
identical algorithms eagerly in numpy — the host reference path,
used by the unit-test suite (no XLA compile latency) and as the
independent cross-check implementation (the role the reference
ecosystem's native Rust plays for its [dep] kernels).

Both backends share exact u32 wrapping semantics, so results are
bit-identical; dedicated drives exercise the JAX path on real TPU.
"""

from __future__ import annotations

import os

USE_NUMPY = os.environ.get("ELP_BACKEND", "jax").lower() == "numpy"

if not USE_NUMPY:
    import jax
    import jax.numpy as xp  # noqa: F401

    # Persistent XLA compilation cache: the prover pipeline compiles a
    # few dozen kernels (20-40 s each on TPU, first time); every entry
    # point (CLI, bench, graft) shares one on-disk cache.  Opt out with
    # ELP_JAX_CACHE=0 / override the path with ELP_JAX_CACHE_DIR.
    #
    # CPU-platform runs (the test suite) deliberately DON'T use it:
    # XLA:CPU AOT cache entries embed the builder machine's CPU
    # features, and loading a mismatched entry takes ~60 s per "hit"
    # (cpu_aot_loader machine-feature errors) — far slower than the
    # cold compile it replaces.
    _plat = os.environ.get("JAX_PLATFORMS", "").lower()
    if os.environ.get("ELP_JAX_CACHE", "1") != "0" and "cpu" not in _plat:
        _cache_dir = os.environ.get("ELP_JAX_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
        try:
            jax.config.update("jax_compilation_cache_dir", _cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        except AttributeError:  # older jax without these knobs: run uncached
            import warnings

            warnings.warn("jax persistent compilation cache unavailable; continuing without it")

    def jit(fn=None, /, **kwargs):
        if fn is None:
            return lambda f: jax.jit(f, **kwargs)
        return jax.jit(fn, **kwargs)

    def scan(body, init, xs, length=None):
        return jax.lax.scan(body, init, xs, length=length)

    def associative_scan(fn, elems, axis=0):
        return jax.lax.associative_scan(fn, elems, axis=axis)

    def device_get(pytree):
        """One batched device->host transfer of a whole pytree.

        Multi-controller safe: in a multi-process job (multi-host
        mesh, parallel/distributed.py) arrays whose shards live on
        other hosts are materialized with a process allgather, so
        every host sees the full value and the host-side Fiat-Shamir
        transcript stays identical across hosts.
        """
        if jax.process_count() > 1:
            import numpy as _np
            from jax.experimental import multihost_utils

            def one(x):
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    if x.is_fully_replicated:
                        return jax.device_get(x)
                    return _np.asarray(multihost_utils.process_allgather(x, tiled=True))
                return jax.device_get(x)

            return jax.tree_util.tree_map(one, pytree)
        return jax.device_get(pytree)

else:
    import numpy as xp  # noqa: F401
    from jax import tree_util as _tree

    # u32/u64 limb arithmetic wraps by design; numpy warns on scalar wraps
    xp.seterr(over="ignore")

    def jit(fn=None, /, **kwargs):
        if fn is None:
            return lambda f: f
        return fn

    def scan(body, init, xs, length=None):
        if xs is None:
            assert length is not None
            n = length
        else:
            leaves = _tree.tree_leaves(xs)
            n = leaves[0].shape[0]
        carry = init
        ys = []
        for i in range(n):
            x = None if xs is None else _tree.tree_map(lambda a: a[i], xs)
            carry, y = body(carry, x)
            ys.append(y)
        if ys and ys[0] is not None:
            stacked = _tree.tree_map(lambda *vs: xp.stack(vs), *ys)
        else:
            stacked = None
        return carry, stacked

    def associative_scan(fn, elems, axis=0):
        if axis != 0:
            moved = _tree.tree_map(lambda a: xp.moveaxis(a, axis, 0), elems)
            out = associative_scan(fn, moved, axis=0)
            return _tree.tree_map(lambda a: xp.moveaxis(a, 0, axis), out)
        leaves = _tree.tree_leaves(elems)
        n = leaves[0].shape[0]
        acc = _tree.tree_map(lambda a: a[0], elems)
        outs = [acc]
        for i in range(1, n):
            cur = _tree.tree_map(lambda a: a[i], elems)
            acc = fn(acc, cur)
            outs.append(acc)
        return _tree.tree_map(lambda *vs: xp.stack(vs), *outs)

    def device_get(pytree):
        return _tree.tree_map(xp.asarray, pytree)
