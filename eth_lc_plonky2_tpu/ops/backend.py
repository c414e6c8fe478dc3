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

    # ------------------------------------------------------------------
    # Compiled-executable cache (TPU): jax's persistent compilation cache
    # does not hit across processes on this backend (per-process compile
    # options enter the key), so every fresh process re-pays the remote
    # AOT compile of each prover kernel — ~25 min for the full circuit.
    # Instead we serialize the compiled PJRT executable itself
    # (jax.experimental.serialize_executable) keyed by a SHA-256 of the
    # lowered StableHLO module: a fresh process traces + lowers (seconds)
    # and then LOADS the executable (~0.2 s) instead of recompiling.
    # Any source change changes the lowered module, so the key
    # self-invalidates.  The cache is a session-local build artifact
    # (.cache/xc, gitignored) — never a committed or operator-supplied
    # file.  Disable with ELP_XC=0; relocate with ELP_XC_DIR.
    # ------------------------------------------------------------------
    import hashlib as _hashlib
    import inspect as _inspect
    import pickle as _pickle

    _XC = {"enabled": None, "dir": None}
    _XC_LOG = os.environ.get("ELP_XC_LOG", "0") == "1"

    def _xc_enabled():
        if _XC["enabled"] is None:
            if os.environ.get("ELP_XC", "1") == "0":
                _XC["enabled"] = False
            else:
                try:
                    _XC["enabled"] = (
                        jax.default_backend() == "tpu" and jax.process_count() == 1
                    )
                except Exception:
                    _XC["enabled"] = False
            if _XC["enabled"]:
                d = os.environ.get("ELP_XC_DIR") or os.path.join(
                    os.path.dirname(
                        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                    ),
                    ".cache",
                    "xc",
                )
                try:
                    os.makedirs(d, exist_ok=True)
                    _XC["dir"] = d
                except OSError:
                    _XC["enabled"] = False
        return _XC["enabled"]

    def _xc_log(msg):
        if _XC_LOG:
            import sys as _sys

            print(f"[xc] {msg}", file=_sys.stderr, flush=True)

    try:
        _Tracer = jax.core.Tracer
    except AttributeError:  # pragma: no cover - jax internals moved
        from jax._src.core import Tracer as _Tracer

    class _TracerArg(Exception):
        """Raised while keying a call whose arguments contain tracers
        (i.e. this jitted helper is being inlined into an outer trace);
        such calls must go through plain jit dispatch."""

    def _leaf_sig(x):
        if isinstance(x, _Tracer):
            raise _TracerArg
        shape = getattr(x, "shape", None)
        dt = getattr(x, "dtype", None)
        if shape is not None and dt is not None:
            return ("a", tuple(shape), str(dt), bool(getattr(x, "weak_type", False)))
        return ("p", type(x).__name__)

    class _XJit:
        """jax.jit plus the cross-process executable cache above.

        Call-compatible with the jitted function; unknown attributes
        (``lower``, ``trace``, …) delegate to the underlying jax.jit
        object.  Falls back to plain jit dispatch whenever anything in
        the cache path cannot be handled (VAR_POSITIONAL signatures,
        serialization failures, non-TPU platforms, multi-process runs).
        """

        def __init__(self, fn, jit_kwargs):
            self._fn = fn
            self._jit_kwargs = jit_kwargs
            self._jitted = jax.jit(fn, **jit_kwargs)
            st = jit_kwargs.get("static_argnames", ()) or ()
            self._statics = frozenset((st,) if isinstance(st, str) else st)
            self._params = None  # lazy ([param names], simple_signature)
            self._compiled = {}  # call key -> Compiled | False (= fall back)
            self.__name__ = getattr(fn, "__name__", "jitted")
            self.__doc__ = getattr(fn, "__doc__", None)

        def __getattr__(self, name):
            return getattr(self._jitted, name)

        def _param_names(self):
            if self._params is None:
                try:
                    ps = _inspect.signature(self._fn).parameters
                    names, simple = [], True
                    for p in ps.values():
                        if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
                            simple = False
                        names.append(p.name)
                    self._params = (names, simple)
                except (ValueError, TypeError):
                    self._params = ([], False)
            return self._params

        def _call_key(self, args, kw, names):
            items = []
            for i, a in enumerate(args):
                n = names[i]
                if n in self._statics:
                    items.append((n, "S", repr(a)))
                else:
                    flat, tree = jax.tree_util.tree_flatten(a)
                    items.append((n, tree, tuple(_leaf_sig(x) for x in flat)))
            for n in sorted(kw):
                a = kw[n]
                if n in self._statics:
                    items.append((n, "S", repr(a)))
                else:
                    flat, tree = jax.tree_util.tree_flatten(a)
                    items.append((n, tree, tuple(_leaf_sig(x) for x in flat)))
            return tuple(items)

        def _build(self, args, kw):
            try:
                lowered = self._jitted.lower(*args, **kw)
                h = _hashlib.sha256()
                h.update(jax.__version__.encode())
                h.update(jax.default_backend().encode())
                h.update(lowered.as_text().encode())
                path = os.path.join(_XC["dir"], h.hexdigest() + ".xc")
                from jax.experimental import serialize_executable as _se

                if os.path.exists(path):
                    try:
                        with open(path, "rb") as f:
                            blob = _pickle.load(f)
                        comp = _se.deserialize_and_load(*blob)
                        _xc_log(f"hit  {self.__name__} {os.path.basename(path)}")
                        return comp
                    except Exception as e:  # corrupt/incompatible: recompile
                        _xc_log(f"load-fail {self.__name__}: {e!r}")
                comp = lowered.compile()
                try:
                    blob = _se.serialize(comp)
                    tmp = f"{path}.tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        _pickle.dump(blob, f)
                    os.replace(tmp, path)
                    _xc_log(f"miss {self.__name__} -> {os.path.basename(path)}")
                except Exception as e:  # unserializable: use in-memory only
                    _xc_log(f"serialize-fail {self.__name__}: {e!r}")
                return comp
            except Exception as e:
                _xc_log(f"fallback {self.__name__}: {e!r}")
                return False

        def __call__(self, *args, **kw):
            if not _xc_enabled():
                return self._jitted(*args, **kw)
            names, simple = self._param_names()
            if not simple or len(args) > len(names):
                return self._jitted(*args, **kw)
            try:
                key = self._call_key(args, kw, names)
            except _TracerArg:
                # inlined into an outer trace: never key/poison the cache
                return self._jitted(*args, **kw)
            except Exception:
                return self._jitted(*args, **kw)
            comp = self._compiled.get(key)
            if comp is None:
                comp = self._build(args, kw)
                self._compiled[key] = comp
            if comp is False:
                return self._jitted(*args, **kw)
            pos = [a for i, a in enumerate(args) if names[i] not in self._statics]
            kws = {k: v for k, v in kw.items() if k not in self._statics}
            try:
                return comp(*pos, **kws)
            except TypeError as e:
                # pytree/aval mismatch between this call and the lowered
                # signature: permanently fall back for this key
                _xc_log(f"call-fallback {self.__name__}: {e!r}")
                self._compiled[key] = False
                return self._jitted(*args, **kw)

    def jit(fn=None, /, **kwargs):
        if fn is None:
            return lambda f: _XJit(f, kwargs)
        return _XJit(fn, kwargs)

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
