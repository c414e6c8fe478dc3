"""Per-phase prover profiling (SURVEY.md §5 tracing/metrics).

Enable with ELP_PROFILE=1 (or Profiler.push(...) programmatically);
prove() then records wall-clock per pipeline phase, blocking on the
phase's device outputs so async dispatch doesn't smear attribution,
and counts host-side transcript permutations.  The result lands in
``last_profile`` and is printed as one JSON line when env-enabled.
"""

from __future__ import annotations

import json
import os
import time

from ..ops.backend import USE_NUMPY

last_profile: dict | None = None


def _block(x):
    if not USE_NUMPY and x is not None:
        import jax

        jax.block_until_ready(x)


class Profiler:
    """No-op unless enabled; prove() drives it via phase()."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._t0 = time.time()
        self._start = None
        self._name = None

    @classmethod
    def current(cls) -> "Profiler":
        return cls(enabled=os.environ.get("ELP_PROFILE", "") not in ("", "0"))

    def phase(self, name: str, block_on=None):
        """End the previous phase (blocking on its outputs) and start `name`."""
        if not self.enabled:
            return
        now_block = time.time()
        _block(block_on)
        now = time.time()
        if self._name is not None:
            self.times[self._name] = self.times.get(self._name, 0.0) + (now - self._start)
            self.times.setdefault("_sync_wait", 0.0)
            self.times["_sync_wait"] += now - now_block
        if os.environ.get("ELP_PHASE_LOG", "") not in ("", "0"):
            import sys

            print(f"[prove +{now - self._t0:7.1f}s] phase {name}", file=sys.stderr, flush=True)
        self._name = name
        self._start = now

    def count(self, name: str, inc: int = 1):
        if self.enabled:
            self.counts[name] = self.counts.get(name, 0) + inc

    def finish(self, block_on=None) -> dict | None:
        global last_profile
        if not self.enabled:
            return None
        self.phase(None, block_on)
        self._name = None
        total = time.time() - self._t0
        out = {
            "total_s": round(total, 3),
            "phases": {k: round(v, 4) for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])},
            "counts": self.counts,
        }
        last_profile = out
        if os.environ.get("ELP_PROFILE", "") not in ("", "0"):
            print("ELP_PROFILE " + json.dumps(out), flush=True)
        return out
