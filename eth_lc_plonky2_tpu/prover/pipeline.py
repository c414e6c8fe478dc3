"""Host/device pipeline overlap: the streaming prover (SURVEY.md §2c
item 5).

In the production serving shape — one resident circuit proving a
stream of light-client updates — the host-side witness pass (vector
generator sweeps over the (rows x wires) matrix; ~2.4 s at committee
512) would serialize with device work if each update were proven
sequentially.  `prove_stream` double-buffers: witness generation for
update k+1 runs in a worker thread while the device proves update k,
so steady-state throughput is max(device_prove, host_witness) instead
of their sum.

Witness generation is pure numpy (releases the GIL in its hot loops)
and touches no device state, so a single worker thread is safe; proofs
are yielded strictly in input order and are byte-identical to
sequential `prove` calls (same witness values, same transcript).
"""

from __future__ import annotations

import threading
import queue
from typing import Callable, Iterable, Iterator

from . import prove as pr


def prove_stream(
    pd: pr.ProverData,
    witness_inputs: Iterable,
    make_witness: Callable,
    prefetch: int = 1,
) -> Iterator[pr.Proof]:
    """Prove a stream of updates with witness generation overlapped.

    witness_inputs: iterable of per-update inputs (e.g. the
    witness_kwargs dicts the CLI assembles).
    make_witness(pd.data, item) -> generated Witness for one update.
    prefetch: how many witnesses may be in flight ahead of the prover.

    Yields Proof objects in input order.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
    _END = object()
    errors: list = []

    def worker():
        try:
            for item in witness_inputs:
                q.put(make_witness(pd.data, item))
        except BaseException as e:  # surface in the consumer
            errors.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        w = q.get()
        if w is _END:
            break
        yield pr.prove(pd, w)
    t.join()
    if errors:
        raise errors[0]
