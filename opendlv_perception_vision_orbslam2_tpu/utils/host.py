"""Host<->device transfer helpers for the tunneled-TPU deployment."""

from __future__ import annotations

import threading
from concurrent.futures import Future


def bg_fetch(fn, *args) -> Future:
    """Run a blocking device->host fetch on a DAEMON thread; returns a
    Future.

    Why not ThreadPoolExecutor: its workers are non-daemon and joined at
    interpreter exit — a fetch still in flight when the process ends then
    joins against a torn-down device runtime (observed: abort in the XLA
    client destructor).  Daemon threads die with the process instead; the
    consumers only ever read futures that are ``done()`` (or explicitly
    block in ``finish()`` while the runtime is alive)."""
    fut: Future = Future()

    def run():
        try:
            fut.set_result(fn(*args))
        except BaseException as e:  # surfaced at .result()
            fut.set_exception(e)

    threading.Thread(target=run, daemon=True, name="bg-fetch").start()
    return fut


def prefetch_to_host(*arrays):
    """Start asynchronous device->host copies.

    On the tunneled TPU every BLOCKING fetch costs a full round trip
    (~25 ms measured) even when the value finished long ago; a copy
    started at dispatch time makes the later ``np.asarray`` a local read
    (~0.7 ms measured).  Best-effort: backends without the API just pay
    the RTT at read time."""
    for a in arrays:
        try:
            a.copy_to_host_async()
        except Exception:
            pass
