"""Host<->device transfer helpers for the tunneled-TPU deployment."""

from __future__ import annotations

import threading
from concurrent.futures import Future


def bg_fetch(fn, *args, ready=None) -> Future:
    """Run a blocking device->host fetch on a DAEMON thread; returns a
    Future.

    ``ready``: optional no-arg callable (e.g. ``some_array.is_ready``);
    the worker POLLS it before calling ``fn``.  A device_get that blocks
    waiting on device compute holds the tunnel client's lock for the whole
    wait, stalling the main thread's own dispatches for ~the compute time
    (measured: ~98 ms main-thread stalls per keyframe while the worker
    waited on the mapping stage).  Polling is_ready sleeps GIL-free until
    the value exists, so the eventual fetch only holds the lock for the
    transfer itself.

    Why not ThreadPoolExecutor: its workers are non-daemon and joined at
    interpreter exit — a fetch still in flight when the process ends then
    joins against a torn-down device runtime (observed: abort in the XLA
    client destructor).  Daemon threads die with the process instead; the
    consumers only ever read futures that are ``done()`` (or explicitly
    block in ``finish()`` while the runtime is alive)."""
    import time

    import jax

    fut: Future = Future()

    if jax.default_backend() == "cpu":
        # The XLA:CPU runtime ABORTS under a concurrent device_get
        # (worker thread) + dispatch (main thread) — observed as fatal
        # SIGABRT/SIGSEGV deep in test suites.  A worker buys nothing on
        # CPU anyway (the fetch it hides is the TPU tunnel's ~25 ms RTT),
        # so fetch synchronously: deterministic and crash-free.
        try:
            fut.set_result(fn(*args))
        except BaseException as e:
            fut.set_exception(e)
        return fut

    def run():
        try:
            if ready is not None:
                while not ready():
                    time.sleep(0.002)
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
