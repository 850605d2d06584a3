"""Host<->device transfer helpers for the tunneled-TPU deployment."""

from __future__ import annotations


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
