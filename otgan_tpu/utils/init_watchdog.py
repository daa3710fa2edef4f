"""Device-init watchdog: fail loudly instead of hanging when the TPU
chip-grant service is unreachable.

On the axon platform an outage makes the first ``jax.devices()`` call
block forever in an acquisition-retry sleep loop — no error, no output.
A harness (or a user's launcher) then hangs instead of recording a
failure (observed: a multi-hour outage). ``arm`` starts a daemon thread
that triggers ``on_timeout`` unless :meth:`InitWatchdog.disarm` is called
within ``timeout`` seconds. Only first device enumeration should sit
under this timer — compiles can legitimately take many minutes and must
never be killed (a mid-compile kill wedges the remote compile service).
"""

from __future__ import annotations

import os
import sys
import threading
from typing import Callable, Optional


class InitWatchdog:
    def __init__(self, event: threading.Event):
        self._event = event

    def disarm(self) -> None:
        """Call as soon as the backend has enumerated devices."""
        self._event.set()


def _default_timeout_action(timeout: float) -> None:  # pragma: no cover
    print(
        f"FATAL: device init did not complete within {timeout:.0f}s — "
        "TPU tunnel/chip-grant service unreachable (environment outage, "
        "not a code failure)",
        file=sys.stderr,
        flush=True,
    )
    os._exit(2)


def arm(
    timeout: float, on_timeout: Optional[Callable[[], None]] = None
) -> InitWatchdog:
    """Arm a watchdog; returns the handle whose ``disarm()`` stands it
    down. ``timeout <= 0`` disables (returns an already-disarmed handle).
    ``on_timeout`` defaults to printing a FATAL line and ``os._exit(2)``
    (a raised exception in a daemon thread would vanish silently)."""
    ev = threading.Event()
    wd = InitWatchdog(ev)
    if timeout <= 0:
        ev.set()
        return wd
    action = on_timeout or (lambda: _default_timeout_action(timeout))

    def _watch():
        if not ev.wait(timeout):
            action()

    threading.Thread(target=_watch, daemon=True).start()
    return wd
