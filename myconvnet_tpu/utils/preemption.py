"""Graceful-preemption handling: finish the step, checkpoint, exit clean.

TPU-pod reality the reference never faced (single-workstation, SURVEY.md
§5 "failure detection: ABSENT"): maintenance events and spot reclaims
deliver SIGTERM with a short grace window.  The trainer polls
:class:`PreemptionGuard` once per host-loop iteration — on a signal it
stops dispatching, saves the full train state, and returns, so the
``--max_restarts`` / resume-from-latest path continues exactly where it
left off (resume exactness is tested in test_determinism.py).
"""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Latches SIGTERM/SIGINT (and a manual trigger) into a poll flag.

    Use as a context manager so the previous handlers are restored on
    exit (nested guards and pytest runs stay well-behaved).  A second
    SIGINT re-raises KeyboardInterrupt — the operator can always insist.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._event = threading.Event()
        self._prev = {}
        self._hits = 0

    # -- context management ------------------------------------------------

    def __enter__(self) -> "PreemptionGuard":
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._on_signal)
            except ValueError:
                # not the main thread: polling still works via trigger()
                pass
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev.clear()
        return False

    # -- signal path -------------------------------------------------------

    def _on_signal(self, signum, frame):
        self._hits += 1
        if signum == signal.SIGINT and self._hits > 1:
            raise KeyboardInterrupt
        self._event.set()

    def trigger(self) -> None:
        """Manual preemption (tests, external watchers)."""
        self._event.set()

    @property
    def preempted(self) -> bool:
        return self._event.is_set()
