"""Preemption-tolerant training: SIGTERM -> agreed checkpoint -> clean exit.

The reference has no preemption story — a SLURM kill mid-epoch loses
everything since the last SAVE_FREQ checkpoint
(/root/reference/misc/engine.py:167-177, /root/reference/hisfrag_slurm.sl).
On TPU pods preemption is routine (maintenance events, preemptible
quota), and the scheduler delivers SIGTERM to every host with a short
grace window, so a production trainer must turn that signal into one
collective checkpoint and exit cleanly.

The hard part is multi-host agreement: orbax saves of mesh-sharded
arrays are collective — every process must call ``save`` together — but
SIGTERM delivery is per-host and asynchronous (process A may see it
during step k, process B during k+1). ``PreemptionGuard`` therefore
never acts on the local flag directly: at a fixed step cadence every
process contributes its flag to a tiny all-gather and all of them act
if ANY flagged. The cadence is aligned by construction (the train loop
calls ``should_stop`` at every optimizer step, and each process runs
the same number of steps under ``drop_last=True``).

The agreement is ONE CADENCE LAGGED so it never stalls the dispatch
pipeline: each ``should_stop`` call enqueues this cadence's flag
all-gather asynchronously and inspects the result of the PREVIOUS
cadence's dispatch. Because per-device execution is FIFO, blocking on
the previous dispatch only waits for work enqueued before the current
train step — the host keeps exactly one step of lookahead, the same
async-dispatch pipelining the engine preserves between PRINT_FREQ
syncs. The price is that agreement lands one cadence after the flag is
raised (worst case two cadence periods after SIGTERM), well inside any
real grace window. All processes inspect the SAME collective result at
the same cadence index, so they still agree exactly.

``jax.experimental.multihost_utils.reached_preemption_sync_point`` does
the same agreement through the coordination-service key-value store, but
requires its SIGTERM plumbing to be active and a distributed client to
exist; this guard works identically for single-process runs, spawned
CPU-mesh tests, and real pods, with the one-int allgather as its only
cost (skipped entirely when ``process_count() == 1``).
"""

from __future__ import annotations

import signal
import threading

import jax
import numpy as np

__all__ = ["PreemptionGuard"]


class PreemptionGuard:
    """Install via :meth:`install` (main thread only); poll via
    :meth:`should_stop` at an identical step cadence on every process."""

    def __init__(self, check_freq: int = 1,
                 signals=(signal.SIGTERM,)):
        self.check_freq = max(int(check_freq), 1)
        self._signals = tuple(signals)
        self._flag = threading.Event()
        self._prev = {}
        self._installed = False
        self._pending = None      # in-flight flag all-gather (device array)
        self._gather = None       # jitted replicating identity, built lazily

    # ------------------------------------------------------------- signals
    def install(self) -> "PreemptionGuard":
        """Register the handlers. A no-op off the main thread (signal
        registration is main-thread-only in CPython) — the guard then
        only trips via :meth:`signal` or another process's flag."""
        try:
            for sig in self._signals:
                self._prev[sig] = signal.signal(sig, self._handler)
            self._installed = True
        except ValueError:  # not the main thread
            self._prev.clear()
        return self

    def uninstall(self) -> None:
        if self._installed:
            for sig, prev in self._prev.items():
                signal.signal(sig, prev)
            self._prev.clear()
            self._installed = False

    def _handler(self, signum, frame):
        self._flag.set()
        prev = self._prev.get(signum)
        if callable(prev):  # chain e.g. a scheduler's own bookkeeping
            try:
                prev(signum, frame)
            except (KeyboardInterrupt, SystemExit, Exception):
                # a prior handler that raises or sys.exit()s must not be
                # allowed to kill the process before the agreed preemption
                # checkpoint lands — latching the flag is the contract here
                pass

    def signal(self) -> None:
        """Trip the local flag programmatically (tests, external pollers
        such as a cloud metadata preemption notice watcher)."""
        self._flag.set()

    # ----------------------------------------------------------- agreement
    @property
    def preempted_locally(self) -> bool:
        return self._flag.is_set()

    def _dispatch(self):
        """Enqueue this process's flag into a global all-gather WITHOUT
        blocking on the result. Returns the (device) replicated array."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        if self._gather is None:
            devs = np.asarray(jax.devices()).reshape(jax.process_count(), -1)
            mesh = Mesh(devs, ("proc", "dev"))
            self._flag_sharding = NamedSharding(mesh, P("proc"))
            self._gather = jax.jit(
                lambda x: x, out_shardings=NamedSharding(mesh, P()))
        arr = jax.make_array_from_process_local_data(
            self._flag_sharding,
            np.asarray([self._flag.is_set()], np.int32))
        return self._gather(arr)

    def should_stop(self, step: int) -> bool:
        """True on EVERY process once any process was preempted.

        Must be called with the same ``step`` sequence on all processes;
        steps off the ``check_freq`` cadence return False without
        communicating (so the collective stays aligned). Multi-process,
        the answer is one cadence stale (see module docstring) — the
        check never blocks on the just-enqueued train step.
        """
        if step % self.check_freq:
            return False
        if jax.process_count() == 1:
            return self._flag.is_set()
        try:
            if self._pending is None:
                self._pending = self._dispatch()
            prev, self._pending = self._pending, self._dispatch()
            return bool(np.any(jax.device_get(prev)))
        except Exception:
            # conservative fallback (blocking, but always available)
            from jax.experimental.multihost_utils import process_allgather

            flags = process_allgather(
                np.asarray([self._flag.is_set()], np.int32))
            return bool(np.any(flags))
