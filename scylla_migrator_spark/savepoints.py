"""Savepoints: resumable progress tracking as pruned work lists.

Reference parity (Z1-Z5, SavepointsManager.scala:53-472):
* a savepoint = the run's config + accumulated "done" sets (token ranges /
  scan segments / data files), serialized to YAML
* monotonic zero-padded ``(millis, seq)`` filenames — lexical order ==
  chronological order (SavepointsManager.scala:231-246); hostile clock
  values clamped to >= the last observed name (:433-472)
* atomic writes: tmp file + rename (:337-387)
* resume: latest savepoint's skip sets prune the work list BEFORE the scan
  is planned (F3-F5) — partition pruning, not runtime filtering

Our engine replaces the reference's SparkListener/accumulator machinery with
``input_file_name()``-grained completion tracking: after a unit (file,
segment, range) is fully written, the driver records it. The Z1 lifecycle
(periodic scheduler + SIGUSR2 on-demand dumps + terminal dump) lives in
``PeriodicDumper`` below, serialized on one lock like the reference's
``dumpLock``.

Every filesystem touch goes through ``pathio.for_path`` (PathIO.scala
parity): the savepoint directory may live on the local FS or a remote
object store (``memory://`` in tests); the manager never calls ``os``
directly."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import yaml

from scylla_migrator_spark import pathio

SAVEPOINT_PREFIX = "savepoint"


def _encode_name(millis: int, seq: int) -> str:
    # zero-padded so lexical sort == numeric sort (O4)
    return f"{SAVEPOINT_PREFIX}_{millis:020d}_{seq:06d}.yaml"


def _decode_name(name: str) -> tuple[int, int] | None:
    if not (name.startswith(SAVEPOINT_PREFIX + "_") and name.endswith(".yaml")):
        return None
    parts = name[len(SAVEPOINT_PREFIX) + 1 : -len(".yaml")].split("_")
    if len(parts) != 2:
        return None
    try:
        return int(parts[0]), int(parts[1])
    except ValueError:
        return None


@dataclass
class SavepointsManager:
    """Driver-side progress manager for one run."""

    directory: str
    config: dict[str, Any] = field(default_factory=dict)
    skip_files: set[str] = field(default_factory=set)
    skip_segments: set[int] = field(default_factory=set)
    skip_token_ranges: set[tuple[int, int]] = field(default_factory=set)

    def __post_init__(self) -> None:
        self._io = pathio.for_path(self.directory)
        self._io.create_directories(self.directory)

    # -- progress recording (replaces accumulators A3/Z2-Z5) ---------------
    def complete_files(self, files: list[str]) -> None:
        self.skip_files.update(files)

    def complete_segments(self, segments: list[int]) -> None:
        self.skip_segments.update(segments)

    def complete_token_ranges(self, ranges: list[tuple[int, int]]) -> None:
        self.skip_token_ranges.update(tuple(r) for r in ranges)

    # -- persistence --------------------------------------------------------
    def _next_name(self) -> str:
        now = int(time.time() * 1000)
        last = self.latest_name()
        seq = 0
        if last is not None:
            lm, ls = _decode_name(last)  # type: ignore[misc]
            if now <= lm:  # hostile/regressing clock: clamp monotonic (O4)
                now, seq = lm, ls + 1
        return _encode_name(now, seq)

    def latest_name(self) -> str | None:
        names = sorted(
            n
            for n in self._io.list_file_names(self.directory)
            if _decode_name(n) is not None
        )
        return names[-1] if names else None

    def dump(self) -> str:
        """Atomically write a savepoint (config + skip sets merged with any
        pre-existing sets, E3 union semantics). Returns the file path."""
        payload = {
            "config": self.config,
            "skipFiles": sorted(self.skip_files),
            "skipSegments": sorted(self.skip_segments),
            "skipTokenRanges": sorted(list(r) for r in self.skip_token_ranges),
        }
        name = self._next_name()
        path = self._io.join(self.directory, name)
        # staged write + atomic rename (Z1, PathIO.scala:74-118)
        self._io.write_utf8_atomically(
            path, yaml.safe_dump(payload, sort_keys=True).encode("utf-8")
        )
        return path

    @classmethod
    def resume(cls, directory: str) -> "SavepointsManager":
        """Seed a manager from the latest savepoint in ``directory``
        (S10: skip sets become scan-planning prune lists)."""
        mgr = cls(directory)
        latest = mgr.latest_name()
        if latest is None:
            return mgr
        payload = yaml.safe_load(mgr._io.read_utf8(mgr._io.join(directory, latest))) or {}
        mgr.config = payload.get("config", {})
        mgr.skip_files = set(payload.get("skipFiles", []))
        mgr.skip_segments = set(payload.get("skipSegments", []))
        mgr.skip_token_ranges = {tuple(r) for r in payload.get("skipTokenRanges", [])}
        return mgr


def diff_token_ranges(
    all_ranges: list[tuple[int, int]], done: set[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Coverage diagnostic (E1, CqlSavepointsManager.scala:39-83)."""
    return [r for r in all_ranges if tuple(r) not in done]


class PeriodicDumper:
    """Z1 lifecycle: periodic + signal-triggered + terminal savepoint dumps
    (SavepointsManager.scala:72-92 scheduler, :248-322 signal handlers,
    terminal dump at ScyllaMigrator.scala:113-131).

    A daemon scheduler thread dumps every ``interval_seconds``; an optional
    SIGUSR2 handler dumps on demand; ``stop()`` joins the thread and writes
    the terminal savepoint. All dumps serialize on one REENTRANT lock (the
    reference's ``dumpLock``): the signal handler runs on the main thread
    between bytecodes, so a SIGUSR2 landing while the main thread is itself
    inside ``dump_now()`` re-enters the lock — a non-reentrant lock would
    self-deadlock there. The atomic tmp+rename in ``dump()`` means a crash
    mid-dump never leaves a truncated savepoint. The handler is installed in
    ``start()`` and restored in ``stop()``."""

    def __init__(
        self,
        manager: SavepointsManager,
        interval_seconds: float,
        install_signal_handler: bool = False,
    ) -> None:
        import threading

        self._mgr = manager
        self._interval = interval_seconds
        self._lock = threading.RLock()
        self._stop = threading.Event()
        self._thread: Any = None
        self._prev_handler: Any = None
        self._signal_installed = False
        self._want_signal = install_signal_handler
        self.dump_count = 0

    def dump_now(self) -> str:
        with self._lock:
            path = self._mgr.dump()
            self.dump_count += 1
            return path

    def start(self) -> "PeriodicDumper":
        import threading

        if self._want_signal and threading.current_thread() is threading.main_thread():
            import signal as _signal

            self._prev_handler = _signal.signal(_signal.SIGUSR2, lambda *_: self.dump_now())
            self._signal_installed = True

        def loop() -> None:
            while not self._stop.wait(self._interval):
                self.dump_now()

        self._thread = threading.Thread(target=loop, daemon=True, name="savepoint-dumper")
        self._thread.start()
        return self

    def stop(self) -> str:
        """Stop the scheduler and write the terminal savepoint."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
        if self._signal_installed:
            import signal as _signal

            _signal.signal(_signal.SIGUSR2, self._prev_handler)
            self._signal_installed = False
        return self.dump_now()

    def __enter__(self) -> "PeriodicDumper":
        return self.start()

    def __exit__(self, *exc: Any) -> None:
        self.stop()
