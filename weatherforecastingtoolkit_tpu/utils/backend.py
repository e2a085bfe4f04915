"""Bounded retry around JAX backend initialization.

The axon TPU tunnel can be transiently UNAVAILABLE at process start —
BENCH_r03 died at `jax.devices()` before any repo code ran, and tunnel
outages of minutes-to-hours have been observed mid-queue. Every TPU entry
point (bench.py, experiments/perf/*, experiments/demo_path_b.py) calls
`wait_for_backend()` before its first device use so a flake costs a retry,
not the run. A failed init is cached by jax, so each retry clears the
backend registry first.
"""

from __future__ import annotations

import sys
import time


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def wait_for_backend(max_tries: int = 8, base_delay_s: float = 10.0,
                     deadline_s: float | None = None):
    """Return jax.devices(), retrying init failures with capped exponential
    backoff. Raises the last RuntimeError after `max_tries` attempts — or,
    when `deadline_s` is given, keeps retrying until that many seconds have
    elapsed since the first attempt (`max_tries` is then ignored; observed
    axon outages run minutes-to-hours, so count-bounded retry is the wrong
    unit for a run that must not forfeit, e.g. the driver's bench)."""
    import jax

    start = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            devs = jax.devices()
            if attempt > 1:
                _log(f"backend came up on attempt {attempt}")
            return devs
        except RuntimeError as e:
            if deadline_s is not None:
                exhausted = time.monotonic() - start >= deadline_s
            else:
                exhausted = attempt >= max_tries
            if exhausted:
                raise
            delay = min(base_delay_s * 2 ** (attempt - 1), 120.0)
            budget = (f"{time.monotonic() - start:.0f}/{deadline_s:.0f}s"
                      if deadline_s is not None else f"{attempt}/{max_tries}")
            _log(f"backend init attempt {attempt} failed [{budget}] "
                 f"({str(e).splitlines()[0][:160]}); retrying in {delay:.0f}s")
            try:
                import jax.extend
                jax.extend.backend.clear_backends()
            except Exception as ce:  # noqa: BLE001 — best-effort cache clear
                _log(f"clear_backends failed: {type(ce).__name__}: {ce}")
            time.sleep(delay)
