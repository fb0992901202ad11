"""Debug + tracing utilities.

Replaces the reference's ``tensor_dbg!`` macro (util/mod.rs:4-18) with
jit-safe equivalents, and its example-only ``tracing`` setup
(examples/transcribe.rs:12-17) with structured logging.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

import jax

log = logging.getLogger("whisper_rs_tpu")
if not log.handlers:
    h = logging.StreamHandler()
    h.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    log.addHandler(h)
    log.setLevel(os.environ.get("WHISPER_LOG", "INFO"))

_DEBUG_TENSORS = os.environ.get("WHISPER_DEBUG_TENSORS") == "1"


def tensor_dbg(name: str, x) -> None:
    """Print a tensor's stats from inside jitted code (no-op unless
    WHISPER_DEBUG_TENSORS=1 — the reference's call sites are likewise
    commented out in the hot path)."""
    if not _DEBUG_TENSORS:
        return
    jax.debug.print(
        name + ": shape={s} mean={m} absmax={a}",
        s=x.shape,
        m=x.mean(),
        a=abs(x).max(),
    )


@contextlib.contextmanager
def step_timer(name: str, audio_seconds: float | None = None):
    """Wall-clock span logging with optional audio-seconds/s throughput."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if audio_seconds is not None and dt > 0:
        log.info("%s: %.3fs (%.1f audio-s/s)", name, dt, audio_seconds / dt)
    else:
        log.info("%s: %.3fs", name, dt)


@contextlib.contextmanager
def profiler_trace(name: str):
    """jax.profiler annotation span (shows up in Perfetto/XProf dumps)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def enable_nan_checks() -> None:
    """Turn on jax_debug_nans: any NaN produced under jit raises at the op
    that made it.  JAX's functional purity already rules out the shared-
    mutable-state races the reference prevents with ``Cell``/``!Sync``
    types (model.rs:40); this covers numeric corruption instead."""
    jax.config.update("jax_debug_nans", True)


def start_profiler(logdir: str) -> None:
    jax.profiler.start_trace(logdir)


def stop_profiler() -> None:
    jax.profiler.stop_trace()
