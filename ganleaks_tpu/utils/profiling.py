"""Tracing / profiling (SURVEY §5: the reference's only 'tracing' is tqdm
bars; here stage-level ``jax.profiler`` annotations + throughput meters are
first-class, since the BASELINE metrics are throughputs).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_stage(name: str, meters: dict | None = None,
                items: int | None = None):
    """Annotate a pipeline stage for the JAX profiler and record wall-clock
    (+ items/sec if ``items`` given) into ``meters``.

    Both meters accumulate across entries ({name}_seconds, {name}_items),
    so {name}_items_per_sec is the CUMULATIVE rate, consistent with the
    logged seconds. NOTE: the timer is host wall-clock with no device
    sync — a body that only dispatches jitted work measures async
    dispatch, not execution; call ``jax.block_until_ready`` on the
    stage's outputs inside the ``with`` (the discipline
    :class:`Throughput` callers follow) for a throughput number."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    if meters is not None:
        secs = meters.get(f"{name}_seconds", 0.0) + dt
        meters[f"{name}_seconds"] = secs
        if items is not None:
            total = meters.get(f"{name}_items", 0) + items
            meters[f"{name}_items"] = total
            meters[f"{name}_items_per_sec"] = (total / secs if secs > 0
                                               else 0.0)


@contextlib.contextmanager
def profile_to(log_dir: str | None):
    """Capture a full profiler trace (view with TensorBoard/XProf)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enabled: bool = True) -> None:
    """SURVEY §5 sanitizer plan: the TPU analog of the reference's
    ``torch.autograd.set_detect_anomaly(True)`` (``privDCGAN.py:63``)."""
    jax.config.update("jax_debug_nans", enabled)


def checked(fn, *, errors=None):
    """Wrap a jittable function with ``jax.experimental.checkify`` NaN/OOB
    guards (debug mode for kernels/steps): returns a function that raises
    host-side on the first NaN or out-of-bounds index instead of silently
    propagating. Debug tool — adds overhead; intended for CPU debug runs
    (remote-compile TPU backends can be very slow compiling the error
    branches). For TPU-side NaN hunting prefer enable_nan_debugging."""
    from jax.experimental import checkify

    errs = errors if errors is not None else (
        checkify.float_checks | checkify.index_checks)
    cfn = checkify.checkify(fn, errors=errs)

    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapped
