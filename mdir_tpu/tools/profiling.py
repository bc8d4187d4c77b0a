"""Profiling hooks: XLA trace capture + named-lap wall timing.

The reference's tracing is homegrown StopWatch laps (SURVEY §5.1); on TPU the
native tool is the XLA profiler — ``trace()`` captures a TensorBoard-viewable
trace of device programs, transfers and host callbacks.

Usage::

    from mdir_tpu.tools.profiling import trace

    with trace("/tmp/mdir_trace"):
        extract_vectors_network(...)
"""
import contextlib
import time


@contextlib.contextmanager
def trace(log_dir, create_perfetto_link=False):
    """Capture an XLA profiler trace into log_dir (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label, sink=None):
    """Wall-time a block with a hard device sync at the end."""
    import jax

    start = time.time()
    try:
        yield
    finally:
        try:
            (jax.device_put(0.0) + 0).block_until_ready()
        except Exception:
            pass
        elapsed = time.time() - start
        message = "[%s] %.3fs" % (label, elapsed)
        (sink or print)(message)


def device_memory_profile(path=None):
    """Dump the jax device memory profile (pprof format) or return bytes."""
    import jax

    data = jax.profiler.device_memory_profile()
    if path:
        with open(path, "wb") as handle:
            handle.write(data)
        return path
    return data
