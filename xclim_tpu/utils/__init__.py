"""Runtime utilities: profiling/tracing (SURVEY §5: the TPU equivalent of
the reference's dask-dashboard observability is JAX profiler traces)."""

from xclim_tpu.utils.profiling import profile, timed  # noqa: F401
