"""Device-side kernel substrate: segment reductions, quantiles, run-length scans."""

from xclim_tpu.ops.segments import segment_reduce, build_gather_table  # noqa: F401
from xclim_tpu.ops.quantile import nan_quantile  # noqa: F401
