"""Bias adjustment (sdba): EQM / DQM / QDM / Scaling with grouped quantile
kernels (reference: the external xsdba package, re-exported by xclim.sdba —
xclim:src/xclim/sdba.py)."""

from xclim_tpu.sdba.adjustment import (  # noqa: F401
    LOCI,
    ExtremeValues,
    DetrendedQuantileMapping,
    EmpiricalQuantileMapping,
    QuantileDeltaMapping,
    Scaling,
    npdf_transform,
)
from xclim_tpu.sdba import measures, processing, properties  # noqa: F401
from xclim_tpu.sdba._otc import OTC, dOTC, optimal_transport_plan  # noqa: F401
from xclim_tpu.sdba.grouping import Grouper  # noqa: F401
from xclim_tpu.sdba.utils import equally_spaced_nodes  # noqa: F401
