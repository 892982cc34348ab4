"""Testing support: synthetic data generators and laziness guard
(reference: xclim:src/xclim/testing/)."""

from xclim_tpu.testing.helpers import (  # noqa: F401
    assert_lazy,
    generate_atmos,
    test_grid,
    test_timeseries,
)
from xclim_tpu.testing import utils  # noqa: F401
from xclim_tpu.testing.utils import list_input_variables, nimbus, open_dataset, show_versions  # noqa: F401
