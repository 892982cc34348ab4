from xclim_tpu.testing.helpers import generate_atmos, test_grid, test_timeseries  # noqa: F401
