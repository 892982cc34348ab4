from xclim_tpu.io.netcdf import open_dataset, to_netcdf  # noqa: F401
