from . import beamform, corr_subsel, correlate, pfb, xgpu_order  # noqa: F401
