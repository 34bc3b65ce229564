"""Compat shim: the synthetic-AOI builder moved into the package
(brdfnerf_tpu.data.synth_aoi) when it graduated from test fixture to
framework API.  Tests and examples keep importing `synth_aoi` from the
tests/ path; everything re-exports from the package module."""

from brdfnerf_tpu.data.synth_aoi import *            # noqa: F401,F403
from brdfnerf_tpu.data.synth_aoi import (            # noqa: F401
    ALT0, BUMP_AMP, H, LAT0, LON0, MAX_ALT, MIN_ALT, RPV_GT, W, ZONE,
    ALB_SCALE)
