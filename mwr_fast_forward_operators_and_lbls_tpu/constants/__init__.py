"""Tier-0 pure-data constants: physics, instrument defs, spectroscopy, climatology."""

from . import afgl, h2o_lines, hatpro, o2_lines, physics  # noqa: F401
from .h2o_lines import H2O_MODELS, ZENITH_SWEEP_MODELS, H2OModel  # noqa: F401
from .hatpro import (  # noqa: F401
    AZIMUTHS_DEG,
    ELEVATIONS_DEG,
    HATPRO_FREQS_GHZ,
    N_CHANNELS,
    N_CROP,
    N_ELEVATIONS,
    N_LEVELS,
)
from .o2_lines import O2_MODELS, O2Model  # noqa: F401
