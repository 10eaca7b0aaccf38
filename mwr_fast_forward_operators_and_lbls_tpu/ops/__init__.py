"""Tier-1 physics ops: thermo, absorption, geometry, RTE, Pallas kernels."""

from . import absorption, geometry, rte, thermo  # noqa: F401
