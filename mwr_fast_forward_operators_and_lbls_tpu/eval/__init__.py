"""Evaluation layer: statistics, sky classification, deviations, plots."""

from . import deviations, sky, stats  # noqa: F401
