"""Evaluation layer: statistics, sky classification, deviations, plots."""

from . import deviations, report, sky, stats  # noqa: F401
