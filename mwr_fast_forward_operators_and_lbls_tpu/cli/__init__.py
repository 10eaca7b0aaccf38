"""CLI entry points (python -m mwr_fast_forward_operators_and_lbls_tpu.cli)."""

from .main import main  # noqa: F401
