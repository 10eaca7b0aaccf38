"""Tier-2 operators: batched LBL forward, Jacobians, fast operator,
distillation, OEM retrieval."""

from .lbl import LBLConfig, forward_batch, forward_single  # noqa: F401
from . import fast, jacobians, retrieval  # noqa: F401
