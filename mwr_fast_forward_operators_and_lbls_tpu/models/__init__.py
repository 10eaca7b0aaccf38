"""Tier-2 operators: batched LBL forward, Jacobians, fast operator, distillation."""

from .lbl import LBLConfig, forward_batch, forward_single  # noqa: F401
