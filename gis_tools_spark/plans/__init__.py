"""Execution plumbing: per-partition lineage/metrics capture and
stage-level checkpoint/resume."""

from .lineage import instrument, read_metrics  # noqa: F401
from .checkpoint import Pipeline  # noqa: F401
