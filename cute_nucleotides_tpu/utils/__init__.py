"""Auxiliary subsystems: streaming IO, checkpoint/resume, metrics, profiling."""

from . import checkpoint, io, metrics, profiling  # noqa: F401
