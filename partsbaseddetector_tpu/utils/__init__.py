"""Utilities: C-semantics rounding, observability."""

from .profiling import Timer, checked, time_jitted, trace, validate_image
from .rounding import cround
