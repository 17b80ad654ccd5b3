"""Logging / profiling utilities."""

from stabnet_tpu.utils.logging import get_logger
from stabnet_tpu.utils.profiling import StageTimer, Timer

__all__ = ["get_logger", "StageTimer", "Timer"]
