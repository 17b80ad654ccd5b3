"""Logging / profiling utilities."""

from stabnet_tpu.utils.compile_cache import enable_persistent_compilation_cache
from stabnet_tpu.utils.logging import get_logger
from stabnet_tpu.utils.platforms import (
    honor_jax_platforms_env,
    placement_platform,
)
from stabnet_tpu.utils.profiling import StageTimer, Timer

__all__ = ["enable_persistent_compilation_cache", "get_logger",
           "honor_jax_platforms_env", "placement_platform", "StageTimer",
           "Timer"]
