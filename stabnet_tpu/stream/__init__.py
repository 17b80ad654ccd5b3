"""Online streaming stabilization: device engine + host driver + video I/O."""

from stabnet_tpu.stream.engine import (
    StepOutput,
    StreamEngine,
    StreamState,
    assemble_input,
    crop_rectangle,
    init_state,
    stream_step,
    warp_color,
)
from stabnet_tpu.stream.driver import ClipResult, DeployOptions, StreamDriver

__all__ = [
    "ClipResult",
    "DeployOptions",
    "StepOutput",
    "StreamDriver",
    "StreamEngine",
    "StreamState",
    "assemble_input",
    "crop_rectangle",
    "init_state",
    "stream_step",
    "warp_color",
]
