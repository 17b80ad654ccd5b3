"""AOT export of the streaming step for serving (StableHLO artifacts).

The reference deploys by restoring the full TRAINING graph from a .meta file
and pulling tensors by name (deploy_bundle.py:45-56) — the serving artifact
is the training checkpoint itself.  Here deployment gets a first-class
artifact: `export_stream_step` serializes the jitted online step (weights
baked in, shapes fixed) via `jax.export`, and `load_stream_step` turns the
bytes back into a callable — no model code, checkpoint plumbing, or Python
package version coupling on the serving side beyond JAX itself.

The exported function is exactly `StreamEngine.step`'s computation:
(state, gray (S, H, W), color (S, Ho, Wo, 3) uint8) ->
(new_state, StepOutput).  `initial_state` builds the warm-up state
(deploy_bundle.py:216-224 semantics) for the serving process.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.stream import engine as _engine


def _register_serialization() -> None:
    from jax import export as jax_export

    for cls in (_engine.StreamState, _engine.StepOutput):
        try:
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=f"stabnet_tpu.{cls.__name__}")
        except ValueError:
            pass  # already registered (repeated export calls)


_register_serialization()


def export_stream_step(model, variables, cfg: StabNetConfig,
                       out_hw: Tuple[int, int], streams: int = 1,
                       refine: int = 1,
                       platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """Serialize the online streaming step with weights baked in.

    Args:
      out_hw: full-resolution output size (Ho, Wo).
      streams: number of concurrent streams S the artifact serves.
      platforms: lowering platforms (default: the current backend).

    Returns:
      Serialized `jax.export` artifact bytes.
    """
    from jax import export as jax_export

    use_pallas = jax.default_backend() in ("tpu", "axon")

    def step(state, gray, color):
        return _engine.stream_step(model, variables, state, gray, color, cfg,
                                   refine=refine, out_hw=out_hw,
                                   use_pallas=use_pallas)

    S = streams
    Ho, Wo = out_hw
    state0 = jax.eval_shape(
        functools.partial(_engine.init_state, cfg=cfg),
        jax.ShapeDtypeStruct((S, cfg.height, cfg.width), jnp.float32),
    )
    gray = jax.ShapeDtypeStruct((S, cfg.height, cfg.width), jnp.float32)
    color = jax.ShapeDtypeStruct((S, Ho, Wo, 3), jnp.uint8)
    exported = jax_export.export(
        jax.jit(step),
        platforms=list(platforms) if platforms else None,
    )(state0, gray, color)
    return exported.serialize()


def load_stream_step(data: bytes):
    """Deserialize an exported streaming step into a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(bytearray(data))
    return jax.jit(exported.call)


def initial_state(first_gray: np.ndarray, cfg: StabNetConfig):
    """Warm-up state for the serving process (frame 0 fills the ring)."""
    return _engine.init_state(jnp.asarray(first_gray), cfg)
