"""AOT serving-artifact export: serialize -> deserialize -> step parity.

The reference's serving artifact is the training .meta graph restored by
name (deploy_bundle.py:45-56); ours is a jax.export StableHLO blob with
weights baked in.  These tests check the round trip is lossless: a step run
through the deserialized artifact matches the live engine bit-for-bit on the
same inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream.engine import init_state, stream_step
from stabnet_tpu.stream.export import (export_stream_step, initial_state,
                                       load_stream_step)

CFG = get_config("tiny")
OUT_HW = (2 * CFG.height, 2 * CFG.width)


def _setup():
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    return model, variables


def test_export_roundtrip_matches_live_step():
    model, variables = _setup()
    data = export_stream_step(model, variables, CFG, OUT_HW, streams=1)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 0

    step = load_stream_step(data)

    rng = np.random.RandomState(0)
    gray = rng.rand(1, CFG.height, CFG.width).astype(np.float32) - 0.5
    color = rng.randint(0, 255, (1, *OUT_HW, 3), dtype=np.uint8)
    state0 = initial_state(gray, CFG)

    state1, out1 = step(state0, gray, color)
    state2, out2 = jax.jit(
        lambda s, g, c: stream_step(model, variables, s, g, c, CFG,
                                    out_hw=OUT_HW, use_pallas=False)
    )(state0, jnp.asarray(gray), jnp.asarray(color))

    np.testing.assert_array_equal(np.asarray(out1.warped_color),
                                  np.asarray(out2.warped_color))
    np.testing.assert_allclose(np.asarray(out1.x_map),
                               np.asarray(out2.x_map), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state1.frames),
                               np.asarray(state2.frames), atol=1e-6)


def test_export_multistream_refine():
    model, variables = _setup()
    data = export_stream_step(model, variables, CFG, OUT_HW, streams=2,
                              refine=2)
    step = load_stream_step(data)
    gray = np.zeros((2, CFG.height, CFG.width), np.float32)
    color = np.zeros((2, *OUT_HW, 3), np.uint8)
    state, out = step(initial_state(gray, CFG), gray, color)
    assert out.warped_color.shape == (2, *OUT_HW, 3)
    assert out.warped_color.dtype == jnp.uint8
    # the ring pointer advanced exactly once despite refine=2
    assert int(state.ptr) == int(initial_state(gray, CFG).ptr) + 1
