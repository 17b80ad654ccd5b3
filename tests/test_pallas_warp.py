"""Pallas warp kernel vs. the XLA reference path (interpret mode on CPU).

The same kernel is additionally validated on real TPU hardware by
`.bench/test_kernel.py` (correctness to ~1e-6 at 720p); here a single-tile
interpret-mode run keeps CI hardware-independent.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas
from stabnet_tpu.ops.warp import bilinear_sample


@pytest.mark.parametrize("shift", [0.0, 0.4])
def test_matches_xla_single_tile(shift):
    rng = np.random.RandomState(0)
    B, H, W, C = 1, 8, 128, 2
    im = rng.rand(B, H, W, C).astype(np.float32)
    gx = np.linspace(-1, 1, W, dtype=np.float32)
    gy = np.linspace(-1, 1, H, dtype=np.float32)
    xg, yg = np.meshgrid(gx, gy)
    xm = (xg * 0.9 + shift + 0.02 * np.sin(yg * 3))[None].astype(np.float32)
    ym = (yg * 0.9 + 0.02 * np.cos(xg * 2))[None].astype(np.float32)

    ref = np.asarray(bilinear_sample(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym)))
    got = np.asarray(
        bilinear_sample_pallas(
            jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym),
            y_band=8, x_band=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)
