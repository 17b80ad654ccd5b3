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


def test_const_image_vjp_matches_xla_grads():
    """Map gradients of the custom-VJP sampler == XLA autodiff gradients."""
    import jax

    from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas_const_image

    rng = np.random.RandomState(3)
    B, H, W, C = 1, 8, 128, 1
    im = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    gx = np.linspace(-1, 1, W, dtype=np.float32)
    gy = np.linspace(-1, 1, H, dtype=np.float32)
    xg, yg = np.meshgrid(gx, gy)
    xm = jnp.asarray((xg * 0.9 + 0.03)[None].astype(np.float32))
    ym = jnp.asarray((yg * 0.9 - 0.02)[None].astype(np.float32))
    g = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    def loss_ref(x, y):
        return jnp.sum(bilinear_sample(im, x, y) * g)

    def loss_pallas(x, y):
        return jnp.sum(bilinear_sample_pallas_const_image(im, x, y) * g)

    gx_ref, gy_ref = jax.grad(loss_ref, argnums=(0, 1))(xm, ym)
    gx_p, gy_p = jax.grad(loss_pallas, argnums=(0, 1))(xm, ym)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_ref),
                               rtol=1e-4, atol=1e-4)
