"""Pallas warp kernel vs. the XLA reference path (interpret mode on CPU).

The same kernel is additionally validated on real TPU hardware by
`.bench/test_kernel.py` (correctness to ~1e-6 at 720p); here a single-tile
interpret-mode run keeps CI hardware-independent.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from stabnet_tpu.ops import pallas_warp, warp
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


def test_non_tile_aligned_height_matches_xla():
    """Output heights that are NOT tile multiples must not zero real rows.

    Regression: zero-padding the NDC maps to tile multiples put padded
    samples at the image center, corrupting edge tiles' DMA window base
    (~0.98 error in the bottom real rows at Ho=120, tile_h=16).  Padding now
    replicates border coordinates instead.
    """
    rng = np.random.RandomState(1)
    B, H, W, C = 1, 120, 192, 2          # 120 % 16 == 8, 192 % 64 == 0
    im = rng.rand(B, H, W, C).astype(np.float32)
    gx = np.linspace(-1, 1, W, dtype=np.float32)
    gy = np.linspace(-1, 1, H, dtype=np.float32)
    xg, yg = np.meshgrid(gx, gy)
    xm = (xg * 0.95 + 0.01)[None].astype(np.float32)
    ym = (yg * 0.95 - 0.02)[None].astype(np.float32)

    ref = np.asarray(bilinear_sample(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym)))
    got = np.asarray(
        bilinear_sample_pallas(
            jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym),
            y_band=32, x_band=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_boundary_sample_exactly_at_edge_is_zero():
    """At x == W-1 exactly the reference clamped-corner weights cancel to 0;
    the kernel's strict validity bound must reproduce that, not return the
    edge pixel."""
    B, H, W, C = 1, 8, 128, 1
    im = np.ones((B, H, W, C), np.float32)
    # x_pix == W-1 everywhere: x_ndc = 2*(W-1)/W - 1; y_pix mid-frame.
    xm = np.full((B, H, W), 2.0 * (W - 1) / W - 1.0, np.float32)
    ym = np.zeros((B, H, W), np.float32)

    ref = np.asarray(bilinear_sample(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym)))
    got = np.asarray(
        bilinear_sample_pallas(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym),
                               y_band=8, x_band=128, interpret=True)
    )
    assert np.all(ref == 0.0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_window_guard_falls_back_on_pathological_map():
    """A map whose per-tile spread exceeds the DMA window must produce the
    XLA result (via the guarded fallback), never silent zeros."""
    rng = np.random.RandomState(2)
    B, H, W, C = 1, 16, 256, 1
    im = rng.rand(B, H, W, C).astype(np.float32) + 0.5    # bounded away from 0
    # Alternate samples between the far-left and far-right of the input
    # within every tile: spread ~W >> x_band.
    gy = np.linspace(-1, 1, H, dtype=np.float32)
    xm = np.where(np.arange(W) % 2 == 0, -0.9, 0.9)[None, None, :]
    xm = np.broadcast_to(xm, (B, H, W)).astype(np.float32)
    ym = np.broadcast_to(gy[None, :, None] * 0.9, (B, H, W)).astype(np.float32)

    ref = np.asarray(bilinear_sample(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym)))
    got = np.asarray(
        bilinear_sample_pallas(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym),
                               y_band=8, x_band=128, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert np.abs(ref).max() > 0.1      # the map really does hit bright pixels

    # Sanity: with the guard disabled the same call WOULD lose samples
    # (documents why the guard exists).
    unguarded = np.asarray(
        bilinear_sample_pallas(jnp.asarray(im), jnp.asarray(xm), jnp.asarray(ym),
                               y_band=8, x_band=128, interpret=True, guard=False)
    )
    assert np.abs(unguarded - ref).max() > 0.1


def test_uint8_path_non_aligned_and_guarded():
    """Production uint8 channels-first path at a non-tile-aligned size."""
    from stabnet_tpu.ops.pallas_warp import warp_uint8_cf

    rng = np.random.RandomState(4)
    B, H, W, C = 1, 120, 192, 3
    im = rng.randint(0, 256, (B, H, W, C), dtype=np.uint8)
    gx = np.linspace(-1, 1, W, dtype=np.float32)
    gy = np.linspace(-1, 1, H, dtype=np.float32)
    xg, yg = np.meshgrid(gx, gy)
    xm = (xg * 0.93 - 0.02)[None].astype(np.float32)
    ym = (yg * 0.93 + 0.01)[None].astype(np.float32)

    ref = np.asarray(bilinear_sample(jnp.asarray(im, jnp.float32),
                                     jnp.asarray(xm), jnp.asarray(ym)))
    ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    imc = jnp.asarray(np.moveaxis(im, -1, 1))
    got = np.asarray(
        warp_uint8_cf(imc, jnp.asarray(xm), jnp.asarray(ym),
                      y_band=32, x_band=128, interpret=True, exact=True)
    )
    np.testing.assert_array_equal(got, ref_u8)


@pytest.mark.parametrize("out_hw", [
    (110, 180),      # non-integer ratio -> tiled-einsum branch
    (120, 192),      # exact 5x/4x up -> polyphase elementwise branch
])
def test_lowres_fused_upsample_matches_two_stage(out_hw):
    """warp_uint8_cf_lowres (map up-sample fused into the tiled layout) ==
    resize_bilinear to full res + warp_uint8_cf, at a NON-tile-aligned
    output size.  Rounding: NDC->pixel scaling happens before vs after the
    resize matmuls, so allow one uint8 LSB."""
    from stabnet_tpu.ops.pallas_warp import warp_uint8_cf, warp_uint8_cf_lowres
    from stabnet_tpu.ops.resize import resize_bilinear_bhw

    rng = np.random.RandomState(5)
    B, H, W = 2, 120, 192
    Ho, Wo = out_hw
    h, w = 24, 48
    im = rng.randint(0, 256, (B, H, W, 3), dtype=np.uint8)
    gx = np.linspace(-1, 1, w, dtype=np.float32)
    gy = np.linspace(-1, 1, h, dtype=np.float32)
    xg, yg = np.meshgrid(gx, gy)
    xm_lr = np.stack([xg * 0.93 - 0.02 + 0.03 * np.sin(yg * 2 + b)
                      for b in range(B)]).astype(np.float32)
    ym_lr = np.stack([yg * 0.9 + 0.01 + 0.02 * np.cos(xg * 3 + b)
                      for b in range(B)]).astype(np.float32)

    imc = jnp.asarray(np.moveaxis(im, -1, 1))
    xm_f = resize_bilinear_bhw(jnp.asarray(xm_lr), (Ho, Wo))
    ym_f = resize_bilinear_bhw(jnp.asarray(ym_lr), (Ho, Wo))
    ref = np.asarray(warp_uint8_cf(imc, xm_f, ym_f, y_band=32, x_band=128,
                                   interpret=True, exact=True))
    got = np.asarray(
        warp_uint8_cf_lowres(imc, jnp.asarray(xm_lr), jnp.asarray(ym_lr),
                             (Ho, Wo), y_band=32, x_band=128, interpret=True,
                             exact=True))
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1
    # and the overwhelming majority of pixels agree exactly
    assert (got == ref).mean() > 0.999


def test_lowres_fused_guard_falls_back():
    """Pathological low-res maps (per-tile spread >> window) must still take
    the guarded XLA fallback, matching the two-stage reference result."""
    from stabnet_tpu.ops.pallas_warp import warp_uint8_cf_lowres
    from stabnet_tpu.ops.resize import resize_bilinear_bhw
    from stabnet_tpu.ops.warp import bilinear_sample

    rng = np.random.RandomState(6)
    B, H, W = 1, 64, 256
    Ho, Wo = 64, 256
    h, w = 16, 64
    im = rng.randint(0, 256, (B, H, W, 3), dtype=np.uint8)
    # Mirror-flip map: x spans the whole image within each tile row.
    gx = np.linspace(1, -1, w, dtype=np.float32)
    gy = np.linspace(-1, 1, h, dtype=np.float32)
    xg, yg = np.meshgrid(gx, gy)
    xm_lr = (xg * 0.95)[None].astype(np.float32)
    ym_lr = (yg * 0.95)[None].astype(np.float32)

    xm_f = resize_bilinear_bhw(jnp.asarray(xm_lr), (Ho, Wo))
    ym_f = resize_bilinear_bhw(jnp.asarray(ym_lr), (Ho, Wo))
    ref = np.asarray(bilinear_sample(jnp.asarray(im, jnp.float32), xm_f, ym_f))
    ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    imc = jnp.asarray(np.moveaxis(im, -1, 1))
    got = np.asarray(
        warp_uint8_cf_lowres(imc, jnp.asarray(xm_lr), jnp.asarray(ym_lr),
                             (Ho, Wo), y_band=8, x_band=16, interpret=True,
                             exact=True))
    assert np.abs(got.astype(np.int32) - ref_u8.astype(np.int32)).max() <= 1


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


def test_splat_matches_xla_adjoint():
    """bilinear_splat_pallas == the XLA autodiff's scatter-based d/d image,
    including out-of-frame coordinates and non-tile-multiple outputs."""
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 48, 64, 2
    Ho, Wo = 40, 56
    im = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    ys, xs = np.mgrid[0:Ho, 0:Wo].astype(np.float32)
    xm = jnp.asarray(np.stack(
        [(2 * (xs + rng.randn() * 2) / W - 1) * 1.06 for _ in range(B)]
    ).astype(np.float32))
    ym = jnp.asarray(np.stack(
        [(2 * (ys + rng.randn() * 2) / H - 1) * 1.06 for _ in range(B)]
    ).astype(np.float32))
    g = jnp.asarray(rng.rand(B, Ho, Wo, C).astype(np.float32))

    _, vjp = jax.vjp(lambda im_: warp.bilinear_sample(im_, xm, ym), im)
    ref = np.asarray(vjp(g)[0])
    got = np.asarray(pallas_warp.bilinear_splat_pallas(g, xm, ym, (H, W)))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_const_maps_vjp_matches_xla():
    """grad through bilinear_sample_pallas_const_maps == grad through the
    XLA sampler wrt the image (the temporal-loss configuration)."""
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 48, 64, 1
    im = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    xm = jnp.asarray((2 * (xs + 1.3) / W - 1)[None].repeat(B, 0))
    ym = jnp.asarray((2 * (ys - 0.7) / H - 1)[None].repeat(B, 0))

    f_p = lambda im_: jnp.sum(
        jnp.sin(pallas_warp.bilinear_sample_pallas_const_maps(im_, xm, ym)))
    f_x = lambda im_: jnp.sum(jnp.sin(warp.bilinear_sample(im_, xm, ym)))
    gp = np.asarray(jax.grad(f_p)(im))
    gx = np.asarray(jax.grad(f_x)(im))
    np.testing.assert_allclose(gp, gx, atol=2e-6)


def test_interpret_resolved_before_jit_cache(monkeypatch):
    """A trace cached under one interpret_default must NOT satisfy a later
    call under the other value (regression: interpret=None was the static
    cache key and the global was read at trace time, so a CPU build host
    that traced the warp before exporting baked the ~100x interpreter
    lowering into the 'full-performance' TPU artifact)."""
    rng = np.random.RandomState(3)
    B, H, W, C = 1, 8, 128, 1
    im = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xm = jnp.asarray((np.linspace(-1, 1, W, dtype=np.float32) * 0.9)
                     [None, None].repeat(H, 1))
    ym = jnp.asarray((np.linspace(-1, 1, H, dtype=np.float32) * 0.9)
                     [None, :, None].repeat(W, 2))

    with pallas_warp.interpret_default(True):
        pallas_warp.bilinear_sample_pallas(im, xm, ym, y_band=8, x_band=128,
                                           guard=False)  # cache a True trace

    seen = []
    real = pallas_warp.pl.pallas_call

    def spy(*args, **kwargs):
        seen.append(kwargs.get("interpret"))
        return real(*args, **kwargs)

    monkeypatch.setattr(pallas_warp.pl, "pallas_call", spy)
    with pallas_warp.interpret_default(False):
        try:
            pallas_warp.bilinear_sample_pallas(im, xm, ym, y_band=8,
                                               x_band=128, guard=False)
        except Exception:
            # Mosaic may not COMPILE on a CPU-only host; the trace (which is
            # what records `interpret`) has already happened by then.
            pass
    assert seen and all(v is False for v in seen), seen


def test_interpret_default_is_context_local():
    """The override composes across threads: a forced value in one thread
    must not leak into another thread's resolution."""
    import threading

    results = {}

    def probe(name):
        results[name] = pallas_warp._default_interpret()

    ambient = pallas_warp._default_interpret()
    with pallas_warp.interpret_default(not ambient):
        assert pallas_warp._default_interpret() == (not ambient)
        t = threading.Thread(target=probe, args=("other",))
        t.start()
        t.join()
    # The sibling thread saw the ambient default, not this thread's override.
    assert results["other"] == ambient
    assert pallas_warp._default_interpret() == ambient
