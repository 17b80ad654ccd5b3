"""Strict-parity modes: the f32 trunk knob, bf16 quantization bounds, and
the full v2_93 geometry against the NumPy oracle.

Round-2 verdict items: `compute_dtype` (config.py:88) — the knob real-
checkpoint parity needs — had no test, and every oracle test ran tiny
shapes.  Reference anchors: spatial_transformer3.py:144-198 (warp numerics
at 288x512), s_net_bundle_nobm.py:250-264 (theta head).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stabnet_tpu.config import get_config
from stabnet_tpu.models import forward, init_variables, make_model
from tests import reference_impl as ref

CFG = get_config("tiny")


def _theta(cfg, seed=0):
    """Forward a fixed random input; return (theta, full warp result)."""
    model = make_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(7))
    x = jax.random.uniform(jax.random.PRNGKey(seed),
                           (1, cfg.height, cfg.width, cfg.in_channels),
                           jnp.float32, -1.0, 1.0)
    out = forward(model, variables, x, cfg, train=False)
    return out


@pytest.mark.slow
def test_f32_mode_runs_and_bounds_bf16_quantization():
    """compute_dtype='float32' is a live, working knob; the bf16 default's
    theta quantization against it is small and bounded.

    The recorded bound is what the TF-checkpoint converter gate will face:
    a reference f32 checkpoint served through the bf16 trunk moves theta by
    at most this much (tanh-bounded theta is O(0.1), so 0.05 absolute is
    the documented ceiling; observed ~1e-2 on random weights).
    """
    out32 = _theta(CFG.replace(compute_dtype="float32"))
    out16 = _theta(CFG.replace(compute_dtype="bfloat16"))
    t32 = np.asarray(out32.theta)
    t16 = np.asarray(out16.theta)
    assert t32.dtype == np.float32
    # The knob is live: bf16 rounding must actually change the activations.
    assert np.any(t32 != t16)
    assert np.abs(t32 - t16).max() < 0.05, np.abs(t32 - t16).max()
    # The warp consumes theta in f32 either way; mesh moves proportionally.
    m32, m16 = np.asarray(out32.mesh), np.asarray(out16.mesh)
    assert np.abs(m32 - m16).max() < 0.05, np.abs(m32 - m16).max()


@pytest.mark.slow
def test_f32_params_dtype_unchanged():
    """Params are f32 storage under BOTH modes (bf16 is compute-only)."""
    for dt in ("float32", "bfloat16"):
        cfg = CFG.replace(compute_dtype=dt)
        variables = init_variables(make_model(cfg), cfg, jax.random.PRNGKey(0))
        leaves = jax.tree_util.tree_leaves(variables["params"])
        assert all(l.dtype == jnp.float32 for l in leaves), dt


@pytest.mark.slow
def test_full_geometry_forward_vs_oracle():
    """End-to-end forward at the FULL 288x512 v2_93 geometry, f32 trunk,
    warp outputs checked against the NumPy oracle from the model's own
    theta.  (The fast-tier oracle tests run tiny shapes; this closes the
    production-geometry gap.)  Tolerances: maps/theta chains through one
    batched DLT solve + einsum, 1e-4 relative holds at 512 wide.
    """
    cfg = get_config("v2_93").replace(compute_dtype="float32")
    out = _theta(cfg, seed=3)
    H, W, gh, gw = cfg.height, cfg.width, cfg.grid_h, cfg.grid_w

    theta = np.asarray(out.theta[0], np.float32)
    mesh_ref = ref.ref_theta_to_mesh(theta, gh, gw, cfg.do_crop_rate)
    np.testing.assert_allclose(np.asarray(out.mesh)[0], mesh_ref, atol=1e-5)

    Hs = ref.ref_mesh_to_hs(mesh_ref, gh, gw)
    xm, ym = ref.ref_dense_maps(Hs, H, W)
    # Random-weights theta can put a projective pole near a cell: there the
    # map blows up to O(100) NDC and f32 summation-order differences amplify
    # (observed: 37/147k pixels, |map| ~ 800, rel diff 3e-3).  Those pixels
    # are beyond the black-mask bound and never sampled, so the sampled
    # region (|map| <= 1.5) is what parity is about.
    sampled = (np.abs(xm) <= 1.5) & (np.abs(ym) <= 1.5)
    assert sampled.mean() > 0.5  # the check still covers most of the frame
    np.testing.assert_allclose(np.asarray(out.warp.x_map)[0][sampled],
                               xm[sampled], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.warp.y_map)[0][sampled],
                               ym[sampled], rtol=1e-4, atol=1e-4)
    black = ref.ref_black_mask(xm, ym)
    # Pole-adjacent pixels can flip across the |map| > 1 threshold between
    # the two f32 evaluation orders; allow a handful.
    assert (np.asarray(out.warp.black_pix)[0] != black).mean() < 1e-3
    pts1_ref = ref.ref_cell_pts(mesh_ref)
    np.testing.assert_allclose(np.asarray(out.pts1)[0], pts1_ref, atol=1e-5)
