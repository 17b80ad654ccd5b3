"""Loss terms vs. the NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from stabnet_tpu import losses
from stabnet_tpu.config import get_config
from tests import reference_impl as ref

RNG = np.random.RandomState(1)


def rand_mesh(batch, gh, gw, scale=0.15):
    base = np.stack(
        np.meshgrid(
            np.linspace(-1, 1, gw + 1, dtype=np.float32),
            np.linspace(-1, 1, gh + 1, dtype=np.float32),
        ),
        axis=-1,
    )
    return base[None] + RNG.uniform(-scale, scale, (batch,) + base.shape).astype(
        np.float32
    )


def test_black_pos_loss():
    mesh = rand_mesh(4, 4, 4, scale=0.6)
    pts1 = np.stack([ref.ref_cell_pts(m) for m in mesh])
    got = float(losses.black_pos_loss(jnp.asarray(pts1), 0.8))
    hinges = np.stack([ref.ref_black_pos(p, 0.8) for p in pts1])
    np.testing.assert_allclose(got, np.mean(hinges**2), rtol=1e-5)


def test_distortion_loss():
    mesh = rand_mesh(3, 4, 4)
    pts1 = np.stack([ref.ref_cell_pts(m) for m in mesh])
    got = float(losses.distortion_loss(jnp.asarray(pts1), 4, 4))
    expected = np.mean([ref.ref_distortion_loss(p, 4, 4) for p in pts1])
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_distortion_loss_zero_for_rigid_mesh():
    mesh = rand_mesh(1, 4, 4, scale=0.0) * 0.7 + 0.05  # scaled+shifted: rigid
    pts1 = np.stack([ref.ref_cell_pts(m) for m in mesh])
    got = float(losses.distortion_loss(jnp.asarray(pts1), 4, 4))
    assert got < 1e-10


def test_consistency_loss():
    mesh = rand_mesh(3, 4, 4)
    got = float(losses.consistency_loss(jnp.asarray(mesh)))
    expected = np.mean([ref.ref_consistency_loss(m) for m in mesh])
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_consistency_loss_zero_for_affine_mesh():
    mesh = rand_mesh(1, 4, 4, scale=0.0) * 0.8 + 0.1
    got = float(losses.consistency_loss(jnp.asarray(mesh)))
    assert got < 1e-12


def test_warp_pts():
    H, W, N = 24, 32, 17
    xm = RNG.rand(2, H, W).astype(np.float32)
    ym = RNG.rand(2, H, W).astype(np.float32)
    pts = RNG.uniform(-1.2, 1.2, (2, N, 2)).astype(np.float32)
    got = np.asarray(losses.warp_pts(jnp.asarray(pts), jnp.asarray(xm), jnp.asarray(ym)))
    for b in range(2):
        flow = np.stack([xm[b], ym[b]], axis=-1)
        expected = ref.ref_warp_pts(pts[b], flow, H, W)
        np.testing.assert_allclose(got[b], expected, atol=1e-6)


def test_feature_loss_masked_mean():
    H, W, N = 16, 16, 8
    xm = np.tile(np.linspace(-1, 1, W, dtype=np.float32), (2, H, 1))
    ym = np.tile(np.linspace(-1, 1, H, dtype=np.float32)[:, None], (2, 1, W))
    matches = RNG.uniform(-0.9, 0.9, (2, N, 4)).astype(np.float32)
    mask = (RNG.rand(2, N) > 0.3).astype(np.float32)
    got = float(
        losses.feature_loss(
            jnp.asarray(matches), jnp.asarray(mask), jnp.asarray(xm), jnp.asarray(ym)
        )
    )
    accs = []
    for b in range(2):
        flow = np.stack([xm[b], ym[b]], axis=-1)
        warped = ref.ref_warp_pts(matches[b, :, :2], flow, H, W)
        per = np.sum(np.abs(warped - matches[b, :, 2:]), axis=1)
        accs.append(np.sum(per * mask[b]) / max(np.sum(mask[b]), 1))
    np.testing.assert_allclose(got, np.mean(accs), rtol=1e-5)


def test_img_loss_matches_oracle():
    out = RNG.rand(2, 8, 8, 1).astype(np.float32)
    y = RNG.rand(2, 8, 8, 1).astype(np.float32)
    black = (RNG.rand(2, 8, 8) > 0.7).astype(np.float32)
    got = float(losses.img_loss(jnp.asarray(out), jnp.asarray(y), jnp.asarray(black)))
    expected = ref.ref_masked_mse(out - y, (1 - black)[..., None])
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_total_loss_gates():
    cfg = get_config("tiny")
    terms = {
        "id": jnp.asarray(0.3),
        "img": jnp.asarray(1.0),
        "regu": jnp.asarray(2.0),
        "black": jnp.asarray(3.0),
        "distortion": jnp.asarray(4.0),
        "consistency": jnp.asarray(5.0),
        "feature": jnp.asarray(6.0),
    }
    # theta_only=1 keeps only the theta term.
    only = float(losses.total_loss(terms, cfg, use_black=jnp.asarray(1.0),
                                   use_theta_only=jnp.asarray(1.0)))
    np.testing.assert_allclose(
        only, 0.3 * cfg.id_mul * (cfg.theta_mul + cfg.grid_theta_mul), rtol=1e-6
    )
    # black gate removes exactly the black term.
    full = float(losses.total_loss(terms, cfg, use_black=jnp.asarray(1.0),
                                   use_theta_only=jnp.asarray(0.0)))
    noblack = float(losses.total_loss(terms, cfg, use_black=jnp.asarray(0.0),
                                      use_theta_only=jnp.asarray(0.0)))
    np.testing.assert_allclose(full - noblack, 3.0 * cfg.black_mul, rtol=1e-5)
