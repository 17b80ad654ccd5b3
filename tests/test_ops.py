"""Golden tests: JAX warp ops vs. the NumPy reference oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stabnet_tpu.ops import (
    bilinear_sample,
    black_mask,
    cell_pts,
    dense_maps,
    mesh_to_homographies,
    solve_dlt,
    theta_to_mesh,
    transformer,
)
from tests import reference_impl as ref


RNG = np.random.RandomState(0)


def rand_mesh(batch, grid_h, grid_w, scale=0.08):
    base = np.stack(
        np.meshgrid(
            np.linspace(-1, 1, grid_w + 1, dtype=np.float32),
            np.linspace(-1, 1, grid_h + 1, dtype=np.float32),
        ),
        axis=-1,
    )  # (gh+1, gw+1, 2) with (x, y)
    jitter = RNG.uniform(-scale, scale, (batch,) + base.shape).astype(np.float32)
    return base[None] + jitter


class TestSolveDLT:
    def test_identity(self):
        src = np.array([[-1, -1], [1, -1], [-1, 1], [1, 1]], np.float32)
        H = solve_dlt(jnp.asarray(src), jnp.asarray(src))
        np.testing.assert_allclose(np.asarray(H), np.eye(3), atol=2e-4)

    def test_matches_oracle_batch(self):
        src = np.array([[-1, -1], [0, -1], [-1, 0], [0, 0]], np.float32)
        dst = src[None] + RNG.uniform(-0.2, 0.2, (6, 4, 2)).astype(np.float32)
        H = np.asarray(solve_dlt(jnp.broadcast_to(src, dst.shape), jnp.asarray(dst)))
        for b in range(dst.shape[0]):
            expected = ref.ref_solve_dlt(src, dst[b])
            np.testing.assert_allclose(H[b], expected, rtol=1e-4, atol=1e-5)

    def test_maps_corners(self):
        src = np.array([[-1, -1], [1, -1], [-1, 1], [1, 1]], np.float32)
        dst = src + RNG.uniform(-0.3, 0.3, (4, 2)).astype(np.float32)
        H = np.asarray(solve_dlt(jnp.asarray(src), jnp.asarray(dst)))
        pts = np.concatenate([src, np.ones((4, 1), np.float32)], axis=1)
        q = (H @ pts.T).T
        got = q[:, :2] / q[:, 2:3]
        np.testing.assert_allclose(got, dst, atol=1e-3)

    def test_portable_solver_matches_default(self):
        """The export-path Gauss-Jordan solver (`portable_solve`) agrees
        with the default LAPACK/LU path to solver roundoff on a batch of
        mesh-like systems."""
        from stabnet_tpu.ops.homography import portable_solve

        src = np.array([[-1, -1], [0, -1], [-1, 0], [0, 0]], np.float32)
        dst = src[None] + RNG.uniform(-0.3, 0.3, (64, 4, 2)).astype(np.float32)
        srcs = jnp.broadcast_to(src, dst.shape)
        H_default = np.asarray(solve_dlt(srcs, jnp.asarray(dst)))
        with portable_solve():
            H_portable = np.asarray(
                jax.jit(solve_dlt)(srcs, jnp.asarray(dst)))
        np.testing.assert_allclose(H_portable, H_default, rtol=2e-4,
                                   atol=2e-5)


class TestMeshToHomographies:
    @pytest.mark.parametrize("grid", [(4, 4), (2, 3)])
    def test_matches_oracle(self, grid):
        gh, gw = grid
        mesh = rand_mesh(3, gh, gw)
        Hs = np.asarray(mesh_to_homographies(jnp.asarray(mesh), gh, gw))
        for b in range(mesh.shape[0]):
            expected = ref.ref_mesh_to_hs(mesh[b], gh, gw)
            np.testing.assert_allclose(Hs[b], expected, rtol=2e-4, atol=2e-5)


class TestDenseMaps:
    @pytest.mark.parametrize(
        "hw,grid",
        [((48, 64), (4, 4)),    # divisible (einsum path)
         ((50, 67), (4, 4)),    # non-divisible (gather path, last-cell extension)
         ((48, 64), (2, 3))],
    )
    def test_matches_oracle(self, hw, grid):
        H, W = hw
        gh, gw = grid
        mesh = rand_mesh(2, gh, gw)
        Hs = np.asarray(mesh_to_homographies(jnp.asarray(mesh), gh, gw))
        xm, ym = dense_maps(jnp.asarray(Hs), H, W)
        for b in range(mesh.shape[0]):
            ex, ey = ref.ref_dense_maps(Hs[b], H, W)
            np.testing.assert_allclose(np.asarray(xm)[b], ex, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(ym)[b], ey, rtol=1e-5, atol=1e-5)

    def test_identity_mesh_interior_clear(self):
        # The +1e-4*I DLT regularizer (reference pinv) leaves the identity
        # mesh's map a hair off identity, so exact-boundary pixels may read
        # just outside [-1, 1].  Interior must be clear and the map near-exact.
        mesh = rand_mesh(1, 4, 4, scale=0.0)
        Hs = mesh_to_homographies(jnp.asarray(mesh), 4, 4)
        xm, ym = dense_maps(Hs, 48, 64)
        black = np.asarray(black_mask(xm, ym))
        assert black[0, 1:-1, 1:-1].sum() == 0.0
        xs = np.linspace(-1, 1, 64, dtype=np.float32)
        ys = np.linspace(-1, 1, 48, dtype=np.float32)
        np.testing.assert_allclose(np.asarray(xm)[0], np.tile(xs, (48, 1)), atol=5e-4)
        np.testing.assert_allclose(np.asarray(ym)[0], np.tile(ys[:, None], (1, 64)), atol=5e-4)


class TestBilinearSample:
    def test_matches_oracle(self):
        im = RNG.rand(2, 24, 32, 3).astype(np.float32)
        xn = RNG.uniform(-1.3, 1.3, (2, 24, 32)).astype(np.float32)
        yn = RNG.uniform(-1.3, 1.3, (2, 24, 32)).astype(np.float32)
        out = np.asarray(bilinear_sample(jnp.asarray(im), jnp.asarray(xn), jnp.asarray(yn)))
        for b in range(2):
            expected = ref.ref_bilinear_sample(im[b], xn[b], yn[b])
            np.testing.assert_allclose(out[b], expected, rtol=1e-4, atol=1e-5)

    def test_identity_map_near_identity(self):
        # The reference's (x+1)*W/2 scaling makes the "identity" NDC grid map to
        # px * W/(W-1): a slight stretch.  Interior pixels remain close.
        im = RNG.rand(1, 33, 65, 1).astype(np.float32)
        xs = np.linspace(-1, 1, 65, dtype=np.float32)
        ys = np.linspace(-1, 1, 33, dtype=np.float32)
        xg, yg = np.meshgrid(xs, ys)
        out = np.asarray(
            bilinear_sample(jnp.asarray(im), jnp.asarray(xg[None]), jnp.asarray(yg[None]))
        )
        expected = ref.ref_bilinear_sample(im[0], xg, yg)
        np.testing.assert_allclose(out[0], expected, rtol=1e-4, atol=1e-5)


class TestMeshOps:
    def test_theta_to_mesh_matches_oracle(self):
        theta = RNG.uniform(-0.6, 0.6, (3, 50)).astype(np.float32)
        mesh = np.asarray(theta_to_mesh(jnp.asarray(theta), 4, 4, 0.8))
        for b in range(3):
            expected = ref.ref_theta_to_mesh(theta[b], 4, 4, 0.8)
            np.testing.assert_allclose(mesh[b], expected, atol=1e-6)

    def test_cell_pts_matches_oracle(self):
        mesh = rand_mesh(2, 4, 4)
        pts1 = np.asarray(cell_pts(jnp.asarray(mesh)))
        for b in range(2):
            expected = ref.ref_cell_pts(mesh[b])
            np.testing.assert_allclose(pts1[b], expected, atol=1e-6)


class TestTransformer:
    def test_end_to_end_matches_oracle(self):
        H, W, gh, gw = 48, 64, 4, 4
        im = RNG.rand(2, H, W, 1).astype(np.float32)
        mesh = rand_mesh(2, gh, gw)
        res = transformer(jnp.asarray(im), jnp.asarray(mesh), gh, gw)
        for b in range(2):
            Hs = ref.ref_mesh_to_hs(mesh[b], gh, gw)
            xm, ym = ref.ref_dense_maps(Hs, H, W)
            black = ref.ref_black_mask(xm, ym)
            out = ref.ref_bilinear_sample(im[b], xm, ym)
            np.testing.assert_allclose(np.asarray(res.x_map)[b], xm, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(res.y_map)[b], ym, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(res.black_pix)[b], black, atol=1e-6)
            np.testing.assert_allclose(np.asarray(res.output)[b], out, rtol=1e-4, atol=1e-4)

    def test_jit_compiles(self):
        im = jnp.zeros((1, 48, 64, 1), jnp.float32)
        mesh = jnp.asarray(rand_mesh(1, 4, 4))
        f = jax.jit(lambda u, m: transformer(u, m, 4, 4).output)
        out = f(im, mesh)
        assert out.shape == (1, 48, 64, 1)
