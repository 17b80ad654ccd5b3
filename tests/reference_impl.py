"""NumPy oracle of the reference StabNet math, used as golden truth in tests.

Implements, directly from the published algorithm semantics (reference files
spatial_transformer3.py, s_net_bundle_nobm.py, deploy_bundle.py), the exact
numerics the TPU framework must reproduce:

  * 4-point DLT with Tikhonov-regularized 8x8 inverse,
  * per-cell projective map generation over a linspace NDC grid with the
    sign-eps divide guard,
  * out-of-bounds black mask,
  * bilinear sampling with clamp-to-edge and clamped-corner weights,
  * theta -> clamped mesh vertices, per-cell corner bundles,
  * distortion / consistency / black-position losses,
  * feature-match flow gather.

Everything here is plain NumPy written top-down from the math; it exists so the
JAX implementation is validated against an independent executable description.
"""

from __future__ import annotations

import numpy as np


# --- homography ---------------------------------------------------------------

def ref_solve_dlt(src: np.ndarray, dst: np.ndarray, eps: float = 1e-4) -> np.ndarray:
    """src, dst: (4, 2) -> (3, 3) with H[2,2] = 1.  Mirrors get_H."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    A = np.zeros((8, 8), np.float32)
    b = np.zeros((8,), np.float32)
    for k in range(4):
        A[k] = [x[k], y[k], 1, 0, 0, 0, -x[k] * u[k], -y[k] * u[k]]
        A[4 + k] = [0, 0, 0, x[k], y[k], 1, -x[k] * v[k], -y[k] * v[k]]
        b[k] = u[k]
        b[4 + k] = v[k]
    h = np.linalg.inv(A + np.eye(8, dtype=np.float32) * eps) @ b
    return np.concatenate([h, [1.0]]).reshape(3, 3).astype(np.float32)


def ref_mesh_to_hs(mesh: np.ndarray, grid_h: int, grid_w: int) -> np.ndarray:
    """mesh: (gh+1, gw+1, 2) -> (gh, gw, 3, 3).  Mirrors get_Hs."""
    h = 2.0 / grid_h
    w = 2.0 / grid_w
    out = np.zeros((grid_h, grid_w, 3, 3), np.float32)
    for i in range(grid_h):
        for j in range(grid_w):
            hh = i * h - 1
            ww = j * w - 1
            src = np.array(
                [[ww, hh], [ww + w, hh], [ww, hh + h], [ww + w, hh + h]], np.float32
            )
            dst = np.stack(
                [mesh[i, j], mesh[i, j + 1], mesh[i + 1, j], mesh[i + 1, j + 1]]
            ).astype(np.float32)
            out[i, j] = ref_solve_dlt(src, dst)
    return out


# --- dense maps ---------------------------------------------------------------

def ref_dense_maps(Hs: np.ndarray, height: int, width: int):
    """Hs: (gh, gw, 3, 3) -> x_map, y_map each (height, width).

    Mirrors _transform3's per-cell loop with last-cell extension and the
    sign-eps z guard.
    """
    grid_h, grid_w = Hs.shape[:2]
    gh = height // grid_h
    gw = width // grid_w
    xs = np.linspace(-1.0, 1.0, width, dtype=np.float32)
    ys = np.linspace(-1.0, 1.0, height, dtype=np.float32)
    x_map = np.zeros((height, width), np.float32)
    y_map = np.zeros((height, width), np.float32)
    for i in range(grid_h):
        for j in range(grid_w):
            sh, eh = i * gh, (i + 1) * gh - 1
            sw, ew = j * gw, (j + 1) * gw - 1
            if i == grid_h - 1:
                eh = height - 1
            if j == grid_w - 1:
                ew = width - 1
            xg, yg = np.meshgrid(xs[sw : ew + 1], ys[sh : eh + 1])
            pts = np.stack([xg.ravel(), yg.ravel(), np.ones_like(xg).ravel()])
            T = Hs[i, j] @ pts
            z = T[2]
            sign = np.where(z >= 0, 1.0, -1.0).astype(np.float32)
            z = z + sign * 1e-8
            x_map[sh : eh + 1, sw : ew + 1] = (T[0] / z).reshape(xg.shape)
            y_map[sh : eh + 1, sw : ew + 1] = (T[1] / z).reshape(xg.shape)
    return x_map, y_map


def ref_black_mask(x_map: np.ndarray, y_map: np.ndarray) -> np.ndarray:
    oob = (x_map < -1) | (x_map > 1) | (y_map < -1) | (y_map > 1)
    return oob.astype(np.float32)


# --- bilinear sampling --------------------------------------------------------

def ref_bilinear_sample(im: np.ndarray, x_ndc: np.ndarray, y_ndc: np.ndarray):
    """im: (H, W, C); x_ndc, y_ndc: (Ho, Wo) -> (Ho, Wo, C).  Mirrors _interpolate."""
    H, W, C = im.shape
    x = (x_ndc.astype(np.float32) + 1.0) * W / 2.0
    y = (y_ndc.astype(np.float32) + 1.0) * H / 2.0
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    x1 = x0 + 1
    y1 = y0 + 1
    x0c = np.clip(x0, 0, W - 1)
    x1c = np.clip(x1, 0, W - 1)
    y0c = np.clip(y0, 0, H - 1)
    y1c = np.clip(y1, 0, H - 1)
    Ia = im[y0c, x0c]
    Ib = im[y1c, x0c]
    Ic = im[y0c, x1c]
    Id = im[y1c, x1c]
    x0f, x1f = x0c.astype(np.float32), x1c.astype(np.float32)
    y0f, y1f = y0c.astype(np.float32), y1c.astype(np.float32)
    wa = ((x1f - x) * (y1f - y))[..., None]
    wb = ((x1f - x) * (y - y0f))[..., None]
    wc = ((x - x0f) * (y1f - y))[..., None]
    wd = ((x - x0f) * (y - y0f))[..., None]
    return wa * Ia + wb * Ib + wc * Ic + wd * Id


# --- mesh geometry ------------------------------------------------------------

def ref_theta_to_mesh(theta: np.ndarray, grid_h: int, grid_w: int,
                      do_crop_rate: float) -> np.ndarray:
    """theta: ((gh+1)*(gw+1)*2,) -> (gh+1, gw+1, 2).  Mirrors get_4_pts pts2."""
    h = 2.0 / grid_h
    w = 2.0 / grid_w
    mesh = np.zeros((grid_h + 1, grid_w + 1, 2), np.float32)
    tot = 0
    bound = 1.0 / do_crop_rate
    for i in range(grid_h + 1):
        for j in range(grid_w + 1):
            p = np.array([j * w - 1, i * h - 1], np.float32)
            p = p + theta[tot * 2 : tot * 2 + 2]
            tot += 1
            mesh[i, j] = np.clip(p, -bound, bound)
    return mesh


def ref_cell_pts(mesh: np.ndarray) -> np.ndarray:
    """mesh: (gh+1, gw+1, 2) -> pts1 (gh, gw, 8).  Mirrors get_4_pts pts1."""
    gh, gw = mesh.shape[0] - 1, mesh.shape[1] - 1
    out = np.zeros((gh, gw, 8), np.float32)
    for i in range(gh):
        for j in range(gw):
            quad = [mesh[i, j], mesh[i, j + 1], mesh[i + 1, j], mesh[i + 1, j + 1]]
            xs = [q[0] for q in quad]
            ys = [q[1] for q in quad]
            out[i, j] = np.array(xs + ys, np.float32)
    return out


# --- losses -------------------------------------------------------------------

def ref_black_pos(pts1: np.ndarray, do_crop_rate: float) -> np.ndarray:
    """Hinge on cell corner coordinates beyond +/- 1/do_crop_rate.

    pts1: (gh, gw, 8) -> flattened hinge violations.  Mirrors get_black_pos.
    """
    bound = 1.0 / do_crop_rate
    over = np.where(pts1 > bound, pts1 - bound, 0.0)
    under = np.where(pts1 < -bound, -bound - pts1, 0.0)
    return (over + under).reshape(-1)


def ref_distortion_loss(pts1: np.ndarray, grid_h: int, grid_w: int) -> float:
    """Right-angle rigidity over 8 triangle orientations.  Mirrors
    get_distortion_loss/calc_distortion_loss for a single example."""
    h = 2.0 / grid_h
    w = 2.0 / grid_w
    pts = pts1.reshape(-1, 2, 4)  # rows: x, y; cols: tl, tr, bl, br
    p = [pts[:, :, k : k + 1] for k in range(4)]

    def rot(k, clock):
        if not clock:
            return np.array([[0, -k], [k, 0]], np.float32)
        return np.array([[0, k], [-k, 0]], np.float32)

    def term(p0, p1, p2, clock, hw):
        k = (h / w) if hw == 0 else (w / h)
        R = rot(k, clock)
        d = np.abs(np.einsum("ab,nbk->nak", R, p1 - p0) - (p2 - p1))
        return d * d

    loss = (
        term(p[0], p[1], p[3], 0, 0)
        + term(p[1], p[3], p[2], 0, 1)
        + term(p[3], p[2], p[0], 0, 0)
        + term(p[2], p[0], p[1], 0, 1)
        + term(p[1], p[0], p[2], 1, 0)
        + term(p[0], p[2], p[3], 1, 1)
        + term(p[2], p[3], p[1], 1, 0)
        + term(p[3], p[1], p[0], 1, 1)
    )
    return float(np.mean(loss) / 8.0)


def ref_consistency_loss(mesh: np.ndarray) -> float:
    """Second-difference mesh smoothness.  Mirrors get_consistency_loss for a
    single example (each interior triple is counted twice, as in the
    reference's forward+backward enumeration)."""
    gh, gw = mesh.shape[0] - 1, mesh.shape[1] - 1
    errs = []
    for i in range(gh + 1):
        for j in range(gw + 1):
            if i > 1:
                errs.append(np.abs(2 * mesh[i - 1, j] - mesh[i, j] - mesh[i - 2, j]))
            if j > 1:
                errs.append(np.abs(2 * mesh[i, j - 1] - mesh[i, j] - mesh[i, j - 2]))
            if i < gh - 1:
                errs.append(np.abs(2 * mesh[i + 1, j] - mesh[i, j] - mesh[i + 2, j]))
            if j < gw - 1:
                errs.append(np.abs(2 * mesh[i, j + 1] - mesh[i, j] - mesh[i, j + 2]))
    e = np.stack(errs)
    return float(np.mean(e * e))


def ref_warp_pts(pts: np.ndarray, flow: np.ndarray, height: int, width: int):
    """Gather the dense map at match coordinates.  Mirrors warp_pts for one
    example.  pts: (N, 2) NDC; flow: (height, width, 2) -> (N, 2)."""
    x = np.clip((pts[:, 0] + 1) / 2 * width, 0, width - 1)
    x = np.round(x).astype(np.int64)
    y = np.clip((pts[:, 1] + 1) / 2 * height, 0, height - 1)
    y = np.round(y).astype(np.int64)
    flat = flow.reshape(-1, 2)
    return flat[x + y * width]


def ref_masked_mse(err: np.ndarray, keep: np.ndarray) -> float:
    """Masked MSE normalized per-sample by kept-pixel count, then batch mean.

    err, keep: (B, H, W, 1).  Mirrors the img/temp loss normalization
    (s_net_bundle_nobm.py:347-352, train_bundle_nobm.py:115-126)."""
    e = err * keep
    num = np.sum(e * e, axis=(1, 2, 3))
    den = np.sum(keep, axis=(1, 2, 3)) + 1e-8
    return float(np.mean(num / den))
