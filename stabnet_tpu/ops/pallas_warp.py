"""Fused Pallas TPU kernel for bilinear map resampling (the warp hot loop).

Why: XLA lowers per-pixel gathers on TPU to a serial dynamic-slice loop —
measured ~22 ms for a 720p 3-channel warp on v5e, ~100x off the roofline.
This kernel reformulates the gather as per-tile ONE-HOT MATMULS on the MXU.

Layout trick: each (8, 128) output tile's sampling coordinates are
pre-flattened OUTSIDE the kernel into a (1, 1024) lane vector (Mosaic cannot
reshape (8,128)->(1024,1) in-kernel, but XLA can lay the arrays out any way
we like).  Per tile and channel the kernel then:

  1. DMAs a (YB, XB) input window (dynamic, 128-aligned base) from HBM into
     VMEM, then lane-ROLLS it so column 0 is the tile's minimum sample — the
     weight span XW only pays for the true per-tile spread, not the up-to-127
     columns the DMA alignment wastes,
  2. builds the horizontal interpolation matrix Wh (XW, 1024) with the "hat"
     identity  weight(col c) = max(0, 1 - |x - c|) * [0 <= x <= W-1]
     — exactly the reference's two clamped-corner taps, including the
     cancellation to zero outside the frame (spatial_transformer3.py:85-122);
     the validity factor is folded into the relative coordinate,
  3. contracts G = win @ Wh on the MXU -> (YB, 1024): every band row
     horizontally interpolated at every output pixel,
  4. applies the vertical hat weights elementwise and reduces over the band.

One MXU contraction per (tile, channel); channels share the weight matrices.

Window bounds: each tile addresses a (YB rows, XW cols) sample region.  For
stabilization meshes (vertex offsets clamped to +/-1/do_crop_rate, rigidity
losses) the per-tile spread is below the defaults, but nothing is allowed to
fail silently: a per-tile spread check (`_windows_ok`, computed on the exact
tiled coordinates the kernel sees) gates the fast tier; overflowing maps run
a 4x-taller/2x-wider second Pallas tier, and only beyond that does the call
fall back to the pure-XLA `ops.warp.bilinear_sample` (slow but window-free).
The XLA path also remains the training sampler (where image gradients are
needed).
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_W = 128

# How `interpret=None` resolves.  None -> follow the host backend (the
# default); True/False -> forced by `interpret_default` during an AOT trace.
# A ContextVar so concurrent exports/traces in other threads (or nested
# contexts) never leak the forced value into each other.
_INTERPRET_DEFAULT: contextvars.ContextVar = contextvars.ContextVar(
    "stabnet_pallas_interpret_default", default=None)


@contextlib.contextmanager
def interpret_default(value: Optional[bool]):
    """Force how `interpret=None` resolves inside this context.

    `interpret=None` normally follows the HOST backend, which is wrong when
    lowering for a DIFFERENT platform via `jax.export(platforms=...)`: a CPU
    build host exporting a TPU artifact must emit the Mosaic kernels
    (interpret=False), not bake the interpreter lowering into the artifact
    (stream/export.py uses this; the interpreter path serializes as a serial
    dynamic-slice emulation ~100x off the kernel's speed)."""
    token = _INTERPRET_DEFAULT.set(value)
    try:
        yield
    finally:
        _INTERPRET_DEFAULT.reset(token)


def _default_interpret() -> bool:
    override = _INTERPRET_DEFAULT.get()
    if override is not None:
        return override
    # Placement-aware, not process-default-aware: under a
    # jax.default_device(cpu) pin in a TPU process the kernel lowers for
    # the CPU device, where only interpret mode exists.
    from stabnet_tpu.utils.platforms import placement_platform

    return placement_platform() not in ("tpu", "axon")


def _ceil_mult(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _warp_band_kernel(xmin_ref, ymin_ref, x_ref, y_ref, im_hbm, out_ref,
                      win2, sem2, *,
                      H: int, W: int, YW: int, YB: int, XW: int, XB: int,
                      C: int, ntw: int, exact: bool, out_uint8: bool,
                      strict_edge: bool):
    """One ROW of output tiles per grid step, double-buffered window DMAs.

    Maps/outputs arrive as (1, 1, ntw, ., N) blocks — one flattened lane
    vector per (tile_h, tile_w) tile.  The per-tile structure:

    x handling: the DMA base must be 128-aligned (Mosaic lane-dim slicing
    constraint), which would waste up to 127 columns of weight span.  Instead
    the kernel DMAs a wider aligned window (XB >= XW + 128), then lane-ROLLS
    it so column 0 lands exactly on the tile's minimum sample — the hat
    weight matrix then only spans XW columns (the true per-tile spread),
    which is what the O(XW * N) weight build and the MXU contraction pay for.

    y handling mirrors it on the sublane dim: the DMA base must be 8-aligned
    (sublane-unaligned dynamic window bases do not compile — measured on
    v5e), so the window carries YB = YW + 8 rows; a dynamic SUBLANE roll
    shifts row 0 onto the tile's minimum sample row and a static slice keeps
    the true YW-row spread.  The payoff is the MXU contraction's M dim:
    C*YW = 96 at the production config (tile_h 24, y-span 32) is ONE 128-row
    MXU pass, where C*YB = 120-144 variants needed more rows or two passes.

    Grid/DMA structure: a per-tile grid pays the window-DMA issue+complete
    latency serially on every step (measured ~1.1 ms of the 6.4 ms 720p
    call).  Here the grid is (B, nth) and the ntw column tiles run in a
    statically unrolled loop with TWO window buffers: tile j+1's DMA is
    issued before tile j is processed, so the copy engine runs a tile ahead
    of the VPU/MXU and the latency is hidden.

    Per-tile minimum sample coordinates (the DMA window bases) arrive as
    SMEM scalars computed OUTSIDE the kernel: XLA fuses the (B, nth, ntw)
    min-reduction into the map-producing computation nearly for free, where
    the in-kernel version paid floor/cast/clip passes plus two cross-lane
    reductions per tile — twice (once when issuing the look-ahead DMA, once
    in the body).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    Hp_im = _ceil_mult(H, 8)
    Wp_im = _ceil_mult(W, 128)

    def bounds(j):
        xmin = xmin_ref[0, i, j]
        ymin = ymin_ref[0, i, j]
        ybase = jnp.maximum(jnp.minimum(ymin & ~7, Hp_im - YB), 0)
        xbase = jnp.maximum(jnp.minimum(xmin & ~127, Wp_im - XB), 0)
        ybase = pl.multiple_of(ybase, 8)
        xbase = pl.multiple_of(xbase, 128)
        return xmin, ymin, ybase, xbase

    copies = [None, None]
    binfo = [None, None]

    def issue(j):
        info = bounds(j)
        _, _, ybase, xbase = info
        slot = j % 2
        c = pltpu.make_async_copy(
            im_hbm.at[b, :, pl.ds(ybase, YB), pl.ds(xbase, XB)],
            win2.at[slot],
            sem2.at[slot],
        )
        c.start()
        copies[slot] = c
        binfo[slot] = info

    issue(0)
    for j in range(ntw):
        xmin, ymin, ybase, xbase = binfo[j % 2]
        if j + 1 < ntw:
            issue(j + 1)

        x = x_ref[0, 0, j]                        # (1, N) pixel-space x
        y = y_ref[0, 0, j]
        xroll = xmin - xbase                      # in [0, XB-1]
        yroll = ymin - ybase                      # in [0, YB-1]
        N = x.shape[-1]

        # Validity: for coords >= size-1 or < 0 the reference's
        # clamped-corner taps cancel to exactly zero (x0c == x1c makes both
        # weights vanish at x == W-1 too — hence the STRICT upper bound; see
        # test_pallas_warp).  strict_edge=False keeps the edge pixel at
        # exactly-integer edge coords; the custom-VJP backward uses it to
        # fetch corner taps.  Validity is FOLDED INTO the relative
        # coordinate (invalid -> far outside the hat support) instead of
        # multiplying the weight matrices: one (1, N) select replaces an
        # (XB, N) multiply.
        if strict_edge:
            vx = (x >= 0.0) & (x < W - 1)
            vy = (y >= 0.0) & (y < H - 1)
        else:
            vx = (x >= 0.0) & (x <= W - 1)
            vy = (y >= 0.0) & (y <= H - 1)

        xrel = jnp.where(vx, x - xmin.astype(jnp.float32), -4.0)   # (1, N)
        yrel = jnp.where(vy, y - ymin.astype(jnp.float32), -4.0)

        cols = jax.lax.broadcasted_iota(
            jnp.int32, (XW, N), 0).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (YW, N), 0).astype(jnp.float32)

        # Horizontal / vertical interpolation matrices.  In the non-exact
        # (uint8 output) path the weights are built in bf16: halves the VMEM
        # footprint of the (XW, N) matrix — the weight quantization (~2^-8
        # relative) stays below one uint8 LSB after rounding.
        wdt = jnp.float32 if exact else jnp.bfloat16
        Wh = jnp.maximum(0.0, 1.0 - jnp.abs(xrel - cols)).astype(wdt)
        Wv = jnp.maximum(0.0, 1.0 - jnp.abs(yrel - rows))          # (YW, N)

        copies[j % 2].wait()

        # All channels share the weights, so stack them along the sublane
        # dim and run ONE MXU contraction per tile: (C*YW, XW) @ (XW, N).
        # Two dynamic rolls compact the aligned DMA window onto the true
        # per-tile spread first:
        #   * SUBLANE roll by yroll so row 0 == image row ymin, then a
        #     static YW-row slice per channel.  Rows wrapped across channel
        #     boundaries by the flat roll land at k >= YB - yroll, where the
        #     vertical hat weight is identically zero (needed rows satisfy
        #     k <= YB-1-yroll by the window-coverage construction), so the
        #     garbage never contributes.
        #   * LANE roll so column 0 == image column xmin, then keep the
        #     XW-wide span the weights address; columns past the tile's max
        #     sample carry zero horizontal weight.
        # Mosaic's dynamic rotate is 32-bit only, so uint8 windows are cast
        # to i32 first (no direct u8->f32 cast exists anyway).  Shifts must
        # be NON-NEGATIVE: Mosaic lowers negative dynamic LANE rotates
        # incorrectly across lane registers (verified on v5e: roll(w, -s) is
        # wrong for every s in [1, 127] on a 384-wide array; roll(w, M - s)
        # is exact), so both rolls use the M - s form.
        w = win2[j % 2].reshape(C * YB, XB)
        if w.dtype != jnp.float32:
            w = w.astype(jnp.int32)
        w = pltpu.roll(w, C * YB - yroll, axis=0)
        if YW < YB:
            w = jnp.concatenate(
                [w[c * YB:c * YB + YW] for c in range(C)], axis=0)
        w = pltpu.roll(w, XB - xroll, axis=1)[:, :XW]
        w = w.astype(jnp.float32)
        if not exact:
            w = w.astype(jnp.bfloat16)
        G = jax.lax.dot_general(
            w, Wh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if exact
                       else jax.lax.Precision.DEFAULT),
        )                                         # (C*YW, TILE_N)
        outs = [jnp.sum(G[c * YW:(c + 1) * YW] * Wv, axis=0, keepdims=True)
                for c in range(C)]
        vals = jnp.concatenate(outs, axis=0)      # (C, TILE_N)
        if out_uint8:
            # Mosaic has no direct f32->u8 cast; round+clip then go through
            # int32.
            vals = jnp.clip(jnp.round(vals), 0.0, 255.0)
            vals = vals.astype(jnp.int32).astype(jnp.uint8)
        out_ref[0, 0, j] = vals


def _windows_ok(x_pix: jax.Array, y_pix: jax.Array, H: int, W: int,
                y_span: int, x_span: int) -> jax.Array:
    """True iff every tile's bilinear taps fit its weight spans.

    Mirrors the band kernel exactly: both windows are roll-aligned to the
    per-tile minimum sample (lane roll in x, sublane roll in y), so both
    conditions are purely extent-based (max tap - min tap < span).  Inputs
    are the exact tiled (B, nth, ntw, 1, N) pixel-coordinate arrays handed
    to the kernel.
    """
    x0 = jnp.floor(x_pix).astype(jnp.int32)
    y0 = jnp.floor(y_pix).astype(jnp.int32)
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)
    ok_x = jnp.max(x1c, axis=-1) - jnp.min(x0c, axis=-1) <= x_span - 1
    ok_y = jnp.max(y1c, axis=-1) - jnp.min(y0c, axis=-1) <= y_span - 1
    return jnp.all(ok_x & ok_y)


def _sample_core(imc: jax.Array, x_ndc: jax.Array, y_ndc: jax.Array,
                 y_band: int, x_band: int, interpret: Optional[bool],
                 tile_h: int, exact: bool, out_uint8: bool,
                 tile_w: int = TILE_W, guard: bool = True,
                 strict_edge: bool = True) -> jax.Array:
    """Shared core: channels-first image (B, C, H, W), any sample dtype.

    y_band / x_band are the per-tile WEIGHT SPANS (max - min sample across a
    tile, rows / columns); the DMA window is automatically (y_band + 8,
    x_band + 128-rounded) to absorb the (8, 128)-alignment of its base, then
    roll-compacted back onto the spans in-kernel.  tile_w trades
    MXU/VPU work against span: a narrower tile needs a narrower span (the
    weight build is O(span) per output pixel) at the cost of more grid
    programs.  tile_h * tile_w must be a multiple of 128 (the flattened tile
    is a lane vector).

    Guard structure (no silent zeros, no silent slow paths): the per-tile
    sample spread is checked against (y_band, x_band) on the exact tiled
    coordinates the kernel sees; when exceeded, a second Pallas tier with a
    4x-taller / 2x-wider window runs; only if even that overflows does the
    call fall back to the window-free pure-XLA sampler."""
    B, C, H, W = imc.shape
    TILE_H = tile_h
    TILE_Wl = tile_w
    TILE_N = TILE_H * TILE_Wl
    assert TILE_N % 128 == 0, (tile_h, tile_w)
    Ho, Wo = x_ndc.shape[1], x_ndc.shape[2]
    x_ndc0, y_ndc0 = x_ndc, y_ndc          # unpadded, for the guard fallback

    # Pad output to tile multiples and flatten each tile to a lane vector.
    # Padding must REPLICATE the border coordinates (mode="edge"): zero-padded
    # NDC samples would sit at the image center and, in edge tiles mixing real
    # and padded pixels, pull the per-tile min (the DMA window base) away from
    # the real samples — silently zeroing real output rows/columns.
    pho = (-Ho) % TILE_H
    pwo = (-Wo) % TILE_Wl
    if pho or pwo:
        x_ndc = jnp.pad(x_ndc, ((0, 0), (0, pho), (0, pwo)), mode="edge")
        y_ndc = jnp.pad(y_ndc, ((0, 0), (0, pho), (0, pwo)), mode="edge")
    Hp, Wp = Ho + pho, Wo + pwo
    nth, ntw = Hp // TILE_H, Wp // TILE_Wl

    def tile_flatten(m):                    # (B, Hp, Wp) -> (B, nth, ntw, 1, 1024)
        m = m.reshape(B, nth, TILE_H, ntw, TILE_Wl)
        return m.transpose(0, 1, 3, 2, 4).reshape(B, nth, ntw, 1, TILE_N)

    x_pix = tile_flatten((x_ndc.astype(jnp.float32) + 1.0) * (W / 2.0))
    y_pix = tile_flatten((y_ndc.astype(jnp.float32) + 1.0) * (H / 2.0))

    def fallback():
        # Window-free (and slow) pure-XLA sampler; only taken when some
        # tile's sample spread exceeds even the widest-tier window.
        from stabnet_tpu.ops import warp as xla_warp

        im_cl = jnp.moveaxis(imc[:, :, :H, :W], 1, -1).astype(jnp.float32)
        out = xla_warp.bilinear_sample(im_cl, x_ndc0, y_ndc0)
        if out_uint8:
            return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)
        return out.astype(jnp.float32)

    return _sample_core_tiled(imc, x_pix, y_pix, (Ho, Wo), y_band, x_band,
                              interpret, tile_h, exact, out_uint8, tile_w,
                              guard, strict_edge, fallback)


def _sample_core_tiled(imc: jax.Array, x_pix: jax.Array, y_pix: jax.Array,
                       out_hw: Tuple[int, int], y_band: int, x_band: int,
                       interpret: Optional[bool], tile_h: int, exact: bool,
                       out_uint8: bool, tile_w: int, guard: bool,
                       strict_edge: bool, fallback) -> jax.Array:
    """Kernel launch + guard tiers on PRE-TILED pixel maps.

    x_pix, y_pix: (B, nth, ntw, 1, tile_h * tile_w) pixel-space sample
    coordinates, one flattened lane vector per output tile (the layout
    `_warp_kernel` consumes).  `fallback` is a thunk producing the output via
    the window-free XLA sampler (taken only when every tier's window
    overflows)."""
    B, C, H, W = imc.shape
    TILE_H, TILE_Wl = tile_h, tile_w
    TILE_N = TILE_H * TILE_Wl
    Ho, Wo = out_hw
    nth, ntw = x_pix.shape[1], x_pix.shape[2]
    Hp, Wp = nth * TILE_H, ntw * TILE_Wl
    if interpret is None:
        interpret = _default_interpret()

    # Pad the input so DMA windows can be tiling-aligned; sample indices are
    # clamped to the ORIGINAL extent, so the padding is never read as data.
    Hp_im = _ceil_mult(H, 8)
    Wp_im = _ceil_mult(W, 128)
    if (Hp_im, Wp_im) != (H, W):
        imc = jnp.pad(imc, ((0, 0), (0, 0), (0, Hp_im - H), (0, Wp_im - W)))

    YW = min(_ceil_mult(y_band, 8), Hp_im)
    XW = min(_ceil_mult(x_band, 8), Wp_im)

    # Per-tile window bases, computed where XLA can fuse them into the
    # map-producing computation (the in-kernel equivalent cost two cross-lane
    # min reductions per tile, twice each — see `_warp_band_kernel`).
    xmin_t = jnp.min(jnp.clip(jnp.floor(x_pix).astype(jnp.int32), 0, W - 1),
                     axis=(-2, -1))                       # (B, nth, ntw)
    ymin_t = jnp.min(jnp.clip(jnp.floor(y_pix).astype(jnp.int32), 0, H - 1),
                     axis=(-2, -1))

    grid = (B, nth)
    out_dtype = jnp.uint8 if out_uint8 else jnp.float32

    def make_run(yw, xw):
        # DMA windows: weight span + base alignment (up to 7 rows sublane,
        # up to 127 columns lane), compacted back to the span in-kernel by
        # the two dynamic rolls.
        yb = min(yw + 8, Hp_im)
        xb = min(_ceil_mult(xw + 128, 128), Wp_im)
        kernel = functools.partial(_warp_band_kernel, H=H, W=W, YW=yw, YB=yb,
                                   XW=xw, XB=xb, C=C, ntw=ntw, exact=exact,
                                   out_uint8=out_uint8,
                                   strict_edge=strict_edge)

        def run_pallas():
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    # SMEM blocks must span the trailing two dims whole; the
                    # table is tiny (nth*ntw i32), so each step takes all of
                    # batch b's rows and indexes [0, program_id(1), j].
                    pl.BlockSpec((1, nth, ntw), lambda b, i: (b, 0, 0),
                                 memory_space=pltpu.SMEM),   # xmin per tile
                    pl.BlockSpec((1, nth, ntw), lambda b, i: (b, 0, 0),
                                 memory_space=pltpu.SMEM),   # ymin per tile
                    pl.BlockSpec((1, 1, ntw, 1, TILE_N),
                                 lambda b, i: (b, i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, ntw, 1, TILE_N),
                                 lambda b, i: (b, i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),     # full (B, C, H, W)
                ],
                out_specs=pl.BlockSpec((1, 1, ntw, C, TILE_N),
                                       lambda b, i: (b, i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, nth, ntw, C, TILE_N),
                                               out_dtype),
                scratch_shapes=[
                    pltpu.VMEM((2, C, yb, xb), imc.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                # Raising the scoped-vmem limit measurably hurts Mosaic's
                # pipelining; only do it when the weights are genuinely large.
                compiler_params=(
                    pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
                    if TILE_N * xb * 4 > 2 * 1024 * 1024
                    else pltpu.CompilerParams()
                ),
                interpret=interpret,
            )(xmin_t, ymin_t, x_pix, y_pix, imc)

            # (B, nth, ntw, C, 1024) -> (B, Ho, Wo, C)
            out = out.reshape(B, nth, ntw, C, TILE_H, TILE_Wl)
            out = out.transpose(0, 1, 4, 2, 5, 3).reshape(B, Hp, Wp, C)
            return out[:, :Ho, :Wo, :]

        return run_pallas

    if not guard:
        return make_run(YW, XW)()

    # Window tiers.  Tier 1 is sized for converged-model meshes (local warp
    # stretch ~= 1); tier 2 covers strong meshes at ~1.5-2x the cost; tier 3
    # covers near-pathological stretches (the vertex clamp is
    # +/-1/do_crop_rate NDC) at ~3-4x.  Only beyond that does the call drop
    # to the serial-gather XLA sampler.  The kernel cost scales with the
    # window, so each tier only pays for the spread class it serves; the
    # per-tile spread checks below share subexpressions under one jit.
    tiers = []
    for yw, xw in ((YW, XW), (2 * YW, XW + 64), (4 * YW, XW + 160)):
        yw = min(_ceil_mult(yw, 8), Hp_im)
        xw = min(_ceil_mult(xw, 8), Wp_im)
        if (yw, xw) not in tiers:
            tiers.append((yw, xw))

    def chain(remaining):
        if not remaining:
            return fallback
        (yw, xw) = remaining[0]
        ok = _windows_ok(x_pix, y_pix, H, W, yw, xw)
        return lambda: jax.lax.cond(ok, make_run(yw, xw), chain(remaining[1:]))

    return chain(tiers)()


def bilinear_sample_pallas(im: jax.Array, x_ndc: jax.Array, y_ndc: jax.Array,
                           y_band: int = 24, x_band: int = 80,
                           interpret: Optional[bool] = None,
                           tile_h: int = 16, tile_w: int = 64,
                           exact: bool = True, guard: bool = True,
                           strict_edge: bool = True) -> jax.Array:
    """Drop-in fast path for `ops.warp.bilinear_sample` (inference only).

    Args:
      im: (B, H, W, C) float32 input images.
      x_ndc, y_ndc: (B, Ho, Wo) NDC sample maps ((x+1)*W/2 pixel convention).
      y_band: per-tile vertical weight SPAN (max - min sample row across a
        tile); the DMA window is y_band + 8 rows, roll-compacted in-kernel.
      x_band: per-tile horizontal weight SPAN (max - min sample column across
        a tile); the DMA window is x_band + 128 wide and roll-compacted
        in-kernel.
      tile_h: output rows per kernel program (8 or 16).
      exact: HIGHEST-precision matmuls (f32-faithful, ~1e-6 vs the XLA path).
        With False the MXU runs bf16 passes (~1e-3 relative) — fine when the
        result is rounded to uint8 (the production color warp), 2x faster.
      guard: check every tile's sample spread against the window; on overflow
        run a 4x/2x wider Pallas tier, then the window-free XLA sampler (no
        silent zeros).  Only disable when the caller guarantees in-window
        maps.

    Returns:
      (B, Ho, Wo, C) sampled images, numerically equal to the XLA path
      (matmul rounding ~1e-6, boundary semantics included).
    """
    # Resolve interpret BEFORE the jit boundary: `None` must not be the
    # static cache key, or a trace cached under one interpret_default wins
    # silently over a later context with the other value (a CPU build host
    # that traced before exporting would bake the ~100x interpreter lowering
    # into the artifact).
    if interpret is None:
        interpret = _default_interpret()
    return _bilinear_sample_pallas_jit(im, x_ndc, y_ndc, y_band, x_band,
                                       interpret, tile_h, tile_w, exact,
                                       guard, strict_edge)


@functools.partial(
    jax.jit,
    static_argnames=("y_band", "x_band", "interpret", "tile_h", "tile_w",
                     "exact", "guard", "strict_edge"),
)
def _bilinear_sample_pallas_jit(im, x_ndc, y_ndc, y_band, x_band,
                                interpret: bool, tile_h, tile_w, exact,
                                guard, strict_edge) -> jax.Array:
    imc = jnp.moveaxis(im.astype(jnp.float32), -1, 1)      # (B, C, H, W)
    return _sample_core(imc, x_ndc, y_ndc, y_band, x_band, interpret,
                        tile_h, exact, out_uint8=False, tile_w=tile_w,
                        guard=guard, strict_edge=strict_edge)


def warp_uint8_cf(imc: jax.Array, x_ndc: jax.Array, y_ndc: jax.Array,
                  y_band: int = 32, x_band: int = 96,
                  interpret: Optional[bool] = None,
                  tile_h: int = 24, tile_w: int = 64,
                  exact: bool = False, guard: bool = True) -> jax.Array:
    """Production color path: channels-FIRST uint8 in, uint8 out.

    Avoids the 11 MB/frame f32 cast + layout transpose inside the streaming
    loop: the caller pre-transposes whole clips to (B, C, H, W) uint8 once,
    windows are DMA'd as uint8 (4x less traffic) and cast on-chip, and
    rounding to uint8 happens in the kernel epilogue.

    Returns (B, Ho, Wo, C) uint8.
    """
    assert imc.dtype == jnp.uint8
    if interpret is None:
        interpret = _default_interpret()  # resolve before the jit cache key
    return _warp_uint8_cf_jit(imc, x_ndc, y_ndc, y_band, x_band, interpret,
                              tile_h, tile_w, exact, guard)


@functools.partial(
    jax.jit,
    static_argnames=("y_band", "x_band", "interpret", "tile_h", "tile_w",
                     "exact", "guard"),
)
def _warp_uint8_cf_jit(imc, x_ndc, y_ndc, y_band, x_band, interpret: bool,
                       tile_h, tile_w, exact, guard) -> jax.Array:
    return _sample_core(imc, x_ndc, y_ndc, y_band, x_band, interpret,
                        tile_h, exact, out_uint8=True, tile_w=tile_w,
                        guard=guard)


@functools.lru_cache(maxsize=None)
def _tiled_resize_mat(n_in: int, n_out: int, tile: int) -> np.ndarray:
    """(ceil(n_out/tile)*tile, n_in) bilinear resize rows, edge-replicated.

    Rows beyond n_out repeat row n_out-1 — identical to up-sampling to n_out
    and then padding the result with mode="edge" (the tile-padding semantics
    `_sample_core` uses), but baked into the static matrix so the padded map
    never materializes.
    """
    from stabnet_tpu.ops.resize import resize_matrix

    n_pad = _ceil_mult(n_out, tile)
    M = resize_matrix(n_in, n_out)
    if n_pad > n_out:
        M = np.concatenate([M, np.repeat(M[-1:], n_pad - n_out, axis=0)])
    return M


def warp_uint8_cf_lowres(imc: jax.Array, x_ndc_lr: jax.Array,
                         y_ndc_lr: jax.Array, out_hw: Tuple[int, int],
                         y_band: int = 32, x_band: int = 96,
                         interpret: Optional[bool] = None,
                         tile_h: int = 24, tile_w: int = 64,
                         exact: bool = False, guard: bool = True) -> jax.Array:
    """`warp_uint8_cf` fused with the map up-sample (the production path).

    The streaming color warp's full-resolution sample maps are a bilinear
    UP-SAMPLE of the low-passed model-scale maps (deploy_bundle.py:136-146
    smooths then scales).  Materializing them costs two (B, Ho, Wo) f32
    intermediates plus the tile-flatten transpose — pure HBM traffic.  Here
    the up-sample lands DIRECTLY in the kernel's tiled lane-vector layout:
    the resize matrices are reshaped per-tile so two einsums emit
    (B, nth, ntw, 1, N) pixel coordinates, and no full-resolution map or
    transpose pass ever exists.

    Args:
      imc: (B, C, H, W) uint8 channels-first full-res frames.
      x_ndc_lr, y_ndc_lr: (B, h, w) LOW-RES NDC maps (e.g. model scale / 4).
      out_hw: output size (Ho, Wo).

    Returns (B, Ho, Wo, C) uint8; equal to up-sampling the maps with
    `resize_bilinear_bhw` and calling `warp_uint8_cf` (rounding aside).
    """
    assert imc.dtype == jnp.uint8
    if interpret is None:
        interpret = _default_interpret()  # resolve before the jit cache key
    return _warp_uint8_cf_lowres_jit(imc, x_ndc_lr, y_ndc_lr, out_hw, y_band,
                                     x_band, interpret, tile_h, tile_w, exact,
                                     guard)


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "y_band", "x_band", "interpret", "tile_h",
                     "tile_w", "exact", "guard"),
)
def _warp_uint8_cf_lowres_jit(imc, x_ndc_lr, y_ndc_lr, out_hw, y_band, x_band,
                              interpret: bool, tile_h, tile_w, exact,
                              guard) -> jax.Array:
    B, C, H, W = imc.shape
    Ho, Wo = out_hw
    w_lr = x_ndc_lr.shape[2]
    TILE_N = tile_h * tile_w
    assert TILE_N % 128 == 0, (tile_h, tile_w)

    # NDC -> pixel BEFORE the up-sample: resize rows are convex (sum to 1),
    # so the affine rescale commutes, and the low-res map is the cheap place
    # to pay it.
    xs = (x_ndc_lr.astype(jnp.float32) + 1.0) * (W / 2.0)
    ys = (y_ndc_lr.astype(jnp.float32) + 1.0) * (H / 2.0)

    Hp = _ceil_mult(Ho, tile_h)
    Wp = _ceil_mult(Wo, tile_w)
    nth, ntw = Hp // tile_h, Wp // tile_w
    h_lr = x_ndc_lr.shape[1]

    # The static resize matrices are reshaped per output tile so two einsums
    # emit the tiled layout directly (no full-res intermediate or separate
    # transpose pass).  Negative result (measured on v5e, do not re-try): a
    # 2-tap elementwise polyphase up-sample + transpose loses to these
    # einsums (7.50 vs 6.79 ms at S=8/720p) — the per-phase select creates
    # r-lane intermediates that Mosaic/XLA lay out poorly, while the MXU
    # eats the dense contraction below its own roofline.
    Rr = jnp.asarray(_tiled_resize_mat(h_lr, Ho, tile_h))
    Rc = jnp.asarray(
        _tiled_resize_mat(w_lr, Wo, tile_w).reshape(ntw, tile_w, w_lr))

    def tiled_maps(m):                  # (B, h, w) -> (B, nth, ntw, 1, N)
        t = jnp.einsum("Oa,Baw->BOw", Rr, m,
                       precision=jax.lax.Precision.HIGHEST)
        t = t.reshape(B, nth, tile_h, w_lr)
        t = jnp.einsum("jJw,BiIw->BijIJ", Rc, t,
                       precision=jax.lax.Precision.HIGHEST)
        return t.reshape(B, nth, ntw, 1, TILE_N)

    x_pix = tiled_maps(xs)
    y_pix = tiled_maps(ys)

    def fallback():
        from stabnet_tpu.ops import warp as xla_warp
        from stabnet_tpu.ops.resize import resize_bilinear_bhw

        xf = resize_bilinear_bhw(x_ndc_lr.astype(jnp.float32), (Ho, Wo))
        yf = resize_bilinear_bhw(y_ndc_lr.astype(jnp.float32), (Ho, Wo))
        im_cl = jnp.moveaxis(imc, 1, -1).astype(jnp.float32)
        out = xla_warp.bilinear_sample(im_cl, xf, yf)
        return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)

    return _sample_core_tiled(imc, x_pix, y_pix, (Ho, Wo), y_band, x_band,
                              interpret, tile_h, exact, True, tile_w, guard,
                              True, fallback)


# --- adjoint (splat) kernel: d out / d image at fixed maps --------------------

def _splat_kernel(x_ref, y_ref, g_ref, acc_in, out_hbm, win, sem, *,
                  H: int, W: int, YB: int, XW: int, XB: int, C: int):
    """Accumulate one output tile's cotangent into its image window.

    The adjoint of `_warp_kernel`'s G = win @ Wh, out = sum(G * Wv):
    d win = (Wv * g) @ Wh^T, rolled back to the window's aligned columns and
    added to the image-cotangent buffer in HBM.  The TPU grid is sequential,
    so the read-modify-write of overlapping windows between neighboring
    tiles is race-free (both DMAs complete inside each grid step).
    """
    x = x_ref[0, 0, 0]
    y = y_ref[0, 0, 0]
    N = x.shape[-1]

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0c = jnp.clip(x0, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)

    Hp_im = _ceil_mult(H, 8)
    Wp_im = _ceil_mult(W, 128)
    xmin = jnp.min(x0c)
    ybase = jnp.maximum(jnp.minimum(jnp.min(y0c) & ~7, Hp_im - YB), 0)
    xbase = jnp.maximum(jnp.minimum(xmin & ~127, Wp_im - XB), 0)
    ybase = pl.multiple_of(ybase, 8)
    xbase = pl.multiple_of(xbase, 128)
    xroll = xmin - xbase

    b = pl.program_id(0)
    read = pltpu.make_async_copy(
        out_hbm.at[b, :, pl.ds(ybase, YB), pl.ds(xbase, XB)], win, sem)
    read.start()

    # Weights exactly as the forward builds them (validity folded into the
    # relative coordinate; strict upper bound = the clamped-corner
    # cancellation, so the adjoint matches the XLA autodiff's scatter).
    vx = (x >= 0.0) & (x < W - 1)
    vy = (y >= 0.0) & (y < H - 1)
    xrel = jnp.where(vx, x - xmin.astype(jnp.float32), -4.0)
    yrel = jnp.where(vy, y - ybase.astype(jnp.float32), -4.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (XW, N), 0).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (YB, N), 0).astype(jnp.float32)
    Wh = jnp.maximum(0.0, 1.0 - jnp.abs(xrel - cols))              # (XW, N)
    Wv = jnp.maximum(0.0, 1.0 - jnp.abs(yrel - rows))              # (YB, N)

    g = g_ref[0, 0, 0]                                             # (C, N)
    # A[c*YB + r, n] = Wv[r, n] * g[c, n]  (channels share Wv).
    A = (Wv[None] * g[:, None, :]).reshape(C * YB, N)
    contrib = jax.lax.dot_general(
        A, Wh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                              # (C*YB, XW)
    if XB > XW:
        contrib = jnp.concatenate(
            [contrib, jnp.zeros((C * YB, XB - XW), jnp.float32)], axis=1)
    contrib = pltpu.roll(contrib, xroll, axis=1)
    read.wait()
    win[:] = win[:] + contrib.reshape(C, YB, XB)
    write = pltpu.make_async_copy(
        win, out_hbm.at[b, :, pl.ds(ybase, YB), pl.ds(xbase, XB)], sem)
    write.start()
    write.wait()


def bilinear_splat_pallas(g: jax.Array, x_ndc: jax.Array, y_ndc: jax.Array,
                          im_hw: Tuple[int, int], y_band: int = 48,
                          x_band: int = 152,
                          interpret: Optional[bool] = None,
                          tile_h: int = 32, tile_w: int = 128,
                          guard: bool = True) -> jax.Array:
    """Adjoint of `bilinear_sample_pallas`: splat cotangents into the image.

    Args:
      g: (B, Ho, Wo, C) output cotangent.
      x_ndc, y_ndc: the SAME (B, Ho, Wo) sample maps as the forward.
      im_hw: (H, W) of the image whose cotangent to produce.

    Returns:
      (B, H, W, C) image cotangent, equal to the XLA autodiff's
      scatter-based d/d image (matmul rounding aside).

    XLA lowers the scatter to a serial loop on TPU (measured ~120 ms for the
    batch-10 288p temporal-loss warp); this kernel reformulates it as the
    transposed one-hot matmul per tile, accumulating windows in HBM across
    the (sequential) grid.
    """
    if interpret is None:
        interpret = _default_interpret()  # resolve before the jit cache key
    return _bilinear_splat_pallas_jit(g, x_ndc, y_ndc, im_hw, y_band, x_band,
                                      interpret, tile_h, tile_w, guard)


@functools.partial(
    jax.jit,
    static_argnames=("im_hw", "y_band", "x_band", "interpret", "tile_h",
                     "tile_w", "guard"),
)
def _bilinear_splat_pallas_jit(g, x_ndc, y_ndc, im_hw, y_band, x_band,
                               interpret: bool, tile_h, tile_w,
                               guard) -> jax.Array:
    H, W = im_hw
    B, Ho, Wo, C = g.shape
    TILE_N = tile_h * tile_w
    assert TILE_N % 128 == 0, (tile_h, tile_w)
    g0, x_ndc0, y_ndc0 = g, x_ndc, y_ndc

    Hp_im = _ceil_mult(H, 8)
    Wp_im = _ceil_mult(W, 128)
    YB = min(_ceil_mult(y_band, 8), Hp_im)
    XW = min(_ceil_mult(x_band, 8), Wp_im)

    pho = (-Ho) % tile_h
    pwo = (-Wo) % tile_w
    if pho or pwo:
        # Maps replicate (window coherence); cotangents pad with ZEROS so
        # padded lanes splat nothing.
        x_ndc = jnp.pad(x_ndc, ((0, 0), (0, pho), (0, pwo)), mode="edge")
        y_ndc = jnp.pad(y_ndc, ((0, 0), (0, pho), (0, pwo)), mode="edge")
        g = jnp.pad(g, ((0, 0), (0, pho), (0, pwo), (0, 0)))
    Hp, Wp = Ho + pho, Wo + pwo
    nth, ntw = Hp // tile_h, Wp // tile_w

    def tile_flatten(m):
        m = m.reshape(B, nth, tile_h, ntw, tile_w)
        return m.transpose(0, 1, 3, 2, 4).reshape(B, nth, ntw, 1, TILE_N)

    x_pix = tile_flatten((x_ndc.astype(jnp.float32) + 1.0) * (W / 2.0))
    y_pix = tile_flatten((y_ndc.astype(jnp.float32) + 1.0) * (H / 2.0))
    gt = jnp.concatenate(
        [tile_flatten(g[..., c].astype(jnp.float32)) for c in range(C)],
        axis=3,
    )                                               # (B, nth, ntw, C, N)

    grid = (B, nth, ntw)

    def make_run(yb, xw):
        xb = min(_ceil_mult(xw + 128, 128), Wp_im)
        kernel = functools.partial(_splat_kernel, H=H, W=W, YB=yb, XW=xw,
                                   XB=xb, C=C)

        def run_pallas():
            acc = jnp.zeros((B, C, Hp_im, Wp_im), jnp.float32)
            out = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, 1, 1, 1, TILE_N),
                                 lambda b, i, j: (b, i, j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 1, 1, TILE_N),
                                 lambda b, i, j: (b, i, j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, 1, C, TILE_N),
                                 lambda b, i, j: (b, i, j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),   # accumulator (HBM)
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((B, C, Hp_im, Wp_im),
                                               jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((C, yb, xb), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
                input_output_aliases={3: 0},
                interpret=interpret,
            )(x_pix, y_pix, gt, acc)
            return jnp.moveaxis(out[:, :, :H, :W], 1, -1)

        return run_pallas

    def run_fallback():
        # Exact-but-serial XLA scatter (the sampler is linear in the image,
        # so its vjp at a zero primal is the full adjoint).
        from stabnet_tpu.ops import warp as xla_warp

        zero = jnp.zeros((B, H, W, C), jnp.float32)
        _, vjp = jax.vjp(
            lambda im: xla_warp.bilinear_sample(im, x_ndc0, y_ndc0), zero)
        return vjp(g0.astype(jnp.float32))[0]

    if not guard:
        return make_run(YB, XW)()

    tiers = []
    for yb, xw in ((YB, XW), (2 * YB, XW + 64)):
        yb = min(_ceil_mult(yb, 8), Hp_im)
        xw = min(_ceil_mult(xw, 8), Wp_im)
        if (yb, xw) not in tiers:
            tiers.append((yb, xw))

    def chain(remaining):
        if not remaining:
            return run_fallback
        (yb, xw) = remaining[0]
        # The splat window is NOT y-roll-compacted: its base is the 8-aligned
        # minimum, which can eat up to 7 of the yb DMA rows -> guard on the
        # conservative span yb - 7.
        ok = _windows_ok(x_pix, y_pix, H, W, yb - 7, xw)
        return lambda: jax.lax.cond(ok, make_run(yb, xw), chain(remaining[1:]))

    return chain(tiers)()


@jax.custom_vjp
def bilinear_sample_pallas_const_maps(im: jax.Array, x_ndc: jax.Array,
                                      y_ndc: jax.Array) -> jax.Array:
    """Pallas sampler with exact IMAGE gradients; the MAPS are constants.

    The temporal-consistency loss warps the sibling branch's OUTPUT by the
    dataset's optical flow (train_bundle_nobm.py:115-126): gradients must
    flow into the sampled image, while the flow is data.  The XLA path's
    autodiff works but lowers to serial gather/scatter loops on TPU; here
    the forward is the exact Pallas kernel and the backward is the Pallas
    splat (transposed one-hot matmuls).

    The returned MAP cotangents are ZERO: do not use this where gradients
    must flow into the sample coordinates — use
    `bilinear_sample_pallas_const_image` (maps differentiable) or the XLA
    sampler there.
    """
    return bilinear_sample_pallas(im, x_ndc, y_ndc, exact=True)


def _const_maps_fwd(im, x_ndc, y_ndc):
    out = bilinear_sample_pallas(im, x_ndc, y_ndc, exact=True)
    return out, (im.shape, x_ndc, y_ndc)


def _const_maps_bwd(res, g):
    im_shape, x_ndc, y_ndc = res
    H, W = im_shape[1], im_shape[2]
    d_im = bilinear_splat_pallas(g, x_ndc, y_ndc, (H, W))
    return (d_im.astype(jnp.float32), jnp.zeros_like(x_ndc),
            jnp.zeros_like(y_ndc))


bilinear_sample_pallas_const_maps.defvjp(_const_maps_fwd, _const_maps_bwd)


# --- differentiable wrapper for the TRAINING warp -----------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def bilinear_sample_pallas_const_image(im: jax.Array, x_ndc: jax.Array,
                                       y_ndc: jax.Array) -> jax.Array:
    """Pallas sampler with exact map gradients; the IMAGE is a constant.

    Training's hot warp samples the CURRENT INPUT FRAME (a data leaf with no
    gradient path — s_net_bundle_nobm.py:280-283,332), so only d/d(x_map),
    d/d(y_map) are needed.  The XLA gather path's autodiff works but both the
    gather forward and its gradient are serial-loop lowered on TPU; this
    custom VJP keeps everything on the MXU:

      forward:   the exact Pallas kernel;
      backward:  d out/d x = (y1-y)(Ic - Ia) + (y - y0)(Id - Ib)  (the exact
                 derivative of the clamped-corner bilinear formula — weights
                 are linear in x, corner indices are piecewise constant),
                 with the four corner taps Ia..Id fetched by FOUR more Pallas
                 calls at integer-snapped coordinates.

    The returned image cotangent is ZERO: do not use this where gradients
    must flow into the sampled image (e.g. the temporal-loss warp of the
    sibling branch's OUTPUT) — use `ops.warp.bilinear_sample` there.
    """
    return bilinear_sample_pallas(im, x_ndc, y_ndc, exact=True)


def _const_image_fwd(im, x_ndc, y_ndc):
    out = bilinear_sample_pallas(im, x_ndc, y_ndc, exact=True)
    return out, (im, x_ndc, y_ndc)


def _const_image_bwd(res, g):
    im, x_ndc, y_ndc = res
    B, H, W, C = im.shape

    x = (x_ndc.astype(jnp.float32) + 1.0) * (W / 2.0)
    y = (y_ndc.astype(jnp.float32) + 1.0) * (H / 2.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)

    def snap(px, n):
        return px * (2.0 / n) - 1.0

    def tap(xc, yc):
        # Taps land on EXACT integer coords in [0, size-1]; edge-inclusive
        # semantics (strict_edge=False) return the edge pixel there, matching
        # the gathered corner values in the XLA autodiff.
        return bilinear_sample_pallas(im, snap(xc, W), snap(yc, H), exact=True,
                                      strict_edge=False)

    Ia = tap(x0c, y0c)   # (B, Ho, Wo, C)
    Ib = tap(x0c, y1c)
    Ic = tap(x1c, y0c)
    Id = tap(x1c, y1c)

    # d out / d x_pix and d y_pix (exact autodiff of the clamped-corner
    # weights, which are linear in the continuous coordinate).
    wy0 = (y1c - y)[..., None]
    wy1 = (y - y0c)[..., None]
    wx0 = (x1c - x)[..., None]
    wx1 = (x - x0c)[..., None]
    dodx = wy0 * (Ic - Ia) + wy1 * (Id - Ib)
    dody = wx0 * (Ib - Ia) + wx1 * (Id - Ic)

    gx = jnp.sum(g * dodx, axis=-1) * (W / 2.0)
    gy = jnp.sum(g * dody, axis=-1) * (H / 2.0)
    return jnp.zeros_like(im), gx.astype(x_ndc.dtype), gy.astype(y_ndc.dtype)


bilinear_sample_pallas_const_image.defvjp(_const_image_fwd, _const_image_bwd)
