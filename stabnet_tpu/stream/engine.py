"""Online streaming stabilization engine.

Reference equivalent: the deploy driver's per-frame loop
(deploy_bundle.py:183-371): assemble a 13-channel input from host ring
buffers, run the net, warp the full-res color frame on host with cv2.remap,
push the net output back into the history.

TPU-native re-design:
  * the 32-slot history ring buffer (frames + masks) lives ON DEVICE as part
    of a jitted step's carried state (`dynamic_update_slice` write, modular
    gather read) — no per-frame host round-trip of history;
  * the full-resolution color warp runs on device (bilinear resample of the
    smoothed maps; reference does host cv2.remap, deploy_bundle.py:136-146);
  * frames cross host<->device as uint8 (decode/encode stay on host);
  * the engine is vmap-ready over a leading stream axis: S independent clips
    stabilize in lock-step to fill the chip (throughput mode), S=1 is the
    latency mode;
  * `refine` (feed output back, deploy_bundle.py:284-295) is a static unroll
    inside the jitted step.

Ablation modes of the reference driver (--infer-with-stable, --infer-with-last,
--max-span, --random-black; deploy_bundle.py:18-30) are host-side input
manipulations; they are supported through `StreamDriver` which can override
history channels explicitly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.ops import bilinear_sample, transformer
from stabnet_tpu.ops.crop import max_clear_rect
from stabnet_tpu.ops.mesh import theta_to_mesh
from stabnet_tpu.ops.resize import resize_bilinear_bhw as resize_bilinear


class StreamState(NamedTuple):
    """Device-resident per-stream state (S = number of concurrent streams)."""

    frames: jax.Array     # (S, L, H, W) stabilized history, model scale
    masks: jax.Array      # (S, L, H, W) black-border history
    ptr: jax.Array        # () int32 index of the next frame to process.
                          #    Scalar: all streams advance in lock-step, so
                          #    history reads lower to dynamic slices instead
                          #    of gathers (XLA's gather is a serial loop).
    all_black: jax.Array  # (S, H, W) int32 accumulated black mask counts


class StepOutput(NamedTuple):
    output_gray: jax.Array   # (S, H, W) net output, model scale
    black: jax.Array         # (S, H, W)
    x_map: jax.Array         # (S, H, W)
    y_map: jax.Array         # (S, H, W)
    warped_color: jax.Array  # (S, Ho, Wo, 3) uint8 stabilized full-res frame


def init_state(first_gray: jax.Array, cfg: StabNetConfig) -> StreamState:
    """Warm-up: replicate frame 0 into every ring slot, zero masks.

    Reference: deploy_bundle.py:216-224.
    first_gray: (S, H, W) model-scale first frame of each stream.
    """
    S, H, W = first_gray.shape
    L = cfg.history_len
    frames = jnp.broadcast_to(first_gray[:, None], (S, L, H, W)).astype(jnp.float32)
    masks = jnp.zeros((S, L, H, W), jnp.float32)
    ptr = jnp.ones((), jnp.int32)  # frame 0 is written through as-is
    all_black = jnp.zeros((S, H, W), jnp.int32)
    return StreamState(frames, masks, ptr, all_black)


def _gather_history(ring: jax.Array, ptr: jax.Array, offsets) -> jax.Array:
    """ring: (S, L, H, W); ptr: scalar; offsets: list[int] -> (S, K, H, W).

    One dynamic slice per (static) offset — never an XLA gather, which lowers
    to a serial dynamic-slice loop on TPU."""
    L = ring.shape[1]
    slices = [
        jax.lax.dynamic_index_in_dim(ring, (ptr - i) % L, axis=1, keepdims=True)
        for i in offsets
    ]
    return jnp.concatenate(slices, axis=1)


def assemble_input(state: StreamState, cur_gray: jax.Array,
                   cfg: StabNetConfig) -> jax.Array:
    """Build the (S, H, W, C_in) input stack from the device ring buffers.

    Channel order matches training and deploy: history masks (offsets
    ascending), history frames, current frame (deploy_bundle.py:259-274).
    """
    offsets = [i for i in cfg.indices if i > 0]
    hist_f = _gather_history(state.frames, state.ptr, offsets)
    parts = []
    if cfg.input_mask:
        hist_m = _gather_history(state.masks, state.ptr, offsets)
        parts.append(jnp.moveaxis(hist_m, 1, -1))
    parts.append(jnp.moveaxis(hist_f, 1, -1))
    parts.append(cur_gray[..., None])
    return jnp.concatenate(parts, axis=-1)


def _use_pallas_default() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def gray_from_color(color: jax.Array, hw: Tuple[int, int],
                    channels_first: bool = False) -> jax.Array:
    """Model-scale gray derived ON DEVICE from the full-res color frame.

    BT.601 luma + half-pixel bilinear down-resize, the same math the host
    `video_io.to_gray_train` performs with cv2 (reference: cvt_img2train,
    config.py:6-21).  Two intentional precision deviations from the host
    path: the gray intermediate stays float (cv2 rounds it to uint8) and the
    resize runs in f32 (cv2 uses fixed point), each worth < 1/255.  Used by
    the low-latency serving mode to kill the separate 590 KB f32 gray upload
    per frame — the color frame is uploaded anyway.
    """
    colf = color.astype(jnp.float32)
    if channels_first:
        b, g, r = colf[:, 0], colf[:, 1], colf[:, 2]
    else:
        b, g, r = colf[..., 0], colf[..., 1], colf[..., 2]
    gray = 0.114 * b + 0.587 * g + 0.299 * r
    return resize_bilinear(gray, hw) / 255.0 - 0.5


def _sample(im: jax.Array, x_map: jax.Array, y_map: jax.Array,
            use_pallas: bool, exact: bool = True) -> jax.Array:
    if use_pallas:
        from stabnet_tpu.ops.pallas_warp import bilinear_sample_pallas

        return bilinear_sample_pallas(im, x_map, y_map, exact=exact)
    return bilinear_sample(im, x_map, y_map)


def _net_forward(model, variables, x: jax.Array, cfg: StabNetConfig,
                 use_pallas: bool = False):
    from stabnet_tpu.ops import black_mask, dense_maps, mesh_to_homographies
    from stabnet_tpu.ops.warp import WarpResult

    theta = model.apply(variables, x, train=False)
    mesh = theta_to_mesh(theta, cfg.grid_h, cfg.grid_w, cfg.do_crop_rate)
    cur = x[..., cfg.cur_channel : cfg.cur_channel + 1].astype(jnp.float32)
    if not use_pallas:
        return transformer(cur, mesh, cfg.grid_h, cfg.grid_w)
    Hs = mesh_to_homographies(mesh, cfg.grid_h, cfg.grid_w)
    x_map, y_map = dense_maps(Hs, cfg.height, cfg.width)
    black = black_mask(x_map, y_map)
    # bf16 MXU passes: the gray output only feeds the history ring and the
    # vis mosaic, where the ~4e-3 weight-quantization error sits at the same
    # level as the uint8 frame quantization (1/255).  The production output
    # frame is the full-res color warp, which rounds to uint8 anyway.
    output = _sample(cur, x_map, y_map, use_pallas=True, exact=False)
    return WarpResult(output=output, black_pix=black, x_map=x_map,
                      y_map=y_map, Hs=Hs)


def warp_color(color: jax.Array, x_map: jax.Array, y_map: jax.Array,
               out_hw: Tuple[int, int], smooth_rate: int = 4,
               use_pallas: bool = False,
               channels_first: bool = False) -> jax.Array:
    """Warp full-resolution uint8 color frames by the (smoothed) NDC maps.

    color: (S, Hf, Wf, 3) uint8, or (S, 3, Hf, Wf) when `channels_first`
    (the whole-clip scan pre-transposes once so no 11 MB/frame layout change
    happens inside the loop).  Returns (S, Ho, Wo, 3) uint8.

    The NDC maps are resolution independent: they are low-passed at model
    resolution (4x down), then resampled straight to the output size and used
    to sample the full-res frame on device (the reference warps a downscaled
    512x288 frame on host instead).
    """
    S, H, W = x_map.shape
    Ho, Wo = out_hw
    # Down 4x (the low-pass), then straight to the output resolution — the
    # smoothed signal is band-limited, so the intermediate up-sample of the
    # reference pipeline is redundant work.
    rate = smooth_rate
    xs = resize_bilinear(x_map, (H // rate, W // rate))
    ys = resize_bilinear(y_map, (H // rate, W // rate))
    if use_pallas:
        from stabnet_tpu.ops.pallas_warp import warp_uint8_cf_lowres

        imc = color if channels_first else jnp.moveaxis(color, -1, 1)
        # uint8 window DMA + on-chip cast + uint8 epilogue; bf16 MXU passes
        # (error << 1 uint8 LSB after rounding).  The up-sample of the maps
        # to (Ho, Wo) is fused into the kernel's tiled layout — the
        # full-resolution map intermediates never exist.  x_band=80: within
        # noise of the 96 default at 720p, ~3% faster at 1080p (smaller
        # window DMAs; measured scripts/tile_sweep_1080.py); the guard tiers
        # still cover wider spreads.
        return warp_uint8_cf_lowres(imc, xs, ys, (Ho, Wo), x_band=80)
    xs = resize_bilinear(xs, (Ho, Wo))
    ys = resize_bilinear(ys, (Ho, Wo))
    img = (jnp.moveaxis(color, 1, -1) if channels_first else color)
    warped = bilinear_sample(img.astype(jnp.float32), xs, ys)
    return jnp.clip(jnp.round(warped), 0, 255).astype(jnp.uint8)


def stream_step(model, variables, state: StreamState, cur_gray: jax.Array,
                cur_color: jax.Array, cfg: StabNetConfig, refine: int = 1,
                out_hw: Optional[Tuple[int, int]] = None,
                history_override: Optional[jax.Array] = None,
                use_pallas: bool = False,
                color_channels_first: bool = False
                ) -> Tuple[StreamState, StepOutput]:
    """Process one frame per stream.  Pure function; jit over (state, frames).

    Args:
      cur_gray: (S, H, W) current unstable frame, model scale — or None to
        derive it on device from `cur_color` (`gray_from_color`; the
        low-latency mode's single-upload path).
      cur_color: (S, Hf, Wf, 3) uint8 full-res current frame.
      refine: static number of self-refinement passes
        (deploy_bundle.py:284-295).
      history_override: optional (S, H, W, C_in - 1) replacing the on-device
        history channels (ablation modes).
    """
    H, W = cfg.height, cfg.width
    if cur_gray is None:
        cur_gray = gray_from_color(cur_color, (H, W),
                                   channels_first=color_channels_first)
    if history_override is None:
        x = assemble_input(state, cur_gray, cfg)
    else:
        x = jnp.concatenate([history_override, cur_gray[..., None]], axis=-1)

    warp = None
    for _ in range(max(refine, 1)):
        warp = _net_forward(model, variables, x, cfg, use_pallas=use_pallas)
        fed_back = warp.output[..., 0] + warp.black_pix * (-1.0)
        x = jnp.concatenate([x[..., :-1], fed_back[..., None]], axis=-1)

    out_gray = warp.output[..., 0]
    black = warp.black_pix
    new_frame = out_gray + black * (-1.0)

    L = state.frames.shape[1]
    slot = state.ptr % L

    def write(ring, value):
        # dynamic_update_slice on the (lock-step) scalar slot.
        return jax.lax.dynamic_update_index_in_dim(ring, value, slot, axis=1)

    new_state = StreamState(
        frames=write(state.frames, new_frame),
        masks=write(state.masks, black),
        ptr=state.ptr + 1,
        all_black=state.all_black + jnp.round(black).astype(jnp.int32),
    )

    if out_hw is None:
        out_hw = ((cur_color.shape[2], cur_color.shape[3])
                  if color_channels_first
                  else (cur_color.shape[1], cur_color.shape[2]))
    warped = warp_color(cur_color, warp.x_map, warp.y_map, out_hw,
                        use_pallas=use_pallas,
                        channels_first=color_channels_first)
    return new_state, StepOutput(
        output_gray=out_gray, black=black,
        x_map=warp.x_map, y_map=warp.y_map, warped_color=warped,
    )


def scan_frames(model, variables, state: StreamState, clip_gray: jax.Array,
                clip_color: jax.Array, cfg: StabNetConfig,
                refine: int = 1,
                out_hw: Optional[Tuple[int, int]] = None,
                use_pallas: bool = False,
                valid: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, StreamState]:
    """Process T' frames per stream as one on-device lax.scan (no warm-up).

    The continuation primitive behind `stabilize_clip_device` and the
    chunked batch-serving path: `state` carries the ring buffers across
    calls, so a long clip can be scanned in bounded-HBM segments.

    Args:
      clip_gray: (S, T', H, W) model-scale gray frames, ALL processed.
      clip_color: (S, T', Hf, Wf, 3) uint8 full-res frames.
      valid: optional (S, T') bool.  Where False, the stream's state rows
        (ring buffers, crop accumulator) are left untouched and its output
        for that step is garbage to be discarded by the caller.  Validity
        must be a per-stream PREFIX (once False, False for the rest of the
        scan) — it models clips of unequal length padded to a common T',
        with each clip's crop accumulation frozen exactly at its true end.
        None compiles the mask away entirely.

    Returns:
      (warped, final_state): warped (S, T', Ho, Wo, 3) uint8.
    """
    out_hw = out_hw or (clip_color.shape[2], clip_color.shape[3])

    def body(state, xs):
        if valid is None:
            cur_gray, cur_color = xs
        else:
            cur_gray, cur_color, v = xs
        new_state, out = stream_step(
            model, variables, state, cur_gray, cur_color, cfg,
            refine=refine, out_hw=out_hw, use_pallas=use_pallas,
            color_channels_first=use_pallas,
        )
        if valid is not None:
            keep = v[:, None, None]
            new_state = StreamState(
                frames=jnp.where(keep[..., None], new_state.frames,
                                 state.frames),
                masks=jnp.where(keep[..., None], new_state.masks,
                                state.masks),
                ptr=new_state.ptr,  # lock-step scalar; safe because a
                                    # stream's validity is a prefix — a
                                    # frozen stream never resumes
                all_black=jnp.where(keep, new_state.all_black,
                                    state.all_black),
            )
        return new_state, out.warped_color

    color_seq = jnp.moveaxis(clip_color, 1, 0)         # (T', S, Hf, Wf, 3)
    if use_pallas:
        # One whole-clip transpose to channels-first uint8: the per-frame
        # kernel then DMAs uint8 windows directly (no in-loop layout change).
        color_seq = jnp.moveaxis(color_seq, -1, 2)     # (T', S, 3, Hf, Wf)
    xs = (
        jnp.moveaxis(clip_gray, 1, 0),                 # (T', S, H, W)
        color_seq,
    )
    if valid is not None:
        xs = xs + (jnp.moveaxis(valid.astype(bool), 1, 0),)  # (T', S)
    final_state, warped = jax.lax.scan(body, state, xs)
    return jnp.moveaxis(warped, 0, 1), final_state


def stabilize_clip_device(model, variables, clip_gray: jax.Array,
                          clip_color: jax.Array, cfg: StabNetConfig,
                          refine: int = 1,
                          out_hw: Optional[Tuple[int, int]] = None,
                          use_pallas: bool = False,
                          valid: Optional[jax.Array] = None
                          ) -> Tuple[jax.Array, StreamState]:
    """Stabilize whole clips with the per-frame loop as an on-device lax.scan.

    The online recurrence (frame t needs the stabilized t-1 in its history)
    is inherently sequential, but there is no reason to bounce through the
    host every frame as the reference does (deploy_bundle.py:248-332): the
    scan keeps the ring buffer, the net, and the full-res warp on device and
    dispatches the WHOLE clip as one XLA program.  This is the throughput
    path; `StreamEngine.step` is the frame-at-a-time latency path.

    Args:
      clip_gray: (S, T, H, W) model-scale gray frames (frame 0 warms up the
        history; frames 1..T-1 are processed).
      clip_color: (S, T, Hf, Wf, 3) uint8 full-res frames.
      valid: optional (S, T-1) prefix validity for frames 1..T-1 (see
        `scan_frames`) for batches of unequal-length clips.

    Returns:
      (warped, final_state): warped (S, T-1, Ho, Wo, 3) uint8 stabilized
      frames; final_state carries the accumulated black map for cropping.
    """
    state0 = init_state(clip_gray[:, 0], cfg)
    return scan_frames(model, variables, state0, clip_gray[:, 1:],
                       clip_color[:, 1:], cfg, refine=refine, out_hw=out_hw,
                       use_pallas=use_pallas, valid=valid)


class StreamEngine:
    """Compiled online stabilizer over S concurrent streams."""

    def __init__(self, model, variables, cfg: StabNetConfig, refine: int = 1,
                 out_hw: Optional[Tuple[int, int]] = None,
                 use_pallas: Optional[bool] = None):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.refine = refine
        self.out_hw = out_hw
        if use_pallas is None:
            use_pallas = _use_pallas_default()
        self.use_pallas = use_pallas
        self._step = jax.jit(
            functools.partial(
                stream_step, model, cfg=cfg, refine=refine, out_hw=out_hw,
                use_pallas=use_pallas,
            ),
            donate_argnames=("state",),
        )
        self._clip = jax.jit(
            functools.partial(
                stabilize_clip_device, model, cfg=cfg, refine=refine,
                out_hw=out_hw, use_pallas=use_pallas,
            )
        )
        self._scan = jax.jit(
            functools.partial(
                scan_frames, model, cfg=cfg, refine=refine,
                out_hw=out_hw, use_pallas=use_pallas,
            ),
            donate_argnames=("state",),
        )
        # Sharded whole-clip callables, one per mesh (jax.jit instances cache
        # per instance — rebuilding one per call would recompile every call).
        self._clip_sharded: dict = {}

    def init(self, first_gray: np.ndarray) -> StreamState:
        return jax.jit(functools.partial(init_state, cfg=self.cfg))(
            jnp.asarray(first_gray)
        )

    def step(self, state: StreamState, cur_gray: Optional[np.ndarray],
             cur_color: np.ndarray,
             history_override: Optional[np.ndarray] = None
             ) -> Tuple[StreamState, StepOutput]:
        """One frame per stream.  `cur_gray=None` derives the model-scale gray
        on device from `cur_color` (the low-latency single-upload path)."""
        gray = None if cur_gray is None else jnp.asarray(cur_gray)
        if history_override is None:
            return self._step(self.variables, state, gray,
                              jnp.asarray(cur_color))
        # Same jitted callable; the override variant is simply a second trace.
        return self._step(
            self.variables, state, gray,
            jnp.asarray(cur_color), history_override=jnp.asarray(history_override),
        )


    def stabilize_clip(self, clip_gray: np.ndarray, clip_color: np.ndarray,
                       valid: Optional[np.ndarray] = None
                       ) -> Tuple[jax.Array, StreamState]:
        """Whole-clip on-device stabilization (see stabilize_clip_device)."""
        if valid is None:
            return self._clip(self.variables, jnp.asarray(clip_gray),
                              jnp.asarray(clip_color))
        return self._clip(self.variables, jnp.asarray(clip_gray),
                          jnp.asarray(clip_color), valid=jnp.asarray(valid))

    def continue_clip(self, state: StreamState, clip_gray: np.ndarray,
                      clip_color: np.ndarray,
                      valid: Optional[np.ndarray] = None
                      ) -> Tuple[jax.Array, StreamState]:
        """Scan a segment of frames from an existing state (see scan_frames).

        Chunked batch serving: `init` once, then feed fixed-size segments —
        device memory for the warped output stays bounded by the segment
        length instead of the clip length.  `state` is donated.
        """
        if valid is None:
            return self._scan(self.variables, state, jnp.asarray(clip_gray),
                              jnp.asarray(clip_color))
        return self._scan(self.variables, state, jnp.asarray(clip_gray),
                          jnp.asarray(clip_color), valid=jnp.asarray(valid))

    def stabilize_clips_sharded(self, clip_gray: np.ndarray,
                                clip_color: np.ndarray, mesh=None,
                                valid: Optional[np.ndarray] = None
                                ) -> Tuple[jax.Array, StreamState]:
        """Multi-chip batch stabilization: shard S clips over the data mesh.

        Each clip's recurrence is independent, so the stream axis shards
        perfectly: parameters replicated, clips split across chips, zero
        collectives in steady state (the reference has no multi-device
        capability at all; SURVEY.md section 2).

        S must be divisible by the mesh size.  `valid` is the (S, T-1)
        unequal-length mask of `scan_frames`.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from stabnet_tpu.parallel import data_mesh

        mesh = mesh or data_mesh()
        if clip_gray.shape[0] % mesh.devices.size:
            raise ValueError(
                f"S={clip_gray.shape[0]} streams not divisible by the "
                f"{mesh.devices.size}-device mesh; pad the batch (driver: "
                f"pad_streams) or drop sharding")
        shard = NamedSharding(mesh, P(self.cfg.mesh_data_axis))
        key = (mesh, valid is not None)
        fn = self._clip_sharded.get(key)
        if fn is None:
            use_pallas = mesh.devices.flat[0].platform in ("tpu", "axon")
            repl = NamedSharding(mesh, P())
            in_shardings = (repl, shard, shard) + (
                (shard,) if valid is not None else ())

            def _impl(variables, clip_gray, clip_color, valid=None):
                # Positional-trailing `valid` (in_shardings only covers
                # positional parameters).
                return stabilize_clip_device(
                    self.model, variables, clip_gray, clip_color,
                    cfg=self.cfg, refine=self.refine, out_hw=self.out_hw,
                    use_pallas=use_pallas, valid=valid)

            fn = jax.jit(
                _impl,
                in_shardings=in_shardings,
                out_shardings=(shard, StreamState(shard, shard, repl, shard)),
            )
            self._clip_sharded[key] = fn
        # Place inputs with the shard sharding up front: a bare jnp.asarray
        # would commit the full multi-chip batch to device 0's HBM before the
        # jit reshards it (S*n_dev 720p clips overflow one chip).
        args = (jax.device_put(clip_gray, shard),
                jax.device_put(clip_color, shard))
        if valid is not None:
            args += (jax.device_put(np.asarray(valid, bool), shard),)
        return fn(self.variables, *args)


def crop_rectangle(all_black: np.ndarray) -> Tuple[int, int, int, int]:
    """Final maximal black-free crop over the whole clip.

    Reference: deploy_bundle.py:344-365; see stabnet_tpu.ops.crop.
    """
    return max_clear_rect(np.asarray(all_black))
