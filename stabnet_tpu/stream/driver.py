"""Host-side streaming driver: video files in, stabilized videos out.

Reference equivalent: the deploy_bundle.py main loop (deploy_bundle.py:183-371)
with all its options: warm-up, fps halving, --refine, --max-span,
--infer-with-stable/--infer-with-last, --random-black occlusion testing,
--deploy-vis diagnostic mosaics, --start-with-stable, and the final
accumulated-black maximal crop.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import List, Optional, Tuple

import numpy as np

from stabnet_tpu.ops.crop import max_clear_rect
from stabnet_tpu.stream import video_io
from stabnet_tpu.stream.engine import StreamEngine
from stabnet_tpu.utils import get_logger
from stabnet_tpu.utils.profiling import StageTimer

logger = get_logger()


@dataclasses.dataclass
class DeployOptions:
    """Mirror of the reference deploy CLI flags (deploy_bundle.py:12-31)."""

    refine: int = 1
    max_span: int = 1
    infer_with_stable: bool = False
    infer_with_last: bool = False
    start_with_stable: bool = False
    random_black: Optional[int] = None
    deploy_vis: bool = False
    output_size: Optional[Tuple[int, int]] = None  # (H, W); None = source size
    collect_input_gray: bool = False  # retain model-scale inputs in ClipResult
                                      # (O(T) host memory; `stabilize --metrics`)
    # Low-latency serving knobs (production path; no reference equivalent —
    # the reference blocks on every sess.run, deploy_bundle.py:285-287):
    pipelined: Optional[bool] = None  # 1-frame readback lag: read frame t-1's
                                      # output after dispatching step t (JAX
                                      # async dispatch overlaps upload/compute/
                                      # readback).  None = auto: on whenever no
                                      # ablation/vis mode needs same-step host
                                      # feedback.  Results are identical.
    device_gray: bool = False         # derive the model-scale gray on device
                                      # from the uploaded color frame instead
                                      # of uploading a separate 590 KB f32
                                      # gray (engine.gray_from_color; < 1/255
                                      # from the host path)


@dataclasses.dataclass
class ClipResult:
    frames: Optional[np.ndarray]  # (T, Ho, Wo, 3) uint8 stabilized frames
                                  # (None in constant-memory streaming mode,
                                  # where frames go straight to disk)
    cropped: Optional[np.ndarray] # (T, Hc, Wc, 3) uint8 black-free crop
    crop_rect: Tuple[int, int, int, int]
    all_black: np.ndarray         # (H, W) accumulated black counts
    fps_net: float                # net-step throughput (frames/s)
    vis: Optional[np.ndarray] = None
    input_gray: Optional[np.ndarray] = None  # (T, H, W) model-scale inputs
                                             # (reused by `stabilize --metrics`
                                             # so the clip is decoded once)
    num_frames: int = 0           # total output frames (incl. warm-up frame 0)
    stage_summary: Optional[dict] = None  # per-frame latency decomposition
                                          # ("pre"/"dispatch"/"readback" p50
                                          # etc.; StageTimer.summary())

    def __post_init__(self):
        if self.frames is not None and not self.num_frames:
            self.num_frames = len(self.frames)


def _bounce(delta: int, bound: int, speed: int) -> Tuple[int, int]:
    """Bouncing occlusion offset (reference: getNext, deploy_bundle.py:95-99)."""
    tmp = delta + speed
    if tmp >= bound or tmp < 0:
        speed *= -1
    return delta + speed, speed


class StreamDriver:
    """Stabilize clips with a StreamEngine; one instance per engine config."""

    def __init__(self, engine: StreamEngine, options: Optional[DeployOptions] = None):
        self.engine = engine
        self.cfg = engine.cfg
        self.opt = options or DeployOptions()

    # -- core ----------------------------------------------------------------
    def stabilize_clip(self, unstable: np.ndarray,
                       stable: Optional[np.ndarray] = None) -> ClipResult:
        """Stabilize one clip given as (T, H, W, 3) uint8 frames.

        `stable` ground-truth frames enable --infer-with-stable / vis modes.
        """
        cfg, opt = self.cfg, self.opt
        T = len(unstable)
        assert T >= 2, "need at least 2 frames"
        first = stable[0] if (opt.start_with_stable and stable is not None) else unstable[0]

        first_gray = video_io.to_gray_train(first, cfg.height, cfg.width,
                                            cfg.crop_rate)
        state = self.engine.init(first_gray[None])

        out_hw = opt.output_size or unstable.shape[1:3]
        out_frames: List[np.ndarray] = [self._resize_color(first, out_hw)]
        # Retaining every model-scale input costs O(T) host memory; only the
        # quality-metrics path wants them.
        in_grays: Optional[List[np.ndarray]] = (
            [video_io.to_gray_train(unstable[0], cfg.height, cfg.width, 1.0)]
            if opt.collect_input_gray else None)
        vis_frames: List[np.ndarray] = []

        # Ablation bookkeeping (host-side history, only when needed).
        host_hist = None
        if opt.infer_with_stable or opt.infer_with_last or opt.max_span > 1:
            host_hist = [first_gray.copy() for _ in range(cfg.history_len)]
            host_masks = [np.zeros_like(first_gray) for _ in range(cfg.history_len)]
        span_stack = None
        span_age = 0
        delta, speed = 0, opt.random_black or 0
        if opt.random_black is not None and stable is None:
            # Reference quirk preserved: the occlusion applies to the STABLE
            # train frame (deploy_bundle.py:252-256), so without a stable
            # ground-truth clip there is nothing to occlude.
            logger.warning(
                "--random-black has no effect: no stable ground-truth video "
                "for this clip (the occlusion applies to the stable history "
                "frames; pair it with --infer-with-stable)")

        # Same-step host feedback (history ablations, vis mosaics) cannot lag
        # a frame behind; everything else can and should (JAX async dispatch
        # overlaps frame t's upload/compute with frame t-1's readback).
        needs_sync = host_hist is not None or opt.deploy_vis
        pipelined = opt.pipelined
        if pipelined is None:
            pipelined = not needs_sync
        elif pipelined and needs_sync:
            raise ValueError(
                "pipelined serving defers each frame's readback by one step; "
                "history ablations and --deploy-vis need the output on host "
                "before the next frame (drop those modes, or pipelined=False)")

        timers = StageTimer()
        pending = None  # pipelined mode: the not-yet-read previous StepOutput
        # At t=1 the "last output" is the warm-up frame replicated into the
        # history (deploy_bundle.py:216-224).
        prev_fed_back: np.ndarray = first_gray.copy()
        for t in range(1, T):
            frame = unstable[t]
            with timers.stage("pre"):
                # device_gray: the engine derives the model-scale gray from
                # the uploaded color frame; host conversion is then needed
                # only where the HOST consumes it (metrics, vis).
                cur_gray = None
                if not opt.device_gray or in_grays is not None or opt.deploy_vis:
                    cur_gray = video_io.to_gray_train(
                        frame, cfg.height, cfg.width, 1.0)
                if in_grays is not None:
                    in_grays.append(cur_gray)
                # --random-black occludes the STABLE train frame that feeds
                # the history under --infer-with-stable (deploy_bundle.py:
                # 249-256) — a robustness test of the history channels, not
                # of the current frame.  Built here so the vis mosaic shows
                # the occlusion too.
                stable_gray = None
                if stable is not None and t < len(stable):
                    stable_gray = video_io.to_gray_train(
                        stable[t], cfg.height, cfg.width, cfg.crop_rate)
                    if opt.random_black is not None:
                        delta, speed = _bounce(delta, 50, speed)
                        w = stable_gray.shape[1]
                        stable_gray[:, delta:] = stable_gray[:, : w - delta]
                        stable_gray[:, :delta] = -1.0

                override = None
                if host_hist is not None:
                    offs = [i for i in cfg.indices if i > 0]
                    chans = [host_masks[-i] for i in offs] if cfg.input_mask else []
                    chans += [host_hist[-i] for i in offs]
                    override = np.stack(chans, axis=-1)[None]
                    if opt.max_span > 1:
                        if span_stack is None or span_age >= opt.max_span:
                            span_stack, span_age = override, 0
                        override = span_stack
                        span_age += 1

            with timers.stage("dispatch"):
                state, out = self.engine.step(
                    state, None if opt.device_gray else cur_gray[None],
                    frame[None], history_override=override,
                )

            if pipelined:
                # Read frame t-1's output only after dispatching step t.
                if pending is not None:
                    with timers.stage("readback"):
                        out_frames.append(np.asarray(pending.warped_color[0]))
                pending = out
                continue

            with timers.stage("readback"):
                warped = np.asarray(out.warped_color[0])
            out_frames.append(warped)
            if opt.deploy_vis:
                vis_frames.append(
                    self._vis_mosaic(out, cur_gray, stable_gray, prev_fed_back))
            if needs_sync:
                prev_fed_back = (np.asarray(out.output_gray[0])
                                 + np.asarray(out.black[0]) * (-1.0))

            if host_hist is not None:
                black = np.asarray(out.black[0])
                if opt.infer_with_stable and stable_gray is not None:
                    host_hist.append(stable_gray)
                    host_masks.append(np.zeros_like(first_gray))
                else:
                    host_hist.append(prev_fed_back)
                    host_masks.append(black)
                if opt.infer_with_last:
                    host_hist = [host_hist[-1]] * len(host_hist)
                host_hist.pop(0)
                host_masks.pop(0)

        if pending is not None:
            with timers.stage("readback"):
                out_frames.append(np.asarray(pending.warped_color[0]))

        all_black = np.asarray(state.all_black[0])
        rect = max_clear_rect(all_black)
        ys, xs = self._crop_slices(rect, out_hw)
        frames_arr = np.stack(out_frames)
        cropped = frames_arr[:, ys, xs, :]
        summary = timers.summary()
        tot_net = (summary.get("dispatch", {}).get("total_s", 0.0)
                   + summary.get("readback", {}).get("total_s", 0.0))
        fps_net = (T - 1) / tot_net if tot_net > 0 else float("inf")
        return ClipResult(
            frames=frames_arr,
            cropped=cropped,
            crop_rect=rect,
            all_black=all_black,
            fps_net=fps_net,
            vis=np.stack(vis_frames) if vis_frames else None,
            input_gray=np.stack(in_grays) if in_grays is not None else None,
            stage_summary=summary,
        )

    # -- batch serving (throughput mode) -------------------------------------
    def stabilize_batch(self, clips: List[np.ndarray],
                        chunk: Optional[int] = None,
                        sharded: bool = False,
                        pad_streams: Optional[int] = None) -> List[ClipResult]:
        """Stabilize S clips concurrently via the on-device whole-clip scan.

        The production throughput mode: clips are padded to a common length
        and scanned as S lock-step streams in ONE XLA program (the same path
        bench.py measures at 642 fps/chip on a v5e).  Unequal lengths are
        handled exactly — a per-stream validity mask freezes each clip's
        ring buffers and crop accumulator at its true end, so results match
        stabilizing each clip alone.

        Args:
          clips: list of (T_s, H, W, 3) uint8 frame arrays, T_s >= 2.
          chunk: scan the time axis in segments of this many frames
            (bounded device memory for long clips; the segment executable
            is compiled once and reused — tails are padded with invalid
            steps).  None = one scan over the whole padded length.
          sharded: shard the S clips over all local devices (S must be
            divisible by the device count — use `pad_streams`; incompatible
            with `chunk`).
          pad_streams: pad the stream count up to this value with dummy
            all-invalid streams (their compute is lock-step overhead, their
            results are dropped).  Keeps tail groups on the same compiled
            executable as full groups, and makes any group size shardable.

        History-ablation options (--infer-with-*/--max-span/--random-black,
        --start-with-stable) and --deploy-vis need the frame-at-a-time live
        loop and are rejected.
        """
        cfg, opt = self.cfg, self.opt
        if (opt.infer_with_stable or opt.infer_with_last or opt.max_span > 1
                or opt.random_black is not None or opt.deploy_vis
                or opt.start_with_stable):
            raise ValueError(
                "batch mode serves the production path; history ablations, "
                "--start-with-stable, and --deploy-vis need the per-frame "
                "loop (drop --batch)")
        if sharded and chunk is not None:
            raise ValueError("chunked batch serving is a single-device path; "
                             "use one of chunk/sharded")
        if sharded and not hasattr(self.engine, "stabilize_clips_sharded"):
            raise ValueError("sharded batch serving needs a live engine")
        if not sharded:
            chunk = self.reconcile_chunk(chunk)
        if chunk is not None and not hasattr(self.engine, "continue_clip"):
            raise ValueError("chunked batch serving needs a live engine or "
                             "an artifact exported with --segment (plain "
                             "artifacts step frame-wise)")
        n_real = len(clips)
        if n_real < 1:
            raise ValueError("empty batch")
        short = [s for s, c in enumerate(clips) if len(c) < 2]
        if short:
            raise ValueError(f"clips need at least 2 frames (violated by "
                             f"batch indices {short})")
        S = max(n_real, pad_streams or 0)
        lengths = [len(c) for c in clips] + [2] * (S - n_real)
        T = max(lengths)
        if chunk is not None:
            # Pad the step count to whole segments up front so every segment
            # runs the SAME executable — allocating at the padded length here
            # avoids copying the (large) host clip buffers later.
            T = 1 + -(-(T - 1) // chunk) * chunk

        if opt.output_size is None:
            sizes = {tuple(c.shape[1:3]) for c in clips}
            if len(sizes) > 1:
                raise ValueError(
                    f"clips in one batch have mixed resolutions {sizes}; "
                    f"pass output_size to pick one (single-clip mode keeps "
                    f"each clip's native size)")
        out_hw = opt.output_size or tuple(clips[0].shape[1:3])
        grays = np.zeros((S, T, cfg.height, cfg.width), np.float32)
        colors = np.zeros((S, T, *out_hw, 3), np.uint8)
        # Frames 1..T-1 are scanned; valid[s, t-1] <=> t < T_s (a prefix).
        valid = np.zeros((S, T - 1), bool)
        for s, clip in enumerate(clips):
            for t in range(lengths[s]):
                grays[s, t] = video_io.to_gray_train(
                    clip[t], cfg.height, cfg.width,
                    cfg.crop_rate if t == 0 else 1.0)
                colors[s, t] = self._resize_color(clip[t], out_hw)
            # Padded steps repeat the last real frame; their state writes are
            # masked out, the compute is lock-step overhead only.
            grays[s, lengths[s]:] = grays[s, lengths[s] - 1]
            colors[s, lengths[s]:] = colors[s, lengths[s] - 1]
            valid[s, : lengths[s] - 1] = True

        t0 = time.perf_counter()
        if chunk is None:
            if sharded:
                warped, state = self.engine.stabilize_clips_sharded(
                    grays, colors, valid=valid)
            else:
                warped, state = self.engine.stabilize_clip(grays, colors,
                                                           valid=valid)
            warped_np = np.asarray(warped)          # (S, T-1, Ho, Wo, 3)
        else:
            # Fixed-size segments (T was padded to whole segments above) so
            # every segment runs the SAME compiled executable.
            state = self.engine.init(grays[:, 0])
            segs = []
            for k in range((T - 1) // chunk):
                lo, hi = 1 + k * chunk, 1 + (k + 1) * chunk
                w, state = self.engine.continue_clip(
                    state, grays[:, lo:hi], colors[:, lo:hi],
                    valid=valid[:, lo - 1 : hi - 1])
                segs.append(np.asarray(w))
            warped_np = np.concatenate(segs, axis=1)
        all_black = np.asarray(state.all_black)
        elapsed = time.perf_counter() - t0
        total_frames = sum(len(c) - 1 for c in clips)
        fps = total_frames / elapsed if elapsed > 0 else float("inf")

        results = []
        for s, clip in enumerate(clips):
            frames_arr = np.concatenate(
                [self._resize_color(clip[0], out_hw)[None],
                 warped_np[s, : lengths[s] - 1]])
            rect = max_clear_rect(all_black[s])
            ys, xs = self._crop_slices(rect, out_hw)
            cropped = frames_arr[:, ys, xs, :]
            # input_gray reuses grays[s, 1:] (computed above with the same
            # crop_rate=1.0); only frame 0 differs (it used cfg.crop_rate).
            results.append(ClipResult(
                frames=frames_arr, cropped=cropped, crop_rect=rect,
                all_black=all_black[s], fps_net=fps,
                input_gray=(np.concatenate([
                    video_io.to_gray_train(clip[0], cfg.height, cfg.width,
                                           1.0)[None],
                    grays[s, 1 : lengths[s]],
                ]) if opt.collect_input_gray else None),
            ))
        return results

    # -- file interface (reference CLI behavior) -----------------------------
    def stabilize_file(self, unstable_path: str, output_dir: str,
                       stable_path: Optional[str] = None,
                       stream_chunk: Optional[int] = None) -> ClipResult:
        """Stabilize a video file, writing `<name>.avi` and `<name>_cut.avi`.

        Reference: deploy_bundle.py:183-371.  `stream_chunk=K` switches to
        constant-host-memory serving: frames are read, stabilized, and
        written K at a time (`_stabilize_file_streaming`).
        """
        if stream_chunk is not None:
            return self._stabilize_file_streaming(unstable_path, output_dir,
                                                  stream_chunk)
        reader = video_io.VideoReader(unstable_path)
        frames = np.stack(list(reader))
        reader.close()
        stable = None
        if stable_path and os.path.exists(stable_path):
            sreader = video_io.VideoReader(stable_path)
            stable = np.stack(list(sreader))
            sreader.close()

        res = self.stabilize_clip(frames, stable)
        name = os.path.basename(unstable_path)
        prod = os.path.join(output_dir, "output")
        os.makedirs(prod, exist_ok=True)
        self._write_video(os.path.join(prod, name + ".avi"), res.frames, reader.fps)
        self._write_video(os.path.join(prod, name + "_cut.avi"), res.cropped,
                          reader.fps)
        if res.vis is not None:
            vis_dir = os.path.join(output_dir, "output-vis")
            os.makedirs(vis_dir, exist_ok=True)
            self._write_video(os.path.join(vis_dir, name + ".avi"), res.vis,
                              reader.fps)
        logger.info("%s: %d frames, net fps=%.1f, crop=%s",
                    name, len(res.frames), res.fps_net, res.crop_rect)
        return res

    def _stabilize_file_streaming(self, unstable_path: str, output_dir: str,
                                  chunk: int) -> ClipResult:
        """Constant-host-memory file serving: read K frames, scan, write K.

        The reference buffers every output frame in RAM to write the final
        cropped video (deploy_bundle.py:368-371 iterates its in-memory
        `frames` list), so clip length bounds host memory.  Here each
        K-frame segment's warped output goes straight to the MJPG writer as
        its on-device scan completes, and the `_cut.avi` pass re-reads the
        just-written output file — host memory is bounded by K regardless of
        clip length (the device side was already bounded via
        `engine.continue_clip`).  One documented deviation: the cropped
        video crops the ENCODED output frames (one extra MJPG decode), not
        the raw warped frames.

        Production path only (the scan has no same-step host feedback for
        ablations or vis; use the buffered mode for those).
        """
        cfg, opt = self.cfg, self.opt
        if (opt.infer_with_stable or opt.infer_with_last or opt.max_span > 1
                or opt.random_black is not None or opt.deploy_vis
                or opt.start_with_stable or opt.collect_input_gray):
            raise ValueError(
                "streaming file serving runs the production whole-clip scan; "
                "ablation/vis/metrics modes need the buffered per-frame loop "
                "(drop --stream-chunk)")
        if chunk < 1:
            raise ValueError(f"stream_chunk must be >= 1, got {chunk}")
        # A baked-scan artifact serves this path too, but only at its baked
        # segment length and stream count — validated here, BEFORE any
        # output file is created.
        chunk = self.reconcile_chunk(chunk)
        if not hasattr(self.engine, "continue_clip"):
            raise ValueError("streaming file serving needs a live engine or "
                             "an artifact exported with --segment (plain "
                             "artifacts step frame-wise)")
        streams = getattr(self.engine, "streams", 1)
        if streams != 1:
            raise ValueError(f"artifact baked for {streams} streams; "
                             "streaming file serving is single-stream "
                             "(re-export with --streams 1)")

        reader = video_io.VideoReader(unstable_path)
        first = reader.read()
        if first is None:
            reader.close()
            raise ValueError(f"empty video: {unstable_path}")
        out_hw = tuple(opt.output_size or first.shape[:2])
        name = os.path.basename(unstable_path)
        prod = os.path.join(output_dir, "output")
        os.makedirs(prod, exist_ok=True)
        out_path = os.path.join(prod, name + ".avi")
        # VideoReader above already required cv2; an in-memory fallback here
        # would silently reintroduce the O(T) host buffering this mode exists
        # to eliminate.
        writer = video_io.VideoWriter(out_path, reader.fps, out_hw)

        first_gray = video_io.to_gray_train(first, cfg.height, cfg.width,
                                            cfg.crop_rate)
        state = self.engine.init(first_gray[None])
        writer.write(self._resize_color(first, out_hw))
        n_out = 1
        tot_net = 0.0
        done = False
        while not done:
            grays = np.zeros((1, chunk, cfg.height, cfg.width), np.float32)
            colors = np.zeros((1, chunk, *out_hw, 3), np.uint8)
            valid = np.zeros((1, chunk), bool)
            for k in range(chunk):
                f = reader.read()
                if f is None:
                    done = True
                    break
                grays[0, k] = video_io.to_gray_train(f, cfg.height, cfg.width,
                                                     1.0)
                colors[0, k] = self._resize_color(f, out_hw)
                valid[0, k] = True
            n_valid = int(valid.sum())
            if n_valid == 0:
                break
            # Pad the tail segment by repeating the last real frame; `valid`
            # masks the padded steps out of the state and crop accumulator,
            # and the SAME compiled executable serves every segment.
            grays[0, n_valid:] = grays[0, n_valid - 1]
            colors[0, n_valid:] = colors[0, n_valid - 1]
            t0 = time.perf_counter()
            warped, state = self.engine.continue_clip(state, grays, colors,
                                                      valid=valid)
            warped_np = np.asarray(warped[0, :n_valid])
            tot_net += time.perf_counter() - t0
            for f in warped_np:
                writer.write(f)
            n_out += n_valid
        writer.close()
        reader.close()

        all_black = np.asarray(state.all_black[0])
        rect = max_clear_rect(all_black)
        ys, xs = self._crop_slices(rect, out_hw)
        cut_path = os.path.join(prod, name + "_cut.avi")
        cut_reader = video_io.VideoReader(out_path, allow_half_rate=False)
        cut_hw = (ys.stop - ys.start, xs.stop - xs.start)
        cut_writer = video_io.VideoWriter(cut_path, reader.fps, cut_hw)
        for f in cut_reader:
            cut_writer.write(f[ys, xs])
        cut_reader.close()
        cut_writer.close()

        fps_net = (n_out - 1) / tot_net if tot_net > 0 else float("inf")
        logger.info("%s: %d frames (streamed, chunk=%d), net fps=%.1f, "
                    "crop=%s", name, n_out, chunk, fps_net, rect)
        return ClipResult(frames=None, cropped=None, crop_rect=rect,
                          all_black=all_black, fps_net=fps_net,
                          num_frames=n_out)

    # -- helpers -------------------------------------------------------------
    def reconcile_chunk(self, chunk: Optional[int]) -> Optional[int]:
        """Resolve a requested scan-chunk length against the engine.

        An artifact exported with a baked whole-segment scan fixes the
        segment length at export time; chunked serving must ride it (any
        other length would shape-mismatch the baked executable), and with no
        explicit request the baked length is adopted.  Live engines compile
        whatever length is asked for.  Raises ValueError on a conflict —
        callers run this before any output file is created.
        """
        baked = getattr(self.engine, "segment", None)
        if baked:
            if chunk is not None and chunk != baked:
                raise ValueError(
                    f"chunk size {chunk} conflicts with the artifact's "
                    f"baked {baked}-frame scan segment; use {baked}, or "
                    f"re-export with --segment {chunk}")
            return baked
        return chunk

    def _crop_slices(self, rect: Tuple[int, int, int, int],
                     out_hw: Tuple[int, int]) -> Tuple[slice, slice]:
        """Scale a model-resolution crop rectangle to output-resolution
        slices (ceil/floor so the cut never includes a black border pixel).

        The single source of the rounding convention — every serving mode's
        `_cut` output crops through here.
        """
        sy = out_hw[0] / self.cfg.height
        sx = out_hw[1] / self.cfg.width
        top, left, bot, right = rect
        return (slice(int(np.ceil(top * sy)), int(np.floor((bot + 1) * sy))),
                slice(int(np.ceil(left * sx)),
                      int(np.floor((right + 1) * sx))))

    @staticmethod
    def _resize_color(frame: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
        if frame.shape[:2] == tuple(out_hw):
            return frame
        if video_io.HAVE_CV2:
            import cv2

            return cv2.resize(frame, (out_hw[1], out_hw[0]))
        return video_io._resize_nearest(frame, *out_hw)

    @staticmethod
    def _write_video(path: str, frames: np.ndarray, fps: float):
        if video_io.HAVE_CV2:
            w = video_io.VideoWriter(path, fps, frames.shape[1:3])
        else:
            w = video_io.ArrayVideoWriter()
        for f in frames:
            w.write(f)
        w.close()

    def _vis_mosaic(self, out, cur_gray: np.ndarray,
                    stable_gray: Optional[np.ndarray],
                    prev_fed_back: np.ndarray) -> np.ndarray:
        """2x2 diagnostic mosaic (reference: draw_imgs, deploy_bundle.py:77-93):
        [net output | output - stable ; output - input | output - last].

        "last" is the previous stabilized frame as fed back into the history
        (the reference reads input channel 0, which in the mask-less layout is
        before_frames[-1]; with input_mask=True that literal index lands on a
        mask channel — we render the intended frame).
        """
        net = video_io.from_gray_train(np.asarray(out.output_gray[0])).astype(np.int32)
        unstable_img = video_io.from_gray_train(cur_gray).astype(np.int32)
        last_img = video_io.from_gray_train(prev_fed_back).astype(np.int32)
        if stable_gray is not None:
            st = video_io.from_gray_train(stable_gray).astype(np.int32)
        else:
            st = np.zeros_like(net)
        top = np.concatenate([net, np.abs(net - st)], axis=1)
        bottom = np.concatenate([np.abs(net - unstable_img),
                                 np.abs(net - last_img)], axis=1)
        img = np.concatenate([top, bottom], axis=0).astype(np.uint8)
        return np.repeat(img[..., None], 3, axis=-1)
