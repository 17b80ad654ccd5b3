"""AOT export of the streaming step for serving (StableHLO artifacts).

The reference deploys by restoring the full TRAINING graph from a .meta file
and pulling tensors by name (deploy_bundle.py:45-56) — the serving artifact
is the training checkpoint itself.  Here deployment gets a first-class
artifact: `export_stream_step` serializes the jitted online step (weights
baked in, shapes fixed) via `jax.export`, and `load_stream_step` turns the
bytes back into a callable — no model code, checkpoint plumbing, or Python
package version coupling on the serving side beyond JAX itself.

The exported function is exactly `StreamEngine.step`'s computation:
(state, gray (S, H, W), color (S, Ho, Wo, 3) uint8) ->
(new_state, StepOutput).  `initial_state` builds the warm-up state
(deploy_bundle.py:216-224 semantics) for the serving process.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import StabNetConfig
from stabnet_tpu.stream import engine as _engine


def _register_serialization() -> None:
    from jax import export as jax_export

    for cls in (_engine.StreamState, _engine.StepOutput):
        try:
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=f"stabnet_tpu.{cls.__name__}")
        except ValueError:
            pass  # already registered (repeated export calls)


_register_serialization()


def _resolve_use_pallas(platforms: Optional[Tuple[str, ...]]) -> bool:
    """Should the artifact carry the Mosaic (TPU) warp kernels?

    True only when every requested lowering platform can run them; with no
    explicit platforms the current backend decides.
    """
    if platforms:
        return ("cpu" not in platforms
                and any(p in ("tpu", "axon") for p in platforms))
    return jax.default_backend() in ("tpu", "axon")


def _state0_spec(cfg: StabNetConfig, streams: int):
    """Shape spec of the streaming state for `streams` concurrent streams."""
    return jax.eval_shape(
        functools.partial(_engine.init_state, cfg=cfg),
        jax.ShapeDtypeStruct((streams, cfg.height, cfg.width), jnp.float32),
    )


def _export_serialized(fn, arg_specs, platforms: Optional[Tuple[str, ...]],
                       use_pallas: bool) -> bytes:
    """Trace + serialize `fn` under the export-safe contexts (shared by the
    per-frame step and the whole-segment scan exporters — the two MUST stay
    identical, so the subtleties live here once).

    - Portable DLT solver: the default jnp.linalg.solve lowers to LAPACK FFI
      custom calls on CPU, which crash when invoked from a deserialized
      artifact (jaxlib 0.9.0).  The artifact is therefore a slightly
      different numeric path than the live engine — equal to it within
      solver roundoff (O(eps * cond) per homography).
    - Pinned Pallas interpret mode: when lowering for TPU the kernels must
      resolve to the Mosaic lowering regardless of the HOST backend —
      `interpret=None` follows jax.default_backend(), so a CPU build host
      exporting `--platforms tpu` would otherwise silently bake the
      interpreter (serial emulation) lowering into the artifact.
    """
    from jax import export as jax_export

    from stabnet_tpu.ops.homography import portable_solve
    from stabnet_tpu.ops.pallas_warp import interpret_default

    with portable_solve(), interpret_default(False if use_pallas else None):
        exported = jax_export.export(
            jax.jit(fn),
            platforms=list(platforms) if platforms else None,
        )(*arg_specs)
    return exported.serialize()


def export_stream_step(model, variables, cfg: StabNetConfig,
                       out_hw: Tuple[int, int], streams: int = 1,
                       refine: int = 1,
                       platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """Serialize the online streaming step with weights baked in.

    Args:
      out_hw: full-resolution output size (Ho, Wo).
      streams: number of concurrent streams S the artifact serves.
      platforms: lowering platforms (default: the current backend).  A
        CPU build host CAN export a full-performance TPU artifact
        (`platforms=("tpu",)`): the Pallas warp kernels Mosaic-lower
        without a device.  A multi-platform ("cpu","tpu") artifact falls
        back to the XLA sampler everywhere (the Pallas kernels are
        TPU-only), trading TPU warp speed for portability.

    Returns:
      Serialized `jax.export` artifact bytes.
    """
    use_pallas = _resolve_use_pallas(platforms)

    def step(state, gray, color):
        return _engine.stream_step(model, variables, state, gray, color, cfg,
                                   refine=refine, out_hw=out_hw,
                                   use_pallas=use_pallas)

    S = streams
    Ho, Wo = out_hw
    gray = jax.ShapeDtypeStruct((S, cfg.height, cfg.width), jnp.float32)
    color = jax.ShapeDtypeStruct((S, Ho, Wo, 3), jnp.uint8)
    return _export_serialized(step, (_state0_spec(cfg, S), gray, color),
                              platforms, use_pallas)


def export_scan_segment(model, variables, cfg: StabNetConfig,
                        out_hw: Tuple[int, int], streams: int,
                        segment: int, refine: int = 1,
                        platforms: Optional[Tuple[str, ...]] = None) -> bytes:
    """Serialize a fixed-length whole-segment scan (weights baked in).

    The per-frame step artifact pays one host dispatch + readback per frame;
    this bakes `engine.scan_frames` over a (streams, segment) window instead
    — the same on-device `lax.scan` the live engine's batch serving rides —
    so `--from-export --batch` keeps the scan's throughput.  The baked
    signature is (state, gray (S, K, H, W), color (S, K, Ho, Wo, 3) uint8,
    valid (S, K) bool) -> (warped (S, K, Ho, Wo, 3) uint8, state); `valid`
    gives exact unequal-length handling (prefix mask, scan_frames docs).
    """
    use_pallas = _resolve_use_pallas(platforms)

    def seg(state, grays, colors, valid):
        return _engine.scan_frames(model, variables, state, grays, colors,
                                   cfg, refine=refine, out_hw=out_hw,
                                   use_pallas=use_pallas, valid=valid)

    S, K = streams, segment
    Ho, Wo = out_hw
    grays = jax.ShapeDtypeStruct((S, K, cfg.height, cfg.width), jnp.float32)
    colors = jax.ShapeDtypeStruct((S, K, Ho, Wo, 3), jnp.uint8)
    valid = jax.ShapeDtypeStruct((S, K), jnp.bool_)
    return _export_serialized(seg,
                              (_state0_spec(cfg, S), grays, colors, valid),
                              platforms, use_pallas)


def load_stream_step(data: bytes):
    """Deserialize an exported streaming step into a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(bytearray(data))
    return jax.jit(exported.call)


def initial_state(first_gray: np.ndarray, cfg: StabNetConfig):
    """Warm-up state for the serving process (frame 0 fills the ring)."""
    return _engine.init_state(jnp.asarray(first_gray), cfg)


# -- self-describing artifact files -------------------------------------------

_MAGIC = b"STBX1\n"


def save_artifact(path: str, data: bytes, cfg: StabNetConfig,
                  out_hw: Tuple[int, int], streams: int, refine: int,
                  platforms: Optional[Tuple[str, ...]] = None,
                  scan_data: Optional[bytes] = None,
                  segment: Optional[int] = None) -> None:
    """Write `data` with a small JSON header so a serving process can
    reconstruct the run parameters (config name, baked shapes) from the file
    alone — the reference's .meta files are similarly self-describing.

    With `scan_data`/`segment`, a baked whole-segment scan rides along after
    the step payload (`step_len` in the header marks the split) — see
    `export_scan_segment`."""
    import json

    meta = {
        "config": cfg.name,
        "out_hw": [int(out_hw[0]), int(out_hw[1])],
        "streams": int(streams),
        "refine": int(refine),
    }
    if platforms:
        meta["platforms"] = list(platforms)
    if scan_data is not None:
        if not segment or segment < 1:
            raise ValueError("scan_data needs its baked segment length")
        meta["step_len"] = len(data)
        meta["segment"] = int(segment)
        data = data + scan_data
    header = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC + len(header).to_bytes(4, "little") + header + data)


def load_artifact(path: str) -> Tuple[bytes, dict]:
    """Read an artifact file -> (jax.export bytes, metadata dict).

    Bare `jax.export` payloads (no header) load with empty metadata."""
    import json

    with open(path, "rb") as f:
        blob = f.read()
    if blob[: len(_MAGIC)] != _MAGIC:
        return blob, {}
    n = int.from_bytes(blob[len(_MAGIC): len(_MAGIC) + 4], "little")
    off = len(_MAGIC) + 4
    meta = json.loads(blob[off: off + n])
    return blob[off + n:], meta


class ExportedEngine:
    """StreamDriver-compatible engine backed by a serialized artifact.

    Serves the production streaming path with no model code or checkpoint
    plumbing — `stabilize --from-export`.  History-override ablations
    (--infer-with-*/--max-span/--random-black) are development tools of the
    live engine and are rejected here.  Color frames are resized on host to
    the artifact's baked output size when the source size differs (the baked
    step's input shapes are fixed).
    """

    def __init__(self, data: bytes, cfg: StabNetConfig,
                 out_hw: Tuple[int, int], streams: int = 1,
                 scan_data: Optional[bytes] = None,
                 segment: Optional[int] = None):
        self._fn = load_stream_step(data)
        self.cfg = cfg
        self.out_hw = (int(out_hw[0]), int(out_hw[1]))
        self.streams = int(streams)
        # Artifacts exported with --segment also carry a baked whole-segment
        # scan (export_scan_segment); batch serving then rides the on-device
        # lax.scan instead of stepping frame-wise from the host.  The
        # chunked-serving hook is exposed only when baked — the driver
        # feature-detects it via hasattr(engine, "continue_clip").
        self._scan = load_stream_step(scan_data) if scan_data else None
        self.segment = int(segment) if segment else None
        if self._scan is not None:
            self.continue_clip = self._continue_clip

    def init(self, first_gray: np.ndarray):
        return initial_state(np.asarray(first_gray), self.cfg)

    def step(self, state, cur_gray: np.ndarray, cur_color: np.ndarray,
             history_override: Optional[np.ndarray] = None):
        if history_override is not None:
            raise ValueError(
                "exported artifacts serve the production streaming path; "
                "--infer-with-*/--max-span/--random-black need a live "
                "engine (--model-dir/--tf-checkpoint)")
        from stabnet_tpu.stream.driver import StreamDriver

        color = np.asarray(cur_color)
        if color.shape[1:3] != self.out_hw:
            color = np.stack([StreamDriver._resize_color(c, self.out_hw)
                              for c in color])
        return self._fn(state, jnp.asarray(cur_gray), jnp.asarray(color))

    def _resize_clip(self, clip_color: np.ndarray) -> np.ndarray:
        if clip_color.shape[-3:-1] == self.out_hw:
            return clip_color
        from stabnet_tpu.stream.driver import StreamDriver

        return np.stack([
            np.stack([StreamDriver._resize_color(f, self.out_hw) for f in s])
            for s in clip_color])

    def _continue_clip(self, state, clip_gray: np.ndarray,
                       clip_color: np.ndarray,
                       valid: Optional[np.ndarray] = None):
        """Scan one baked-size segment from an existing state.

        Same contract as StreamEngine.continue_clip, with the segment length
        fixed at export time: clip_gray (S, K, H, W), clip_color
        (S, K, Ho, Wo, 3) uint8, valid (S, K) prefix mask (None = all valid).
        """
        S, K = clip_gray.shape[:2]
        if (S, K) != (self.streams, self.segment):
            raise ValueError(
                f"artifact scan baked for (streams, segment) = "
                f"({self.streams}, {self.segment}), got ({S}, {K}); serve "
                f"groups of {self.streams} streams in {self.segment}-frame "
                f"segments, or re-export with --streams/--segment")
        if valid is None:
            valid = np.ones((S, K), bool)
        return self._scan(state, jnp.asarray(clip_gray),
                          jnp.asarray(self._resize_clip(clip_color)),
                          jnp.asarray(np.asarray(valid, bool)))

    def stabilize_clip(self, clip_gray: np.ndarray, clip_color: np.ndarray,
                       valid: Optional[np.ndarray] = None):
        """Whole-clip batch serving: baked scan when exported with
        --segment, else through the artifact's per-frame step.

        StreamDriver.stabilize_batch-compatible: same signature and return
        contract as StreamEngine.stabilize_clip.  The artifact step has no
        validity masking (it is the baked production step), so unequal clip
        lengths are handled HOST-side: each stream's crop accumulator is
        snapshotted at its true end and the returned state carries the
        frozen per-stream maps; outputs past a clip's end are computed in
        lock-step but discarded by the caller.

        THROUGHPUT NOTE: this loop steps the artifact FRAME-wise from the
        host (one dispatch + readback per step), so `--from-export --batch`
        runs well below the live engine's `--batch` whole-clip `lax.scan`
        (which keeps all T steps on device).  The gap is inherent to the
        per-frame export signature, not a bug; serve with a live engine
        when batch throughput matters.

        clip_gray: (S, T, H, W); clip_color: (S, T, Ho, Wo, 3) uint8;
        valid: optional (S, T-1) prefix mask.
        """
        import types

        S, T = clip_gray.shape[:2]
        if S != self.streams:
            raise ValueError(f"artifact baked for {self.streams} streams, "
                             f"got a batch of {S}")
        if self._scan is not None:
            return self._stabilize_clip_scan(clip_gray, clip_color, valid)
        # Stream s's last processed step (1-based); 0 = dummy all-invalid.
        ends = (np.asarray(valid, bool).sum(axis=1) if valid is not None
                else np.full(S, T - 1))
        state = self.init(clip_gray[:, 0])
        frozen = [np.zeros(clip_gray.shape[2:], np.int32) for _ in range(S)]
        warped = []
        for t in range(1, T):
            state, out = self.step(state, clip_gray[:, t], clip_color[:, t])
            warped.append(np.asarray(out.warped_color))
            if np.any(ends == t):
                ab = np.asarray(state.all_black)
                for s in np.flatnonzero(ends == t):
                    frozen[s] = ab[s]
        return (np.stack(warped, axis=1),
                types.SimpleNamespace(all_black=np.stack(frozen)))



    def _stabilize_clip_scan(self, clip_gray: np.ndarray,
                             clip_color: np.ndarray,
                             valid: Optional[np.ndarray]):
        """Whole-clip serving on the baked segment scan.

        The clip's steps 1..T-1 run in baked-size segments (the tail padded
        with invalid repeats of the last frame, so ONE deserialized
        executable serves every segment); the scan's own validity masking
        freezes each stream's state at its true end — the host-side
        snapshot bookkeeping of the per-frame path is unnecessary here.
        """
        S, T = clip_gray.shape[:2]
        K = self.segment
        clip_color = self._resize_clip(clip_color)
        v_full = (np.asarray(valid, bool) if valid is not None
                  else np.ones((S, T - 1), bool))

        state = self.init(clip_gray[:, 0])
        chunks = []
        t = 1
        while t < T:
            k = min(K, T - t)
            g = clip_gray[:, t:t + k]
            c = clip_color[:, t:t + k]
            v = v_full[:, t - 1:t - 1 + k]
            if k < K:
                def pad_tail(a):
                    reps = [1] * a.ndim
                    reps[1] = K - k
                    return np.concatenate([a, np.tile(a[:, -1:], reps)],
                                          axis=1)

                g, c = pad_tail(g), pad_tail(c)
                v = np.concatenate([v, np.zeros((S, K - k), bool)], axis=1)
            warped, state = self._continue_clip(state, g, c, v)
            chunks.append(np.asarray(warped[:, :k]))
            t += k
        return np.concatenate(chunks, axis=1), state
