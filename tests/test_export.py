"""AOT serving-artifact export: serialize -> deserialize -> step parity.

The reference's serving artifact is the training .meta graph restored by
name (deploy_bundle.py:45-56); ours is a jax.export StableHLO blob with
weights baked in.  These tests check a step run through the deserialized
artifact matches the live engine on the same inputs.  Matching is to solver
roundoff, not bit-exact: the artifact is traced with the portable DLT
solver (ops/homography.py `portable_solve`) because the live path's LAPACK
custom calls crash when deserialized (jaxlib 0.9.0).
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream.engine import init_state, stream_step
from stabnet_tpu.stream.export import (export_stream_step, initial_state,
                                       load_stream_step)

pytestmark = pytest.mark.slow  # heavy end-to-end tier

CFG = get_config("tiny")
OUT_HW = (2 * CFG.height, 2 * CFG.width)


def _setup():
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    return model, variables


def test_export_roundtrip_matches_live_step():
    model, variables = _setup()
    data = export_stream_step(model, variables, CFG, OUT_HW, streams=1)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 0

    step = load_stream_step(data)

    rng = np.random.RandomState(0)
    gray = rng.rand(1, CFG.height, CFG.width).astype(np.float32) - 0.5
    color = rng.randint(0, 255, (1, *OUT_HW, 3), dtype=np.uint8)
    state0 = initial_state(gray, CFG)

    state1, out1 = step(state0, gray, color)
    state2, out2 = jax.jit(
        lambda s, g, c: stream_step(model, variables, s, g, c, CFG,
                                    out_hw=OUT_HW, use_pallas=False)
    )(state0, jnp.asarray(gray), jnp.asarray(color))

    # +/-1 LSB / 1e-4: the artifact's portable DLT solver rounds differently
    # than the live LAPACK solve (module docstring).
    du8 = np.abs(np.asarray(out1.warped_color).astype(np.int32)
                 - np.asarray(out2.warped_color).astype(np.int32))
    assert du8.max() <= 1, du8.max()
    np.testing.assert_allclose(np.asarray(out1.x_map),
                               np.asarray(out2.x_map), atol=1e-4)
    np.testing.assert_allclose(np.asarray(state1.frames),
                               np.asarray(state2.frames), atol=1e-4)


def test_export_multistream_refine():
    model, variables = _setup()
    data = export_stream_step(model, variables, CFG, OUT_HW, streams=2,
                              refine=2)
    step = load_stream_step(data)
    gray = np.zeros((2, CFG.height, CFG.width), np.float32)
    color = np.zeros((2, *OUT_HW, 3), np.uint8)
    state, out = step(initial_state(gray, CFG), gray, color)
    assert out.warped_color.shape == (2, *OUT_HW, 3)
    assert out.warped_color.dtype == jnp.uint8
    # the ring pointer advanced exactly once despite refine=2
    assert int(state.ptr) == int(initial_state(gray, CFG).ptr) + 1


def test_artifact_file_and_exported_engine(tmp_path):
    """save_artifact/load_artifact round-trip metadata; ExportedEngine drives
    the full StreamDriver (the `stabilize --from-export` serving path) and
    rejects the live-engine-only history ablations."""
    import pytest

    from stabnet_tpu.stream.driver import DeployOptions, StreamDriver
    from stabnet_tpu.stream.export import (ExportedEngine, load_artifact,
                                           save_artifact)

    model, variables = _setup()
    data = export_stream_step(model, variables, CFG, OUT_HW, streams=1)
    path = str(tmp_path / "step.stbx")
    save_artifact(path, data, CFG, OUT_HW, streams=1, refine=1)

    blob, meta = load_artifact(path)
    assert blob == data
    assert meta == {"config": CFG.name, "out_hw": list(OUT_HW),
                    "streams": 1, "refine": 1}

    engine = ExportedEngine(blob, CFG, meta["out_hw"])
    with pytest.raises(ValueError, match="production"):
        engine.step(engine.init(np.zeros((1, CFG.height, CFG.width),
                                         np.float32)),
                    np.zeros((1, CFG.height, CFG.width), np.float32),
                    np.zeros((1, *OUT_HW, 3), np.uint8),
                    history_override=np.zeros(1, np.float32))

    # Drive a real clip through the driver; source frames are deliberately a
    # different size than the baked output (exercises the host resize).
    from stabnet_tpu.data.synthetic import make_video

    clip = np.stack(make_video(5, CFG.height + 8, CFG.width + 8, seed=1,
                               jitter=2.0))
    res = StreamDriver(engine, DeployOptions(output_size=OUT_HW)
                       ).stabilize_clip(clip)
    assert res.frames.shape == (5, *OUT_HW, 3)
    assert np.isfinite(res.fps_net)

    # Bare payloads (no header) still load, with empty metadata.
    bare = str(tmp_path / "bare.bin")
    with open(bare, "wb") as f:
        f.write(data)
    blob2, meta2 = load_artifact(bare)
    assert blob2 == data and meta2 == {}


def test_cross_platform_tpu_export(tmp_path):
    """A CPU host lowers a full-performance TPU artifact (Pallas warp
    kernels Mosaic-lower without a device); the platform list rides in the
    artifact metadata."""
    from stabnet_tpu.ops.pallas_warp import interpret_default
    from stabnet_tpu.stream.export import load_artifact, save_artifact

    model, variables = _setup()
    # Poison the ambient default to the interpreter so the check is
    # host-independent: on a TPU CI host `interpret=None` already resolves
    # to False and the assert below would pass whether or not the export's
    # own interpret_default(False) override works.  Forcing True here means
    # the assert passes ONLY if the export path overrides it.
    with interpret_default(True):
        data = export_stream_step(model, variables, CFG, OUT_HW, streams=1,
                                  platforms=("tpu",))
    assert len(data) > 0
    # "Full-performance" must mean the MOSAIC kernels, not the interpreter
    # lowering of the Pallas warp: without the export-time
    # interpret_default(False) override the artifact would serialize a
    # serial dynamic-slice emulation of the warp (and this assert is what
    # catches that regression).
    from jax import export as jax_export

    mlir = jax_export.deserialize(bytearray(data)).mlir_module()
    assert "tpu_custom_call" in mlir
    path = str(tmp_path / "tpu.stbx")
    save_artifact(path, data, CFG, OUT_HW, streams=1, refine=1,
                  platforms=("tpu",))
    _, meta = load_artifact(path)
    assert meta["platforms"] == ["tpu"]


def test_exported_batch_serving_unequal_lengths():
    """A streams=2 artifact drives StreamDriver.stabilize_batch; each clip's
    crop accumulator is snapshotted host-side at its true end, so a shorter
    clip's result is independent of whatever lock-step padding runs after
    it."""
    import pytest

    from stabnet_tpu.data.synthetic import make_video
    from stabnet_tpu.stream.driver import DeployOptions, StreamDriver
    from stabnet_tpu.stream.export import ExportedEngine

    model, variables = _setup()
    data = export_stream_step(model, variables, CFG, OUT_HW, streams=2)
    engine = ExportedEngine(data, CFG, OUT_HW, streams=2)
    driver = StreamDriver(engine, DeployOptions(output_size=OUT_HW))

    A = np.stack(make_video(5, *OUT_HW, seed=11, jitter=2.0))
    B = np.stack(make_video(4, *OUT_HW, seed=12, jitter=2.0))
    res = driver.stabilize_batch([A, B])
    assert [len(r.frames) for r in res] == [5, 4]
    assert all(r.frames.shape[1:] == (*OUT_HW, 3) for r in res)

    # Same batch with A truncated to B's length: B's frozen accumulator and
    # valid-prefix outputs must be identical (the padded tail is discarded).
    res2 = driver.stabilize_batch([A[:4], B])
    np.testing.assert_array_equal(res[1].all_black, res2[1].all_black)
    np.testing.assert_array_equal(res[1].frames, res2[1].frames)

    # Wrong batch size vs the baked stream count is a clear error.
    with pytest.raises(ValueError, match="streams"):
        engine.stabilize_clip(np.zeros((3, 2, CFG.height, CFG.width),
                                       np.float32),
                              np.zeros((3, 2, *OUT_HW, 3), np.uint8))

    # Chunked/sharded need the live engine.
    with pytest.raises(ValueError, match="live engine"):
        driver.stabilize_batch([A, B], chunk=2)


def test_baked_scan_artifact_serves_batch(tmp_path):
    """An artifact exported with a segment scan serves whole clips on the
    on-device lax.scan: outputs match the live engine's chunked batch path
    (within the artifact's portable-solver roundoff), unequal lengths and
    the padded tail segment included, and the driver's chunked path accepts
    the engine via its continue_clip feature-detect."""
    from stabnet_tpu.data.synthetic import make_video
    from stabnet_tpu.stream import StreamEngine
    from stabnet_tpu.stream.export import (ExportedEngine,
                                           export_scan_segment, load_artifact,
                                           save_artifact)
    from stabnet_tpu.stream.video_io import to_gray_train

    model, variables = _setup()
    S, K, T = 2, 4, 10  # T-1=9 steps -> 2 full segments + padded tail
    step_data = export_stream_step(model, variables, CFG, OUT_HW, streams=S)
    scan_data = export_scan_segment(model, variables, CFG, OUT_HW,
                                    streams=S, segment=K)
    path = str(tmp_path / "scan.stbx")
    save_artifact(path, step_data, CFG, OUT_HW, S, 1,
                  scan_data=scan_data, segment=K)
    data, meta = load_artifact(path)
    assert meta["segment"] == K
    step_len = meta["step_len"]
    eng = ExportedEngine(data[:step_len], CFG, OUT_HW, streams=S,
                         scan_data=data[step_len:], segment=K)
    assert hasattr(eng, "continue_clip")

    # Unequal lengths: clip 0 uses all T frames, clip 1 only 7.
    clips = [np.stack(make_video(T, *OUT_HW, seed=s, jitter=3.0))
             for s in range(S)]
    lengths = [T, 7]
    grays = np.zeros((S, T, CFG.height, CFG.width), np.float32)
    colors = np.zeros((S, T, *OUT_HW, 3), np.uint8)
    valid = np.zeros((S, T - 1), bool)
    for s in range(S):
        for t in range(lengths[s]):
            grays[s, t] = to_gray_train(clips[s][t], CFG.height, CFG.width,
                                        CFG.crop_rate if t == 0 else 1.0)
            colors[s, t] = clips[s][t]
        grays[s, lengths[s]:] = grays[s, lengths[s] - 1]
        colors[s, lengths[s]:] = colors[s, lengths[s] - 1]
        valid[s, : lengths[s] - 1] = True

    warped_art, state_art = eng.stabilize_clip(grays, colors, valid=valid)

    # The strong guarantee: the baked scan equals the SAME artifact's
    # per-frame step loop on every VALID step (identical solver, identical
    # state feedback; post-end padded steps are discarded-garbage by
    # contract — the scan freezes a stream's state at its end while the
    # step loop keeps stepping it, so only valid outputs are comparable).
    eng_step = ExportedEngine(data[:step_len], CFG, OUT_HW, streams=S)
    warped_step, state_step = eng_step.stabilize_clip(grays, colors,
                                                      valid=valid)
    d = np.abs(np.asarray(warped_art).astype(np.int32)
               - np.asarray(warped_step).astype(np.int32))
    assert d[valid].max() <= 1, d[valid].max()
    # Unequal-length semantics match: the scan's on-device validity freeze
    # lands on the same accumulators as the step path's host-side
    # snapshot-at-end bookkeeping.
    np.testing.assert_array_equal(np.asarray(state_art.all_black),
                                  np.asarray(state_step.all_black))

    # Against the LIVE engine only the first step is tight: the artifact's
    # portable DLT solver rounds differently than LAPACK (module docstring)
    # and the difference compounds through the stabilized-history feedback
    # (observed up to ~2e2 uint8 at step 9 on random weights).
    live = StreamEngine(model, variables, CFG, out_hw=OUT_HW)
    warped_live, _ = live.stabilize_clip(grays, colors, valid=valid)
    d0 = np.abs(np.asarray(warped_art)[:, 0].astype(np.int32)
                - np.asarray(warped_live)[:, 0].astype(np.int32))
    assert d0.max() <= 1, d0.max()

    # Wrong segment size errors clearly instead of mis-serving.
    import pytest as _pytest
    with _pytest.raises(ValueError, match="baked for"):
        eng.continue_clip(eng.init(grays[:, 0]), grays[:, 1:4],
                          colors[:, 1:4])


def test_baked_scan_artifact_streaming_file(tmp_path):
    """Constant-memory file serving (--stream-chunk) from a baked-scan
    artifact: serves at the baked segment length, and a mismatched chunk
    fails BEFORE any output file is created (the round-2 failure mode was a
    mid-run error leaving a truncated 1-frame output on disk)."""
    import os

    from stabnet_tpu.data.synthetic import make_video
    from stabnet_tpu.stream import DeployOptions, StreamDriver, video_io
    from stabnet_tpu.stream.export import ExportedEngine, export_scan_segment

    if not video_io.HAVE_CV2:
        pytest.skip("needs OpenCV file I/O")

    model, variables = _setup()
    K, T = 4, 10
    step_data = export_stream_step(model, variables, CFG, OUT_HW, streams=1)
    scan_data = export_scan_segment(model, variables, CFG, OUT_HW,
                                    streams=1, segment=K)
    eng = ExportedEngine(step_data, CFG, OUT_HW, streams=1,
                         scan_data=scan_data, segment=K)
    driver = StreamDriver(eng, DeployOptions(output_size=OUT_HW))

    clip = make_video(T, *OUT_HW, seed=2, jitter=3.0)
    src = str(tmp_path / "clip.avi")
    w = video_io.VideoWriter(src, 30.0, OUT_HW)
    for f in clip:
        w.write(f)
    w.close()

    # Mismatched chunk: clear error, and nothing written to disk.
    with pytest.raises(ValueError, match="baked"):
        driver.stabilize_file(src, str(tmp_path / "bad"),
                              stream_chunk=K + 1)
    assert not os.path.exists(str(tmp_path / "bad"))

    res = driver.stabilize_file(src, str(tmp_path / "out"), stream_chunk=K)
    assert res.frames is None  # constant-memory contract: nothing buffered
    assert res.num_frames == T
    out_path = str(tmp_path / "out" / "output" / "clip.avi.avi")
    out = np.stack(list(video_io.VideoReader(out_path,
                                             allow_half_rate=False)))
    assert out.shape == (T, *OUT_HW, 3)

    # Same accumulators as the artifact's batch path on the decoded frames
    # (both ride the identical baked segment scan).
    decoded = np.stack(list(video_io.VideoReader(src)))
    res_batch = driver.stabilize_batch([decoded])[0]  # chunk auto-adopts K
    assert res.crop_rect == res_batch.crop_rect
    np.testing.assert_array_equal(res.all_black, res_batch.all_black)
