"""Serving-mode equivalences: pipelined readback, device-side gray,
constant-memory streaming file serving.

Pipelining and streaming are host-side restructurings of the same device
programs, so their outputs must match the synchronous/buffered paths exactly
(pipelined) or segment-for-segment (streaming vs the chunked batch scan).
Device-gray is a documented sub-1/255 deviation (engine.gray_from_color).
"""

import os

import jax
import numpy as np
import pytest

from stabnet_tpu.config import get_config
from stabnet_tpu.data.synthetic import make_video
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream import DeployOptions, StreamDriver, StreamEngine
from stabnet_tpu.stream import video_io
from stabnet_tpu.stream.engine import gray_from_color
from stabnet_tpu.stream.video_io import to_gray_train

CFG = get_config("tiny")


def build_driver(**opt_kw):
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    engine = StreamEngine(model, variables, CFG)
    return StreamDriver(engine, DeployOptions(**opt_kw))


def test_reconcile_chunk():
    """Chunk-vs-baked-segment reconciliation (one owner for CLI and API):
    live engines pass requests through; baked artifacts force their segment
    and reject conflicts before any output exists."""

    class FakeLive:
        cfg = CFG

    class FakeBaked:
        cfg = CFG
        segment = 64

    from stabnet_tpu.stream import StreamDriver

    live = StreamDriver(FakeLive())
    assert live.reconcile_chunk(None) is None
    assert live.reconcile_chunk(16) == 16

    baked = StreamDriver(FakeBaked())
    assert baked.reconcile_chunk(None) == 64   # adopt the baked length
    assert baked.reconcile_chunk(64) == 64
    with pytest.raises(ValueError, match="baked 64-frame"):
        baked.reconcile_chunk(16)


@pytest.mark.slow
def test_pipelined_matches_sync():
    """The 1-frame readback lag must not change a single output byte."""
    clip = make_video(7, CFG.height, CFG.width, seed=3, jitter=3.0)
    res_sync = build_driver(pipelined=False).stabilize_clip(clip)
    res_pipe = build_driver(pipelined=None).stabilize_clip(clip)
    np.testing.assert_array_equal(res_pipe.frames, res_sync.frames)
    assert res_pipe.crop_rect == res_sync.crop_rect
    # The decomposition is recorded for the latency story.
    assert "dispatch" in res_pipe.stage_summary
    assert "readback" in res_pipe.stage_summary
    assert res_pipe.stage_summary["dispatch"]["count"] == len(clip) - 1


@pytest.mark.slow
def test_pipelined_rejects_sync_modes():
    driver = build_driver(pipelined=True, deploy_vis=True)
    clip = make_video(4, CFG.height, CFG.width, seed=0)
    with pytest.raises(ValueError, match="pipelined"):
        driver.stabilize_clip(clip)


def test_device_gray_matches_host_conversion():
    """gray_from_color == to_gray_train within the documented < 1/255 x2."""
    frame = make_video(1, 96, 128, seed=5)[0]
    host = to_gray_train(frame, CFG.height, CFG.width)
    dev = np.asarray(gray_from_color(frame[None].astype(np.uint8),
                                     (CFG.height, CFG.width)))[0]
    assert np.abs(dev - host).max() < 2.5 / 255.0


@pytest.mark.slow
def test_device_gray_end_to_end():
    """device_gray serves the clip with outputs close to the host-gray path."""
    clip = make_video(6, CFG.height, CFG.width, seed=4, jitter=2.0)
    res_host = build_driver().stabilize_clip(clip)
    res_dev = build_driver(device_gray=True).stabilize_clip(clip)
    assert res_dev.frames.shape == res_host.frames.shape
    # The tiny random-weight net is a smooth function of its input; the
    # sub-1/255 gray deviation must not move the warped output far.
    diff = (res_dev.frames.astype(np.int32)
            - res_host.frames.astype(np.int32))
    assert np.abs(diff).mean() < 4.0, np.abs(diff).mean()


@pytest.mark.skipif(not video_io.HAVE_CV2, reason="needs OpenCV file I/O")
@pytest.mark.slow
def test_streaming_file_matches_chunked_batch(tmp_path):
    """--stream-chunk output == the chunked batch scan, frame for frame.

    Both paths run engine.continue_clip on identical K-frame segments, so
    the warped frames agree bit-exactly; the written videos then decode
    identically.  T=23 with K=8 exercises the padded tail segment.
    """
    T, K = 23, 8
    clip = make_video(T, 96, 128, seed=7, jitter=3.0)
    src = str(tmp_path / "clip.avi")
    w = video_io.VideoWriter(src, 30.0, (96, 128))
    for f in clip:
        w.write(f)
    w.close()
    # What the file path will actually see (MJPG-decoded frames).
    decoded = np.stack(list(video_io.VideoReader(src)))

    driver = build_driver(output_size=(96, 128))
    res_stream = driver.stabilize_file(src, str(tmp_path / "streamed"),
                                       stream_chunk=K)
    assert res_stream.frames is None        # nothing buffered
    assert res_stream.num_frames == T

    res_batch = driver.stabilize_batch([decoded], chunk=K)[0]
    assert res_stream.crop_rect == res_batch.crop_rect
    np.testing.assert_array_equal(res_stream.all_black, res_batch.all_black)

    out_path = str(tmp_path / "streamed" / "output" / "clip.avi.avi")
    streamed = np.stack(list(video_io.VideoReader(out_path,
                                                  allow_half_rate=False)))
    ref = str(tmp_path / "ref.avi")
    w = video_io.VideoWriter(ref, 30.0, (96, 128))
    for f in res_batch.frames:
        w.write(f)
    w.close()
    ref_decoded = np.stack(list(video_io.VideoReader(ref,
                                                     allow_half_rate=False)))
    np.testing.assert_array_equal(streamed, ref_decoded)

    # The cut video exists and matches the scaled crop rectangle's size.
    cut_path = str(tmp_path / "streamed" / "output" / "clip.avi_cut.avi")
    cut = np.stack(list(video_io.VideoReader(cut_path,
                                             allow_half_rate=False)))
    top, left, bot, right = res_stream.crop_rect
    sy, sx = 96 / CFG.height, 128 / CFG.width
    expect_h = int(np.floor((bot + 1) * sy)) - int(np.ceil(top * sy))
    expect_w = int(np.floor((right + 1) * sx)) - int(np.ceil(left * sx))
    assert cut.shape == (T, expect_h, expect_w, 3)


def test_streaming_file_rejects_ablations(tmp_path):
    driver = build_driver(deploy_vis=True)
    with pytest.raises(ValueError, match="streaming file serving"):
        driver.stabilize_file("whatever.avi", str(tmp_path), stream_chunk=4)


@pytest.mark.slow
@pytest.mark.skipif(not video_io.HAVE_CV2, reason="needs OpenCV file I/O")
def test_streaming_file_bounded_memory(tmp_path):
    """A long clip streams within a host-memory bound far below its size.

    600 frames of 192x256x3 output is ~88 MB buffered (plus model-scale
    grays); the streaming path must hold only O(chunk) of it.  Each
    measurement runs in a FRESH subprocess and reports whole-process peak
    RSS (ru_maxrss is a lifetime high-water mark, so in-process deltas flake
    with test ordering): 10x the frames must not move the peak by more than
    a fraction of what buffering would add.
    """
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__),
                          "streaming_rss_worker.py")

    def run(T):
        clip_path = str(tmp_path / f"long_{T}.avi")
        w = video_io.VideoWriter(clip_path, 30.0, (192, 256))
        rng = np.random.RandomState(0)
        base = make_video(1, 192, 256, seed=11)[0]
        for t in range(T):
            dx = int(rng.uniform(-4, 4))
            w.write(np.roll(base, dx, axis=1))
        w.close()
        proc = subprocess.run(
            [sys.executable, worker, clip_path, str(tmp_path / f"out_{T}"),
             "16", "192", "256"],
            capture_output=True, text=True, timeout=1200)
        assert proc.returncode == 0, proc.stderr[-2000:]
        return int(proc.stdout.strip().split()[-1])  # peak RSS, KB on Linux

    peak_short = run(60)
    peak_long = run(600)
    # Buffering 540 extra output frames would add ~80 MB to the long run's
    # peak; the streaming path's peak must stay flat in T.
    assert peak_long - peak_short < 40_000, (peak_short, peak_long)
