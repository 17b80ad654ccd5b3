"""StabNet-TPU CLI.

Usage:
  python -m stabnet_tpu.cli.main train --config v2_93 --data data/ [--restore]
  python -m stabnet_tpu.cli.main stabilize --model-dir models/v2_93 \
      --test-list data_video/test_list --prefix data_video [options]
  python -m stabnet_tpu.cli.main bench
  python -m stabnet_tpu.cli.main convert-ckpt --tf-checkpoint model-80000 --out ckpt/
  python -m stabnet_tpu.cli.main convert-data --records data/train --out shards/train
  python -m stabnet_tpu.cli.main make-synthetic --out shards/train --num 256

Mirrors the reference CLIs: train_bundle_nobm.py:34-37 (train) and
deploy_bundle.py:12-31 (stabilize, including every ablation flag).
"""

from __future__ import annotations

import argparse
import os
import sys


def _honor_jax_platforms_env() -> None:
    """Re-apply the user's explicit JAX_PLATFORMS choice.

    Site PJRT plugins may force their own platform list at import time,
    overriding the documented JAX_PLATFORMS env-var semantics; a user who
    set JAX_PLATFORMS=cpu then silently runs (or blocks) on the plugin's
    backend.  Restoring the env value before any backend initializes keeps
    the CLI's platform selection portable.  A CPU backend is kept
    registered (without changing the default backend) so determinism-
    pinned paths — `stabilize --metrics` scoring — keep working under an
    accelerator-only JAX_PLATFORMS (utils/platforms.py).
    """
    from stabnet_tpu.utils import honor_jax_platforms_env

    honor_jax_platforms_env(keep_cpu=True)


def _load_variables(model, cfg, tf_checkpoint=None, model_dir=None,
                    what="using"):
    """Resolve model variables from --tf-checkpoint / --model-dir / random.

    Shared by `stabilize` and `export` (same flag semantics; the reference
    always loads from its TF checkpoint dir, deploy_bundle.py:45-46).
    """
    import jax

    from stabnet_tpu.models import init_variables

    if tf_checkpoint:
        from stabnet_tpu.compat import convert_stabnet_checkpoint

        return convert_stabnet_checkpoint(tf_checkpoint)
    if model_dir:
        from stabnet_tpu.train import checkpoint as ckpt
        from stabnet_tpu.train.state import create_train_state

        state = ckpt.restore(
            model_dir, create_train_state(model, cfg, jax.random.PRNGKey(0)))
        return {"params": state.params, "batch_stats": state.batch_stats}
    print(f"warning: no checkpoint given; {what} random weights",
          file=sys.stderr)
    return init_variables(model, cfg, jax.random.PRNGKey(0))


def _read_video_lists(paths, allow_names=False):
    """Video names from list file(s); with `allow_names`, bare names pass
    through (reference --test-list semantics, deploy_bundle.py:20)."""
    names = []
    for list_path in paths:
        if os.path.isfile(list_path):
            with open(list_path) as f:
                names.extend(v.strip() for v in f.read().split("\n") if v.strip())
        elif allow_names:
            names.append(list_path)
    return names


def _add_stabilize_args(p: argparse.ArgumentParser):
    # Reference flags: deploy_bundle.py:12-31.
    p.add_argument("--model-dir", required=False, default=None,
                   help="orbax checkpoint dir (omit for random weights)")
    p.add_argument("--tf-checkpoint", default=None,
                   help="reference TF checkpoint (converted on the fly)")
    p.add_argument("--output-dir", default="data_video_local")
    p.add_argument("--infer-with-stable", action="store_true")
    p.add_argument("--infer-with-last", action="store_true")
    p.add_argument("--test-list", nargs="+",
                   default=["data_video/test_list", "data_video/train_list_deploy"])
    p.add_argument("--prefix", default="data_video")
    p.add_argument("--max-span", type=int, default=1)
    p.add_argument("--random-black", type=int, default=None)
    p.add_argument("--start-with-stable", action="store_true")
    # Default None (= 1) so an explicit --refine can be detected and checked
    # against a serving artifact's baked value.
    p.add_argument("--refine", type=int, default=None)
    p.add_argument("--deploy-vis", action="store_true")
    p.add_argument("--metrics", action="store_true",
                   help="print stability/cropping/distortion scores per clip "
                        "(stabnet_tpu.eval)")
    p.add_argument("--config", default="v2_93")
    p.add_argument("--output-size", type=int, nargs=2, default=None,
                   metavar=("H", "W"))
    p.add_argument("--from-export", default=None, metavar="ARTIFACT",
                   help="serve from an `export` artifact (no model code or "
                        "checkpoints; production path only)")
    p.add_argument("--batch", type=int, default=1, metavar="S",
                   help="stabilize S clips concurrently via the on-device "
                        "whole-clip scan (throughput mode; production path "
                        "only)")
    p.add_argument("--batch-chunk", type=int, default=None, metavar="T",
                   help="scan the time axis in T-frame segments (bounded "
                        "device memory for long clips)")
    p.add_argument("--batch-sharded", action="store_true",
                   help="shard the batch over all local devices "
                        "(S divisible by device count)")
    p.add_argument("--stream-chunk", type=int, default=None, metavar="K",
                   help="constant-host-memory file serving: read, stabilize, "
                        "and write K frames at a time (production path only; "
                        "host RAM bounded by K for arbitrarily long clips)")
    p.add_argument("--device-gray", action="store_true",
                   help="derive the model-scale gray on device from the "
                        "uploaded color frame (kills the separate per-frame "
                        "gray upload; < 1/255 from the host conversion)")
    p.add_argument("--no-pipeline", action="store_true",
                   help="disable the 1-frame readback lag in per-frame "
                        "serving (pipelining is on by default in production "
                        "mode; results are identical either way)")


def cmd_train(args):
    from stabnet_tpu.config import get_config
    from stabnet_tpu.data.pipeline import InputPipeline
    from stabnet_tpu.parallel import initialize_distributed
    from stabnet_tpu.train.loop import train

    initialize_distributed()  # no-op unless a coordinator is configured

    cfg = get_config(args.config)
    if args.set:
        from stabnet_tpu.config import apply_overrides

        cfg = apply_overrides(cfg, args.set)
    if args.model_dir:
        cfg = cfg.replace(model_dir=args.model_dir)
    if args.log_dir:
        cfg = cfg.replace(log_dir=args.log_dir)

    import jax

    test_dir = os.path.join(args.data, "test")
    # The resume step feeds the pipelines twice over: the TV-L1 solve is
    # skipped while the temporal-loss gate is closed (flow_from_step), and
    # the shuffle/augmentation streams are decorrelated so a restored
    # segment continues with fresh batches instead of replaying the head
    # (essential for save/restore chains, scripts/train_chain.sh).
    resume_step = 0
    if args.restore:
        from stabnet_tpu.train.checkpoint import latest_step

        resume_step = latest_step(cfg.model_dir) or 0
    flow_from = cfg.do_temp_loss_iter
    if args.data_parallel and jax.process_count() > 1:
        # Multi-host: each process reads its disjoint stream shard and feeds
        # its local chips; batches arrive globally sharded over the mesh.
        from stabnet_tpu.parallel import MultiHostPipeline, data_mesh

        mesh = data_mesh()
        train_it = MultiHostPipeline(os.path.join(args.data, "train"), cfg,
                                     mesh, seed=args.seed,
                                     compute_flow=args.compute_flow,
                                     flow_from_step=flow_from,
                                     start_step=resume_step)
        test_it = (
            MultiHostPipeline(test_dir, cfg, mesh, seed=args.seed + 1,
                              compute_flow=args.compute_flow)
            if os.path.isdir(test_dir) else None
        )
    else:
        train_it = InputPipeline(os.path.join(args.data, "train"), cfg,
                                 seed=args.seed,
                                 compute_flow=args.compute_flow,
                                 flow_from_step=flow_from,
                                 start_step=resume_step)
        test_it = (
            InputPipeline(test_dir, cfg, seed=args.seed + 1,
                          compute_flow=args.compute_flow)
            if os.path.isdir(test_dir) else None
        )
    train(cfg, iter(train_it), test_it and iter(test_it), restore=args.restore,
          num_steps=args.steps, use_mesh=args.data_parallel, seed=args.seed,
          debug_vis=args.debug_vis, imagenet_ckpt=args.imagenet_ckpt,
          tensorboard=args.tensorboard)


def cmd_stabilize(args):
    from stabnet_tpu.config import get_config
    from stabnet_tpu.models import make_model
    from stabnet_tpu.stream import DeployOptions, StreamDriver, StreamEngine

    output_size = tuple(args.output_size) if args.output_size else None
    refine = args.refine if args.refine is not None else 1
    if args.from_export:
        # Serve from an AOT artifact: no model code or checkpoint plumbing.
        from stabnet_tpu.stream.export import ExportedEngine, load_artifact

        if (args.infer_with_stable or args.infer_with_last
                or args.max_span > 1 or args.random_black is not None):
            raise SystemExit(
                "--from-export serves the production path; the history "
                "ablations need a live engine (--model-dir/--tf-checkpoint)")
        if args.device_gray:
            raise SystemExit(
                "--device-gray needs a live engine: export artifacts bake "
                "the (state, gray, color) step signature")
        data, meta = load_artifact(args.from_export)
        cfg = get_config(meta.get("config", args.config))
        out_hw = meta.get("out_hw") or output_size
        if out_hw is None:
            raise SystemExit("artifact has no metadata; pass --output-size "
                             "matching the exported shapes")
        if (meta.get("out_hw") and output_size
                and tuple(meta["out_hw"]) != output_size):
            raise SystemExit(
                f"--output-size {output_size} conflicts with the artifact's "
                f"baked {tuple(meta['out_hw'])}; re-export for a different "
                f"size or drop the flag")
        # The refine count is baked into the artifact; a conflicting
        # explicit flag must error, not silently serve the baked one.
        if (args.refine is not None and "refine" in meta
                and meta["refine"] != args.refine):
            raise SystemExit(
                f"--refine {args.refine} conflicts with the artifact's "
                f"baked refine={meta['refine']}; re-export or drop the flag")
        refine = meta.get("refine", refine)
        if not meta and args.batch > 1:
            raise SystemExit(
                "artifact has no metadata (bare jax.export payload), so its "
                "baked stream count is unknown; re-export to get a "
                "self-describing artifact")
        streams = meta.get("streams", 1)
        if args.batch > 1:
            if streams != args.batch:
                raise SystemExit(f"artifact baked for {streams} streams; "
                                 f"use --batch {streams}")
        elif streams != 1:
            raise SystemExit(f"artifact baked for {streams} streams; pass "
                             f"--batch {streams} to serve it, or export "
                             f"with --streams 1")
        step_len = meta.get("step_len")
        scan_data = data[step_len:] if step_len is not None else None
        engine = ExportedEngine(data[:step_len] if step_len is not None
                                else data,
                                cfg, out_hw, streams=streams,
                                scan_data=scan_data,
                                segment=meta.get("segment"))
        output_size = tuple(out_hw)
    else:
        cfg = get_config(args.config)
        model = make_model(cfg)
        variables = _load_variables(model, cfg, args.tf_checkpoint,
                                    args.model_dir)
        engine = StreamEngine(
            model, variables, cfg, refine=refine,
            out_hw=output_size,
        )
    opt = DeployOptions(
        refine=refine, max_span=args.max_span,
        infer_with_stable=args.infer_with_stable,
        infer_with_last=args.infer_with_last,
        start_with_stable=args.start_with_stable,
        random_black=args.random_black, deploy_vis=args.deploy_vis,
        output_size=output_size,
        collect_input_gray=args.metrics,
        pipelined=False if args.no_pipeline else None,
        device_gray=args.device_gray,
    )
    driver = StreamDriver(engine, opt)

    videos = _read_video_lists(args.test_list)
    if args.stream_chunk is not None and (args.batch > 1 or args.metrics):
        raise SystemExit("--stream-chunk is the single-clip constant-memory "
                         "path; it keeps no frames in host RAM, so --batch "
                         "and --metrics are incompatible with it")
    if args.stream_chunk is not None:
        # Fail fast on a baked-segment conflict, before any clip is decoded
        # or any output file created (stabilize_file re-checks per call).
        try:
            driver.reconcile_chunk(args.stream_chunk)
        except ValueError as e:
            raise SystemExit(f"--stream-chunk: {e}")
    if args.batch > 1:
        _stabilize_batched(args, driver, videos)
        return
    failures = 0
    for name in videos:
        try:
            res = driver.stabilize_file(
                os.path.join(args.prefix, "unstable", name),
                args.output_dir,
                stable_path=os.path.join(args.prefix, "stable", name),
                stream_chunk=args.stream_chunk,
            )
            if args.metrics:
                import json

                from stabnet_tpu.eval import score_stabilized_clip

                # input_gray decoded once in stabilize_file; the same record
                # the quality gate scores, incl. the input's own stability
                # and the retained crop area.
                scores = score_stabilized_clip(
                    res.frames, res.input_gray, (cfg.height, cfg.width),
                    crop_rect=res.crop_rect)
                scores["video"] = name
                print(json.dumps(scores))
        except Exception as e:  # keep going; one bad clip must not kill the batch
            failures += 1
            print(f"error: {name}: {e}", file=sys.stderr)
    if failures:
        print(f"{failures}/{len(videos)} videos failed", file=sys.stderr)
        sys.exit(1)


def _stabilize_batched(args, driver, videos):
    """--batch N: stabilize groups of N clips concurrently via the on-device
    whole-clip scan (the bench.py throughput path as a serving mode).

    Groups are padded to N streams with dummy all-invalid streams and the
    time axis is chunked (default 64 frames), so ONE compiled executable
    serves every group — without this, each group's padded length would be a
    fresh static scan length and trigger a fresh XLA compile."""
    import numpy as np

    from stabnet_tpu.stream import video_io

    # An artifact with a baked scan fixes the segment length at export time;
    # the driver owns the reconciliation (stabilize_batch re-checks it for
    # API callers) — fail fast here before any video is decoded.
    try:
        chunk = driver.reconcile_chunk(args.batch_chunk)
    except ValueError as e:
        raise SystemExit(f"--batch-chunk: {e}")
    auto_chunk = (chunk is None and not args.batch_sharded
                  and hasattr(driver.engine, "continue_clip"))
    failures = 0
    for lo in range(0, len(videos), args.batch):
        group = videos[lo : lo + args.batch]
        clips, fps_list, names = [], [], []
        for name in group:
            try:
                reader = video_io.VideoReader(
                    os.path.join(args.prefix, "unstable", name))
                clip = np.stack(list(reader))
                fps = reader.fps
                reader.close()
                if len(clip) < 2:
                    raise ValueError(f"{len(clip)} frames (need at least 2)")
                clips.append(clip)
                fps_list.append(fps)
                names.append(name)
            except Exception as e:
                failures += 1
                print(f"error: {name}: {e}", file=sys.stderr)
        if not clips:
            continue
        if auto_chunk:
            # Sized from the first group (then FIXED, to keep the
            # one-executable property): 64 bounds device memory for long
            # clips without padding short ones to 16x their length.
            chunk = min(64, max(len(c) for c in clips) - 1)
            auto_chunk = False
        try:
            results = driver.stabilize_batch(
                clips, chunk=chunk, sharded=args.batch_sharded,
                pad_streams=args.batch)
        except Exception as e:
            failures += len(clips)
            print(f"error: batch {names}: {e}", file=sys.stderr)
            continue
        prod = os.path.join(args.output_dir, "output")
        os.makedirs(prod, exist_ok=True)
        for name, fps, res in zip(names, fps_list, results):
            base = os.path.basename(name)  # same layout as stabilize_file
            driver._write_video(os.path.join(prod, base + ".avi"),
                                res.frames, fps)
            driver._write_video(os.path.join(prod, base + "_cut.avi"),
                                res.cropped, fps)
            print(f"{name}: {len(res.frames)} frames, batch fps={res.fps_net:.1f}, "
                  f"crop={res.crop_rect}")
            if args.metrics:
                import json

                from stabnet_tpu.eval import score_stabilized_clip

                scores = score_stabilized_clip(
                    res.frames, res.input_gray,
                    (driver.cfg.height, driver.cfg.width),
                    crop_rect=res.crop_rect)
                scores["video"] = name
                print(json.dumps(scores))
    if failures:
        print(f"{failures}/{len(videos)} videos failed", file=sys.stderr)
        sys.exit(1)


def cmd_evaluate(args):
    """Score stabilized output(s): stability / cropping / distortion.

    The reference repo has no metric tooling at all — quality is judged by
    watching the videos.  This scores clips with the standard Bundled-Camera-
    Paths metrics (the ones the StabNet paper reports), computed from the
    framework's own on-device TV-L1 flow (stabnet_tpu/eval/metrics.py).
    """
    import json

    import numpy as np

    from stabnet_tpu.config import get_config
    from stabnet_tpu.eval import evaluate_clip
    from stabnet_tpu.stream.video_io import VideoReader, to_gray_train

    cfg = get_config(args.config)

    def read_gray(path, limit):
        frames = []
        r = VideoReader(path)
        for f in r:
            frames.append(to_gray_train(f, cfg.height, cfg.width))
            if limit and len(frames) >= limit:
                break
        r.close()
        if not frames:
            raise ValueError(f"no frames decoded from {path}")
        return np.stack(frames)

    out = read_gray(args.output, args.max_frames)
    inp = None
    if args.input:
        inp = read_gray(args.input, args.max_frames)
        n = min(len(out), len(inp))
        out, inp = out[:n], inp[:n]
    scores = evaluate_clip(out, inp)
    scores["frames"] = int(out.shape[0])
    print(json.dumps(scores))


def cmd_bench(args):
    import runpy

    sys.argv = ["bench.py"]
    path = os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")
    if os.path.exists(path):
        runpy.run_path(path, run_name="__main__")
    else:
        # Installed package: bench ships as a top-level module (pyproject
        # py-modules), not a repo-root file.
        runpy.run_module("bench", run_name="__main__")


def cmd_convert_ckpt(args):
    import jax

    from stabnet_tpu.compat import convert_stabnet_checkpoint
    from stabnet_tpu.config import get_config
    from stabnet_tpu.models import make_model
    from stabnet_tpu.train import checkpoint as ckpt
    from stabnet_tpu.train.state import create_train_state

    cfg = get_config(args.config)
    variables = convert_stabnet_checkpoint(args.tf_checkpoint)
    model = make_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    state = state.replace(params=variables["params"],
                          batch_stats=variables["batch_stats"])
    ckpt.save(args.out, state, step=0)
    print(f"converted {args.tf_checkpoint} -> {args.out}")


def cmd_convert_data(args):
    from stabnet_tpu.compat.tfrecord import convert_dataset
    from stabnet_tpu.config import get_config

    n = convert_dataset(args.records, args.out, get_config(args.config),
                        limit=args.limit)
    print(f"converted {n} examples -> {args.out}")


def cmd_inspect_data(args):
    from stabnet_tpu.config import get_config
    from stabnet_tpu.data.visualize import inspect_dataset

    inspect_dataset(args.records, args.out, get_config(args.config),
                    num=args.num)
    print(f"wrote inspection dumps -> {args.out}")


def cmd_export(args):
    """Serialize the streaming step as a serving artifact (jax.export)."""
    import numpy as np

    from stabnet_tpu.config import get_config
    from stabnet_tpu.models import make_model
    from stabnet_tpu.stream.export import (export_stream_step, initial_state,
                                           load_stream_step, save_artifact)

    cfg = get_config(args.config)
    model = make_model(cfg)
    variables = _load_variables(model, cfg, args.tf_checkpoint,
                                args.model_dir, what="exporting")

    out_hw = tuple(args.output_size)
    platforms = tuple(args.platforms) if args.platforms else None
    data = export_stream_step(model, variables, cfg, out_hw,
                              streams=args.streams, refine=args.refine,
                              platforms=platforms)
    scan_data = None
    if args.segment:
        from stabnet_tpu.stream.export import export_scan_segment

        scan_data = export_scan_segment(model, variables, cfg, out_hw,
                                        streams=args.streams,
                                        segment=args.segment,
                                        refine=args.refine,
                                        platforms=platforms)
    save_artifact(args.out, data, cfg, out_hw, args.streams, args.refine,
                  platforms=platforms, scan_data=scan_data,
                  segment=args.segment)
    total = len(data) + (len(scan_data) if scan_data else 0)
    print(f"exported {total / 1e6:.1f} MB -> {args.out}"
          + (f" (+{args.segment}-frame scan)" if scan_data else "")
          + (f" (platforms: {', '.join(platforms)})" if platforms else ""))

    if args.selftest:
        import jax

        backend = jax.default_backend()
        if platforms and backend not in platforms and not (
                backend == "axon" and "tpu" in platforms):
            print(f"selftest skipped: artifact lowered for "
                  f"{', '.join(platforms)}; current backend is {backend}")
            return
        step = load_stream_step(data)
        S, (Ho, Wo) = args.streams, out_hw
        gray = np.zeros((S, cfg.height, cfg.width), np.float32)
        color = np.zeros((S, Ho, Wo, 3), np.uint8)
        state0 = initial_state(gray, cfg)
        _, out = step(state0, gray, color)
        assert out.warped_color.shape == (S, Ho, Wo, 3)
        print("selftest: deserialized artifact ran one step OK")


def cmd_make_dataset(args):
    """Raw stable/unstable video pairs -> training shards.

    Closes the reference's hard dependency on the pre-baked DeepStab
    TFRecords: feature matches are computed here (ORB + RANSAC,
    stabnet_tpu.data.ingest) and optical flow on device at train time
    (--compute-flow)."""
    from stabnet_tpu.config import get_config
    from stabnet_tpu.data.ingest import build_dataset

    cfg = get_config(args.config)
    names = _read_video_lists(args.list, allow_names=True)
    n = build_dataset(args.prefix, names, args.out, cfg, stride=args.stride,
                      max_per_video=args.max_per_video)
    print(f"wrote {n} examples -> {args.out}")
    print("note: shards carry no flow field; train with --compute-flow")


def cmd_make_synthetic(args):
    from stabnet_tpu.config import get_config
    from stabnet_tpu.data.records import write_synthetic_dataset

    write_synthetic_dataset(args.out, get_config(args.config), args.num,
                            seed=args.seed)
    print(f"wrote {args.num} synthetic examples -> {args.out}")


def main(argv=None):
    _honor_jax_platforms_env()
    from stabnet_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    parser = argparse.ArgumentParser(prog="stabnet-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train StabNet (train_bundle_nobm equivalent)")
    p.add_argument("--config", default="v2_93")
    p.add_argument("--data", default="data/")
    p.add_argument("--model-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--restore", action="store_true")
    p.add_argument("--imagenet-ckpt", default=None,
                   help="slim ImageNet resnet_v2_50.ckpt for cold-start "
                        "transfer (train_bundle_nobm.py:184-191 equivalent)")
    p.add_argument("--debug-vis", action="store_true",
                   help="dump per-eval debug mosaics (save_warpped_features equivalent)")
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror metrics (and --debug-vis mosaics) to "
                        "TensorBoard event files under <log-dir>/tb "
                        "(reference observability, train_bundle_nobm.py:128-153)")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="override a config field (repeatable), e.g. "
                        "--set step_size=4000 --set lr_decay_rate=0.1; the "
                        "named --config stays the base, every deviation is "
                        "visible on the command line")
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--compute-flow", action="store_true",
                   help="estimate the temporal-loss flow on device (TV-L1, "
                        "stabnet_tpu.ops.flow) instead of reading it from "
                        "the record shards; required for shards without a "
                        "flow field")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("stabilize", help="streaming deploy (deploy_bundle equivalent)")
    _add_stabilize_args(p)
    p.set_defaults(fn=cmd_stabilize)

    p = sub.add_parser("export",
                       help="serialize the streaming step (weights baked) "
                            "as a jax.export serving artifact")
    p.add_argument("--out", required=True)
    p.add_argument("--config", default="v2_93")
    p.add_argument("--model-dir", default=None)
    p.add_argument("--tf-checkpoint", default=None)
    p.add_argument("--streams", type=int, default=1)
    p.add_argument("--refine", type=int, default=1)
    p.add_argument("--segment", type=int, default=None, metavar="K",
                   help="also bake a K-frame whole-segment scan into the "
                        "artifact: `stabilize --from-export --batch` then "
                        "rides the on-device lax.scan (the live engine's "
                        "batch throughput) instead of stepping frame-wise")
    p.add_argument("--output-size", type=int, nargs=2, default=[720, 1280])
    p.add_argument("--platforms", nargs="+", default=None,
                   metavar="PLATFORM",
                   help="lowering platforms (e.g. `tpu`: a CPU build host "
                        "exports a full-performance TPU artifact; default: "
                        "the current backend)")
    p.add_argument("--selftest", action="store_true",
                   help="deserialize and run one step on zeros")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("make-dataset",
                       help="raw stable/unstable video pairs -> training "
                            "shards (ORB matches; flow at train time)")
    p.add_argument("--prefix", default="data_video",
                   help="directory with stable/ and unstable/ subdirs")
    p.add_argument("--list", nargs="+", required=True,
                   help="video list file(s), or video names directly")
    p.add_argument("--out", required=True)
    p.add_argument("--stride", type=int, default=4,
                   help="frames between consecutive example positions")
    p.add_argument("--max-per-video", type=int, default=None)
    p.add_argument("--config", default="v2_93")
    p.set_defaults(fn=cmd_make_dataset)

    p = sub.add_parser("evaluate",
                       help="stability/cropping/distortion scores for a "
                            "stabilized clip")
    p.add_argument("--output", required=True, help="stabilized video")
    p.add_argument("--input", default=None,
                   help="original (unstable) video; enables cropping + "
                        "distortion scores")
    p.add_argument("--config", default="v2_93")
    p.add_argument("--max-frames", type=int, default=120)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=cmd_bench)

    from stabnet_tpu.cli import doctor as _doctor

    _doctor.add_parser(sub)

    p = sub.add_parser("convert-ckpt", help="reference TF checkpoint -> orbax")
    p.add_argument("--tf-checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--config", default="v2_93")
    p.set_defaults(fn=cmd_convert_ckpt)

    p = sub.add_parser("convert-data", help="reference TFRecords -> npz shards")
    p.add_argument("--records", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--config", default="v2_93")
    p.set_defaults(fn=cmd_convert_data)

    p = sub.add_parser("inspect-data",
                       help="dump raw+augmented examples as images "
                            "(get_data_mini_after run()/test() equivalent)")
    p.add_argument("--records", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=2)
    p.add_argument("--config", default="v2_93")
    p.set_defaults(fn=cmd_inspect_data)

    p = sub.add_parser("make-synthetic", help="generate a synthetic dataset")
    p.add_argument("--out", required=True)
    p.add_argument("--num", type=int, default=256)
    p.add_argument("--config", default="tiny")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_make_synthetic)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
