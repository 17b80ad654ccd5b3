"""Endurance: a >=10k-iter chained production training run with periodic scoring.

The reference trains 100k iterations (/root/reference/configs/v2_93.py:5-15)
with an LR decay x0.1 at 40k (train_bundle_nobm.py:155-160); the longest run
in this repo before round 4 was 5.7k chained iters, so the decay phase and
late-schedule behavior were untested in practice.  This script drives the
PRODUCTION CLI end to end:

  1. materialize full-geometry synthetic shards (make-synthetic),
  2. chain `train --steps N --restore` segments (fresh process per segment —
     this rig's tunnel retains every host->device staging buffer, so a
     single process OOMs the host near 3k steps; BASELINE.md rig notes),
     with the LR schedule SCALED into the run via `--set step_size=...`
     (decay hits at 40% of the target, like 40k/100k),
  3. every --score-every iters, stabilize 4 held-out mixed-jitter clips
     through the production serving path (`stabilize --batch --metrics`)
     and append the per-clip quality record to scores.jsonl,
  4. assert the endurance verdict: stability at the end >= at the first
     checkpoint, and NO regression across the LR-decay boundary.

Run:  python scripts/endurance.py [--target 10000] [--workdir DIR]
Artifacts: <workdir>/scores.jsonl (+ train metrics in <workdir>/log/...);
the run of record is committed as scripts/endurance_run_of_record.log.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO)


def sh(args_list, log_path: str) -> None:
    """Run a CLI step, tee-ing output to the endurance log; raise on failure.

    TPU steps run sequentially in fresh processes (one tunnel client at a
    time) and are never timeout-killed: killing a client mid-RPC wedges the
    tunnel for everyone (BASELINE.md).
    """
    with open(log_path, "a") as log:
        log.write(f"\n== {time.strftime('%F %T')} $ {' '.join(args_list)}\n")
        log.flush()
        rc = subprocess.call(args_list, stdout=log, stderr=subprocess.STDOUT,
                             cwd=_REPO)
    if rc != 0:
        raise RuntimeError(f"step failed rc={rc}: {' '.join(args_list)} "
                           f"(see {log_path})")


def capture(args_list, log_path: str) -> str:
    with open(log_path, "a") as log:
        log.write(f"\n== {time.strftime('%F %T')} $ {' '.join(args_list)}\n")
    proc = subprocess.run(args_list, capture_output=True, text=True,
                          cwd=_REPO)
    with open(log_path, "a") as log:
        log.write(proc.stdout + proc.stderr)
    if proc.returncode != 0:
        raise RuntimeError(f"step failed rc={proc.returncode}: "
                           f"{' '.join(args_list)} (see {log_path})")
    return proc.stdout


def ensure_eval_clips(cfg, clip_dir: str, n_clips: int, frames: int,
                      jitters) -> None:
    import cv2

    from stabnet_tpu.data.synthetic import make_video

    if os.path.exists(os.path.join(clip_dir, "list.txt")):
        return
    os.makedirs(os.path.join(clip_dir, "unstable"), exist_ok=True)
    os.makedirs(os.path.join(clip_dir, "stable"), exist_ok=True)
    names = []
    for i in range(n_clips):
        name = f"endur{i}.avi"
        names.append(name)
        for sub, jit in (("unstable", jitters[i % len(jitters)]),
                         ("stable", 0.0)):
            w = cv2.VideoWriter(
                os.path.join(clip_dir, sub, name),
                cv2.VideoWriter_fourcc(*"MJPG"), 30,
                (cfg.width, cfg.height))
            for f in make_video(frames, cfg.height, cfg.width,
                                seed=5000 + i, jitter=jit):
                w.write(f)
            w.release()
    with open(os.path.join(clip_dir, "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def score(args, it: int, clip_dir: str, log_path: str) -> dict:
    """Stabilize the held-out clips with the CURRENT checkpoint; parse the
    per-clip --metrics records (the same ones the quality gate scores)."""
    from stabnet_tpu.config import get_config

    cfg = get_config(args.config)
    out = capture(
        [sys.executable, "-m", "stabnet_tpu.cli.main", "stabilize",
         "--config", args.config,
         "--model-dir", os.path.join(args.workdir, "model"),
         "--test-list", os.path.join(clip_dir, "list.txt"),
         "--prefix", clip_dir,
         "--output-dir", os.path.join(args.workdir, "eval_out"),
         "--output-size", str(cfg.height), str(cfg.width),
         "--batch", str(args.clips), "--metrics"],
        log_path)
    clips = [json.loads(l) for l in out.splitlines()
             if l.startswith("{") and "stability" in l]
    assert len(clips) == args.clips, (len(clips), out[-500:])
    rec = {
        "iter": it,
        "mean_stability": sum(c["stability"] for c in clips) / len(clips),
        "mean_stability_input": (sum(c["stability_input"] for c in clips)
                                 / len(clips)),
        "mean_distortion": sum(c["distortion"] for c in clips) / len(clips),
        "min_distortion": min(c["distortion"] for c in clips),
        "mean_cropping": sum(c["cropping"] for c in clips) / len(clips),
        "clips": clips,
    }
    with open(os.path.join(args.workdir, "scores.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"iter {it}: stability {rec['mean_stability']:.4f} "
          f"(input {rec['mean_stability_input']:.4f}), "
          f"distortion {rec['mean_distortion']:.4f} "
          f"(min {rec['min_distortion']:.4f})", flush=True)
    return rec


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--target", type=int, default=10000)
    p.add_argument("--segment", type=int, default=2000,
                   help="steps per fresh-process segment (host-leak cap on "
                        "this rig is ~3k full-size steps)")
    p.add_argument("--score-every", type=int, default=2000)
    p.add_argument("--config", default="v2_93")
    p.add_argument("--examples", type=int, default=256)
    p.add_argument("--clips", type=int, default=4)
    p.add_argument("--frames", type=int, default=120)
    p.add_argument("--jitters", default="1.5,2.5,3.5,5.0")
    p.add_argument("--decay-frac", type=float, default=0.4,
                   help="LR decay boundary as a fraction of --target "
                        "(reference: 40k of 100k)")
    p.add_argument("--set", action="append", default=[],
                   help="extra config overrides forwarded to train")
    p.add_argument("--workdir", default="/tmp/stabnet_endurance")
    args = p.parse_args(argv)

    from stabnet_tpu.config import get_config

    cfg = get_config(args.config)
    os.makedirs(args.workdir, exist_ok=True)
    log_path = os.path.join(args.workdir, "endurance.log")
    data_dir = os.path.join(args.workdir, "data")
    clip_dir = os.path.join(args.workdir, "clips")
    model_dir = os.path.join(args.workdir, "model")

    if not os.path.exists(os.path.join(data_dir, "train", "list.txt")):
        sh([sys.executable, "-m", "stabnet_tpu.cli.main", "make-synthetic",
            "--out", os.path.join(data_dir, "train"),
            "--num", str(args.examples), "--config", args.config], log_path)
    jitters = [float(j) for j in args.jitters.split(",")]
    ensure_eval_clips(cfg, clip_dir, args.clips, args.frames, jitters)

    # Scale the WHOLE reference schedule into the run, not just the LR-decay
    # boundary: the reference engages theta-only/black/temporal at
    # 0.1%/1%/5% of its 100k iterations and decays at 40%
    # (configs/v2_93.py:5-15,28-32, train_bundle_nobm.py:155-160,219-236).
    # Scaling only step_size (round 4's harness) inverted the proportions —
    # the temporal loss, the term that optimizes stability itself, engaged
    # at raw iter 5000 AFTER a 10k-run's decay at 4000, so it never trained
    # at full LR.  Proportional scaling preserves the reference's phase
    # structure at any --target.
    step_size = int(args.target * args.decay_frac)
    overrides = [
        f"step_size={step_size}",
        f"do_theta_only_iter={max(10, args.target // 1000)}",
        f"do_black_loss_iter={max(50, args.target // 100)}",
        f"do_temp_loss_iter={max(100, args.target // 20)}",
    ] + args.set

    from stabnet_tpu.train.checkpoint import latest_step

    start = latest_step(model_dir) or 0
    if start:
        print(f"resuming endurance chain from step {start}", flush=True)
    records = []
    scores_path = os.path.join(args.workdir, "scores.jsonl")
    if os.path.exists(scores_path):
        with open(scores_path) as f:
            records = [json.loads(l) for l in f if l.strip()]
            records = [r for r in records if r["iter"] <= start]

    step = start
    while step < args.target:
        nxt = min(step + args.segment, args.target)
        cmd = [sys.executable, "-m", "stabnet_tpu.cli.main", "train",
               "--config", args.config, "--data", data_dir,
               "--model-dir", model_dir,
               "--log-dir", os.path.join(args.workdir, "log"),
               "--steps", str(nxt)]
        for o in overrides:
            cmd += ["--set", o]
        if step > 0:
            cmd.append("--restore")
        print(f"segment: {step} -> {nxt} / {args.target}", flush=True)
        sh(cmd, log_path)
        step = nxt
        if step % args.score_every == 0 or step == args.target:
            records.append(score(args, step, clip_dir, log_path))

    # ---- Verdict ---------------------------------------------------------
    by_iter = {r["iter"]: r for r in records}
    iters = sorted(by_iter)
    first, last = by_iter[iters[0]], by_iter[iters[-1]]
    pre_decay = [by_iter[i] for i in iters if i <= step_size]
    post_decay = [by_iter[i] for i in iters if i > step_size]
    checks = {
        "trend_up": last["mean_stability"] >= first["mean_stability"],
        "beats_input_at_end": (last["mean_stability"]
                               > last["mean_stability_input"]),
        # The decay boundary must not regress quality: the worst post-decay
        # score stays above the pre-decay best minus a small tolerance.
        "no_post_decay_regression": (
            not pre_decay or not post_decay
            or min(r["mean_stability"] for r in post_decay)
            >= max(r["mean_stability"] for r in pre_decay) - 0.02),
        "distortion_floor": last["min_distortion"] >= 0.5,
    }
    summary = {
        "target": args.target,
        "step_size": step_size,
        "scores": [{k: r[k] for k in ("iter", "mean_stability",
                                      "mean_distortion", "min_distortion")}
                   for r in (by_iter[i] for i in iters)],
        "checks": checks,
        "pass": all(checks.values()),
    }
    print(json.dumps(summary))
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
