"""Quality gate: train -> stabilize -> score, in one driver-runnable artifact.

The one capability the reference exists for is producing steadier video
(/root/reference/README.md:27-29; training objective
s_net_bundle_nobm.py:301-359).  This script closes that loop end to end:

  1. materialize synthetic training shards (stabnet_tpu.data.records) —
     translation drift + shake clips with exact flow / feature matches,
  2. train a small-but-real config through the full gate schedule
     (theta-only -> +black -> +temporal) with the production train loop,
  3. stabilize held-out jittery clips through the PRODUCTION serving path
     (StreamDriver.stabilize_batch -> on-device whole-clip scan),
  4. score with the Bundled-Camera-Paths metrics (stabnet_tpu.eval) and
     assert, per the round-3 gate:
       * mean stability(stabilized) > mean stability(unstable input)
       * mean stability(stabilized) > mean stability(random-weights output)
       * cropping and distortion scores above sane floors

Prints one JSON line with every number; exit code 0 iff the gate passes.

Run:  python scripts/quality_gate.py [--steps 1500] [--workdir DIR]
      (CPU: JAX_PLATFORMS=cpu; the tiny geometry trains in minutes.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _honor_jax_platforms_env() -> None:
    """Re-apply an explicit JAX_PLATFORMS choice (the axon TPU plugin
    force-installs jax_platforms="axon,cpu", silently overriding the env
    var — same guard as cli/main.py and bench.py)."""
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)


def build_config(args):
    from stabnet_tpu.config import get_config

    return get_config("tiny").replace(
        name="quality",
        batch_size=args.batch_size,
        # Overfit-ish LR for the small geometry (production is 2e-5 for
        # 100k iters at 288x512); decay once near the end.
        initial_learning_rate=args.lr,
        step_size=max(2 * args.steps // 3, 1),
        lr_decay_rate=0.3,
        # Full gate schedule, scaled into the run (reference:
        # train_bundle_nobm.py:219-236 / configs/v2_93.py:28-32).
        do_theta_only_iter=min(50, args.steps // 10),
        do_black_loss_iter=min(150, args.steps // 4),
        do_temp_loss_iter=min(300, args.steps // 3),
        disp_freq=100,
        test_freq=10 ** 9,
        save_freq=10 ** 9,  # the loop always saves at the final step
        model_dir=os.path.join(args.workdir, "model"),
        log_dir=os.path.join(args.workdir, "log"),
    )


def ensure_dataset(path: str, cfg, num: int, seed: int) -> None:
    from stabnet_tpu.data.records import write_synthetic_dataset

    if os.path.exists(os.path.join(path, "list.txt")):
        return
    write_synthetic_dataset(path, cfg, num, seed=seed)


def train_model(cfg, data_dir: str, steps: int, seed: int):
    from stabnet_tpu.data.pipeline import InputPipeline
    from stabnet_tpu.train.loop import train

    pipe = InputPipeline(data_dir, cfg, seed=seed,
                         flow_from_step=cfg.do_temp_loss_iter)
    state, aux = train(cfg, iter(pipe), None, num_steps=steps, seed=seed)
    return {"params": state.params, "batch_stats": state.batch_stats}, aux


def held_out_clips(cfg, n_clips: int, frames: int, jitter: float, seed: int):
    from stabnet_tpu.data.synthetic import make_video

    return [np.stack(make_video(frames, cfg.height, cfg.width,
                                seed=seed + 1000 + i, jitter=jitter))
            for i in range(n_clips)]


def stabilize_and_score(cfg, variables, clips):
    """Stabilize clips via the production batch scan; return per-clip scores.

    Scores compare the MODEL-SCALE grayscale output stream against the input
    stream, exactly what `stabilize --metrics` computes (cli/main.py).
    """
    from stabnet_tpu.eval import evaluate_clip
    from stabnet_tpu.models import make_model
    from stabnet_tpu.stream import DeployOptions, StreamDriver, StreamEngine
    from stabnet_tpu.stream.video_io import to_gray_train

    model = make_model(cfg)
    engine = StreamEngine(model, variables, cfg,
                          out_hw=(cfg.height, cfg.width))
    driver = StreamDriver(engine, DeployOptions(
        output_size=(cfg.height, cfg.width), collect_input_gray=True))
    results = driver.stabilize_batch(clips)

    scores = []
    for res in results:
        out_gray = np.stack([to_gray_train(f, cfg.height, cfg.width)
                             for f in res.frames])
        n = min(len(out_gray), len(res.input_gray))
        s = evaluate_clip(out_gray[:n], res.input_gray[:n])
        # The exact retained area is also known from the accumulated black
        # masks (the reference's _cut.avi crop, deploy_bundle.py:344-371).
        top, left, bot, right = res.crop_rect
        s["crop_area"] = ((bot - top + 1) * (right - left + 1)
                          / float(cfg.height * cfg.width))
        scores.append(s)
    return scores


def input_stability(cfg, clips):
    from stabnet_tpu.eval import evaluate_clip
    from stabnet_tpu.stream.video_io import to_gray_train

    out = []
    for clip in clips:
        gray = np.stack([to_gray_train(f, cfg.height, cfg.width)
                         for f in clip])
        out.append(evaluate_clip(gray)["stability"])
    return out


def mean(xs):
    return float(np.mean(xs))


def run_gate(args) -> dict:
    _honor_jax_platforms_env()

    import jax

    from stabnet_tpu.models import init_variables, make_model

    cfg = build_config(args)
    os.makedirs(args.workdir, exist_ok=True)
    data_dir = os.path.join(args.workdir, "data", "train")
    ensure_dataset(data_dir, cfg, args.examples, seed=args.seed)

    variables, aux = train_model(cfg, data_dir, args.steps, args.seed)
    rand_variables = init_variables(make_model(cfg), cfg,
                                    jax.random.PRNGKey(args.seed + 7))

    clips = held_out_clips(cfg, args.clips, args.frames, args.jitter,
                           args.seed)
    stab_in = input_stability(cfg, clips)
    trained = stabilize_and_score(cfg, variables, clips)
    random_w = stabilize_and_score(cfg, rand_variables, clips)

    report = {
        "steps": args.steps,
        "examples": args.examples,
        "clips": args.clips,
        "frames": args.frames,
        "final_train_loss": float(aux["total"]) if aux else None,
        "stability_input": stab_in,
        "stability_trained": [s["stability"] for s in trained],
        "stability_random": [s["stability"] for s in random_w],
        "cropping_trained": [s["cropping"] for s in trained],
        "distortion_trained": [s["distortion"] for s in trained],
        "crop_area_trained": [s["crop_area"] for s in trained],
        "mean_stability_input": mean(stab_in),
        "mean_stability_trained": mean([s["stability"] for s in trained]),
        "mean_stability_random": mean([s["stability"] for s in random_w]),
        "mean_cropping_trained": mean([s["cropping"] for s in trained]),
        "mean_distortion_trained": mean([s["distortion"] for s in trained]),
    }

    checks = {
        "stabilizes_vs_input": (report["mean_stability_trained"]
                                > report["mean_stability_input"]),
        "beats_random_weights": (report["mean_stability_trained"]
                                 > report["mean_stability_random"]),
        "cropping_sane": report["mean_cropping_trained"] >= args.min_cropping,
        "distortion_sane": (report["mean_distortion_trained"]
                            >= args.min_distortion),
    }
    report["checks"] = checks
    report["pass"] = all(checks.values())
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--examples", type=int, default=256,
                   help="synthetic training examples to materialize")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--clips", type=int, default=4,
                   help="held-out evaluation clips")
    p.add_argument("--frames", type=int, default=120,
                   help="frames per held-out clip (stability needs T >~ 15)")
    p.add_argument("--jitter", type=float, default=3.0)
    p.add_argument("--min-cropping", type=float, default=0.55)
    p.add_argument("--min-distortion", type=float, default=0.55)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workdir", default="/tmp/stabnet_quality_gate")
    args = p.parse_args(argv)

    report = run_gate(args)
    print(json.dumps(report))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
