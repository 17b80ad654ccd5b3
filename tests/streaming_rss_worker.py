"""Subprocess worker for the bounded-memory streaming test: stabilize a
video file via the constant-memory path (--stream-chunk) and print this
process's peak RSS in KB.

Run in a FRESH process per measurement — ru_maxrss is a process-lifetime
high-water mark, so in-process deltas are polluted by whatever allocated
before (the round-3 in-process version of this check flaked depending on
test ordering within the module).

Usage: python streaming_rss_worker.py <clip.avi> <out_dir> <chunk> <Ho> <Wo>
"""

import os
import resource
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# The axon TPU plugin force-installs jax_platforms="axon,cpu", overriding the
# env var (same guard as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

from stabnet_tpu.config import get_config
from stabnet_tpu.models import init_variables, make_model
from stabnet_tpu.stream import DeployOptions, StreamDriver, StreamEngine


def main():
    clip_path, out_dir = sys.argv[1], sys.argv[2]
    chunk, ho, wo = (int(v) for v in sys.argv[3:6])
    cfg = get_config("tiny")
    model = make_model(cfg)
    variables = init_variables(model, cfg, jax.random.PRNGKey(0))
    engine = StreamEngine(model, variables, cfg)
    driver = StreamDriver(engine, DeployOptions(output_size=(ho, wo)))
    driver.stabilize_file(clip_path, out_dir, stream_chunk=chunk)
    print(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)


if __name__ == "__main__":
    main()
