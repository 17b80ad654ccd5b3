"""Persistent XLA compilation cache shared by every entry point.

First compiles through this rig's TPU tunnel are minutes (the whole-clip
serving scan and the jitted train step are large programs), and every fresh
process pays them again — the bench budget, chained training segments
(scripts/endurance.py, scripts/train_chain.sh), and the quality gate all
front-load the same compiles.  JAX's persistent compilation cache keys
entries by (HLO, platform, compiler flags), so pointing every entry point at
one on-disk directory turns each repeat compile into a disk read.

The reference has no equivalent concern: its TF graphs are built per run and
session startup is not a budgeted artifact (deploy_bundle.py:45-60).

Env knobs:
  STABNET_COMPILE_CACHE      directory; "0"/"" disables.  Default
                             /tmp/stabnet_jax_cache (this rig's driver and
                             interactive runs share one host).
  JAX_COMPILATION_CACHE_DIR  upstream variable; if the user already set it,
                             it wins and this module does nothing.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/stabnet_jax_cache"


def enable_persistent_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at a shared directory.

    Returns the directory in use, or None when disabled.  Safe to call
    multiple times and before/after backend init (it only sets config).
    """
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]  # user config wins
    cache_dir = os.environ.get("STABNET_COMPILE_CACHE", _DEFAULT_DIR)
    if cache_dir in ("", "0"):
        return None
    if jax.config.jax_compilation_cache_dir != cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile that costs more than a moment; the default 1 s
        # floor already admits the expensive programs, just lower it enough
        # that mid-sized helpers (resize/gray kernels) stop recompiling too.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
