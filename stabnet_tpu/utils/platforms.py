"""Platform-selection helpers: honor JAX_PLATFORMS, resolve placement.

Two rig-measured facts drive this module (BASELINE.md rig notes):

  * site PJRT plugins force their own platform list at import time
    (observed: the axon TPU plugin installs ``jax_platforms="axon,cpu"``),
    silently overriding the documented JAX_PLATFORMS env-var semantics;
  * parts of the framework pin work to the host CPU backend for
    determinism (the quality-metric chain, stabnet_tpu/eval/metrics.py)
    via ``jax.default_device`` — which ``jax.default_backend()`` does NOT
    follow, so platform dispatch keyed on the process default backend
    mis-selects kernels for pinned computations (a Pallas TPU kernel
    lowered for the CPU device fails with "Only interpret mode is
    supported on CPU backend").
"""

from __future__ import annotations

import os

__all__ = ["honor_jax_platforms_env", "placement_platform"]


def _normalized_platforms(env: str, keep_cpu: bool) -> str:
    """The platform list to install for an explicit JAX_PLATFORMS value."""
    if keep_cpu and "cpu" not in [p.strip() for p in env.split(",")]:
        return env + ",cpu"
    return env


def honor_jax_platforms_env(keep_cpu: bool = True) -> None:
    """Re-apply the user's explicit JAX_PLATFORMS choice.

    Must run after ``import jax`` but before any backend initializes.

    Args:
      keep_cpu: also keep a host CPU backend registered even when the env
        var names only an accelerator (e.g. ``JAX_PLATFORMS=axon``).  The
        first entry still wins default-backend selection, so compute
        placement is unchanged — but subsystems that pin determinism-
        sensitive work to the CPU device (the quality-metric chain) keep
        working instead of silently running on the accelerator.
        ``JAX_PLATFORMS=cpu`` is preserved as-is.
    """
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    platforms = _normalized_platforms(env, keep_cpu)
    if platforms != env:
        # The divergence from the user's explicit setting must be visible
        # (it also explains the CPU AOT-loader warnings some runs print):
        # one info line, once per process (README §Environment documents it).
        import logging

        logging.getLogger("stabnet_tpu").info(
            "JAX_PLATFORMS=%s: keeping a host CPU backend registered "
            "(effective platform list %r; default backend unchanged — the "
            "CPU backend serves determinism-pinned paths like the quality "
            "metrics)", env, platforms)

    import jax

    if jax.config.jax_platforms != platforms:
        jax.config.update("jax_platforms", platforms)


def placement_platform() -> str:
    """The platform the next computation will actually be placed on.

    ``jax.default_backend()`` reports the PROCESS default and ignores an
    active ``jax.default_device(...)`` pin, so kernel dispatch keyed on it
    picks TPU kernels for computations that will lower for the CPU device.
    This helper consults the pinned default device first (a ``Device`` or
    a platform-name string, per jax.config semantics).

    Committed *arguments* can still override placement per-call — callers
    that accept device-committed inputs should not rely on this for
    correctness, only for kernel selection on uncommitted/numpy inputs
    (the framework's pinned paths all feed numpy).
    """
    import jax

    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", str(dev))
    return jax.default_backend()
