"""A/B the 13-channel 7x7/2 stem formulations on TPU.

The native lowering runs at ~6% MXU utilization (13/128 lanes).  Candidates
fold width taps into the channel dim to raise lane occupancy:

  A) 7 strided slices of the padded input concatenated to 91 channels,
     then a (7, 1)/stride-(2,1) VALID conv  (71% lanes, big intermediate).
  B) zero-pad width to an even count, reshape pairs into 26 channels
     (free), then a (7, 4)/stride-(2,1) VALID conv  (20% lanes, 1.14x MACs,
     no intermediate).

Both are exact reformulations (same MAC terms).  Parity-checked against the
native conv before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

S, H, W, C, F = 8, 288, 512, 13, 64
K, STRIDE = 7, 2
PB, PE = 3, 3
DT = jnp.bfloat16

rng = np.random.RandomState(0)
x_all = rng.rand(24, S, H, W, C).astype(np.float32) - 0.5
kern = (rng.rand(K, K, C, F).astype(np.float32) - 0.5) * 0.1
bias = (rng.rand(F).astype(np.float32) - 0.5) * 0.1

DN = ("NHWC", "HWIO", "NHWC")


def native(x):
    out = jax.lax.conv_general_dilated(
        x.astype(DT), jnp.asarray(kern, DT), (STRIDE, STRIDE),
        [(PB, PE), (PB, PE)], dimension_numbers=DN)
    return out + jnp.asarray(bias, DT)


def fold_a(x):
    xp = jnp.pad(x, ((0, 0), (PB, PE), (PB, PE), (0, 0))).astype(DT)
    Wo = (W + PB + PE - K) // STRIDE + 1
    cols = [jax.lax.slice(xp, (0, 0, dx, 0),
                          (S, H + PB + PE, dx + STRIDE * (Wo - 1) + 1, C),
                          (1, 1, STRIDE, 1))
            for dx in range(K)]
    xt = jnp.concatenate(cols, axis=-1)                    # (S, Hp, Wo, 91)
    k2 = jnp.asarray(kern.reshape(K, K * C, F)[:, None], DT)  # (7,1,91,64)
    out = jax.lax.conv_general_dilated(
        xt, k2, (STRIDE, 1), "VALID", dimension_numbers=DN)
    return out + jnp.asarray(bias, DT)


def fold_b(x):
    # width pad (3, 5): even total 520; the extra zero col only feeds the
    # (sliced-off) last output col.
    xp = jnp.pad(x, ((0, 0), (PB, PE), (PB, PE + 2), (0, 0))).astype(DT)
    Wp = W + PB + PE + 2
    xt = xp.reshape(S, H + PB + PE, Wp // 2, 2 * C)        # free reshape
    k2 = np.zeros((K, (K + 1) // 2 + 1, 2 * C, F), np.float32)  # (7,4,26,64)
    for dx in range(K):
        k2[:, dx // 2, (dx % 2) * C:(dx % 2 + 1) * C, :] = kern[:, dx]
    out = jax.lax.conv_general_dilated(
        xt, jnp.asarray(k2, DT), (STRIDE, 1), "VALID", dimension_numbers=DN)
    Wo = (W + PB + PE - K) // STRIDE + 1
    return out[:, :, :Wo] + jnp.asarray(bias, DT)


def check(fn, name):
    x = jnp.asarray(x_all[0])
    ref = np.asarray(native(x), np.float32)
    got = np.asarray(fn(x), np.float32)
    assert got.shape == ref.shape, (name, got.shape, ref.shape)
    err = np.abs(got - ref).max()
    print(f"{name}: shape {got.shape} maxdiff {err:.5f}")
    assert err < 0.05, name      # bf16 accumulation-order differences


def timeit(fn, name, reps=3, Kn=24):
    f = jax.jit(lambda xs: jax.lax.scan(
        lambda c, x: (c + jnp.sum(fn(x).astype(jnp.float32)[:, ::37, ::53]),
                      None), 0.0, xs)[0])
    xs = jnp.asarray(x_all)
    float(f(xs))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(xs)
    float(r)
    dt = (time.perf_counter() - t0) / (reps * Kn) * 1e3
    print(f"{name:28s} {dt:7.3f} ms / call (S={S})")


check(fold_a, "fold_a 91ch")
check(fold_b, "fold_b 26ch")
timeit(native, "native 7x7/2 13ch")
timeit(fold_a, "fold A: 91ch (7,1)")
timeit(fold_b, "fold B: 26ch (7,4)")
timeit(native, "native again")


def poly(x):
    # Polyphase stride-2 decomposition: out = sum over (py,px in {0,1}) of a
    # stride-1 VALID conv of the (py::2, px::2) subsampled input with the
    # matching kernel phase.  Identical MAC terms to the native conv.
    xp = jnp.pad(x, ((0, 0), (PB, PE + 1), (PB, PE + 1), (0, 0))).astype(DT)
    out = None
    for py in range(2):
        for px in range(2):
            sub = xp[:, py::2, px::2, :]                  # (S, 146, 259, 13)
            kk = jnp.asarray(kern[py::2, px::2], DT)      # (4|3, 4|3, 13, 64)
            o = jax.lax.conv_general_dilated(
                sub, kk, (1, 1), "VALID", dimension_numbers=DN)
            o = o[:, :144, :256]
            out = o if out is None else out + o
    return out + jnp.asarray(bias, DT)


check(poly, "polyphase")
timeit(poly, "polyphase 4x stride-1")
timeit(native, "native again2")
