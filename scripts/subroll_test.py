"""Probe: dynamic SUBLANE (axis 0) roll correctness on v5e Mosaic.

The lane-dim (axis 1) dynamic roll is used in production (with the
negative-shift workaround).  If axis-0 dynamic rolls are exact, the warp
kernel can compact its 8-aligned y window: roll rows up by the base
misalignment dy in [0, 7] and slice a static 40-row span -> MXU M=120.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, Nl = 144, 224


def kernel(s_ref, a_ref, o_ref, *, axis):
    s = jnp.sum(s_ref[0, :1]).astype(jnp.int32)   # dynamic shift from data
    o_ref[:] = pltpu.roll(a_ref[:], s, axis=axis)


def run(shift, axis):
    rng = np.random.RandomState(0)
    a = rng.randint(0, 1 << 20, (M, Nl)).astype(np.int32)
    sv = np.full((1, 128), 0, np.int32); sv[0, 0] = shift
    f = pl.pallas_call(
        functools.partial(kernel, axis=axis),
        out_shape=jax.ShapeDtypeStruct((M, Nl), jnp.int32),
    )
    out = np.asarray(f(jnp.asarray(sv), jnp.asarray(a)))
    ref = np.roll(a, shift, axis=axis)
    ok = np.array_equal(out, ref)
    print(f"axis={axis} shift={shift}: {'OK' if ok else 'WRONG'}")
    return ok


for axis in (0, 1):
    for s in (0, 1, 3, 7, 8, 40, 143):
        try:
            run(s, axis)
        except Exception as e:
            print(f"axis={axis} shift={s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")
