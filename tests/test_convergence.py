"""Training convergence: overfit a tiny fixed batch through all gate phases.

The reference trains 100k iterations with loss gates phasing in at 100/1000/
5000 iterations (train_bundle_nobm.py:219-236, configs/v2_93.py:28-32).  This
test runs the same schedule scaled down (theta-only <=5, black >=20,
temporal >=40) on one fixed synthetic batch and asserts the image-alignment
loss actually optimizes — a structural smoke test that gradients flow through
the warp, the mesh clamp, and the gate arithmetic without blow-ups at any
phase transition.
"""

import pytest
import jax
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.data import augment_batch, make_raw_batch, prepare_raw
from stabnet_tpu.models import make_model
from stabnet_tpu.train.state import create_train_state
from stabnet_tpu.train.train import make_train_step

pytestmark = pytest.mark.slow  # heavy end-to-end tier

STEPS = 60

CFG = get_config("tiny").replace(
    batch_size=2,
    # Scaled-down gate schedule: all three phase-ins happen inside the run.
    do_theta_only_iter=5,
    do_black_loss_iter=20,
    do_temp_loss_iter=40,
    # Overfitting one batch wants a bigger LR than the production 2e-5.
    initial_learning_rate=5e-4,
    step_size=10**9,   # no LR decay inside the test
)


def test_overfit_tiny_batch():
    model = make_model(CFG)
    state = create_train_state(model, CFG, jax.random.PRNGKey(0))
    step = make_train_step(model, CFG)
    raw = prepare_raw(make_raw_batch(CFG, CFG.batch_size, seed=0))
    batch = augment_batch(jax.random.PRNGKey(0), raw, CFG)

    img_hist, total_hist = [], []
    for _ in range(STEPS):
        state, aux = step(state, batch)
        img_hist.append(float(aux["img1"]) + float(aux["img2"]))
        total_hist.append(float(aux["total"]))

    img = np.asarray(img_hist)
    total = np.asarray(total_hist)
    # Finite through every gate phase-in (theta-only off at 5, black on at 20,
    # temporal on at 40 — each changes the loss surface discontinuously).
    assert np.isfinite(total).all(), total
    assert np.isfinite(img).all(), img

    # The image loss starts being optimized once theta-only gating ends.
    start = img[6]
    end = img[-5:].mean()
    assert end < 0.5 * start, (start, end, img[::10])
    assert int(state.step) == STEPS
