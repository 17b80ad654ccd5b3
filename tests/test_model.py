"""Model structure, shapes, and forward tests (tiny config)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.models import forward, init_variables, make_model

CFG = get_config("tiny")


def _count_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def test_init_and_forward_shapes():
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    x = jnp.zeros((2, CFG.height, CFG.width, CFG.in_channels), jnp.float32)
    out = forward(model, variables, x, CFG, train=False)
    assert out.theta.shape == (2, CFG.theta_dim)
    assert out.mesh.shape == (2, CFG.grid_h + 1, CFG.grid_w + 1, 2)
    assert out.pts1.shape == (2, CFG.grid_h, CFG.grid_w, 8)
    assert out.warp.output.shape == (2, CFG.height, CFG.width, 1)
    assert out.warp.black_pix.shape == (2, CFG.height, CFG.width)
    assert out.warp.Hs.shape == (2, CFG.grid_h, CFG.grid_w, 3, 3)


def test_resnet50_parameter_count():
    # ResNet-50 trunk has ~23.5M params (+ head MLP).  A gross mismatch means
    # the architecture is wrong.
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    n = _count_params(variables["params"])
    # trunk ~23.5M + fc 2048*2048 + 2048*1024 + 1024*512 + 512*theta ~ 6.8M
    assert 28e6 < n < 34e6, n


@pytest.mark.slow
def test_backbone_feature_stride_32():
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    # Run just the trunk by probing an intermediate: use capture of shapes via
    # a smaller input; stride 32 means (H/32, W/32) feature map.
    from stabnet_tpu.models.resnet import ResNetV2

    trunk = ResNetV2(dtype=jnp.float32)
    tvars = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 13)), train=False)
    feats = trunk.apply(tvars, jnp.zeros((1, 64, 96, 13)), train=False)
    assert feats.shape == (1, 2, 3, 2048)


@pytest.mark.slow
def test_train_mode_updates_batch_stats():
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, CFG.height, CFG.width, CFG.in_channels))
    out, new_state = forward(model, variables, x, CFG, train=True, mutable=True)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    diffs = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(old, new)]
    assert max(diffs) > 0.0


@pytest.mark.slow
def test_mesh_clamped_to_crop_bound():
    model = make_model(CFG)
    variables = init_variables(model, CFG, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (1, CFG.height, CFG.width, CFG.in_channels)) * 50
    out = forward(model, variables, x, CFG, train=False)
    bound = 1.0 / CFG.do_crop_rate + 1e-6
    assert float(jnp.max(jnp.abs(out.mesh))) <= bound

