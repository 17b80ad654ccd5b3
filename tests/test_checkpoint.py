"""Checkpoint round-trip and transfer-restore tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from stabnet_tpu.config import get_config
from stabnet_tpu.models import make_model
from stabnet_tpu.models.resnet import ResNetV2
from stabnet_tpu.train import checkpoint as ckpt
from stabnet_tpu.train.state import create_train_state

CFG = get_config("tiny")


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    model = make_model(CFG)
    state = create_train_state(model, CFG, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    d = str(tmp_path / "ckpt")
    ckpt.save(d, state)
    assert ckpt.latest_step(d) == 7

    fresh = create_train_state(model, CFG, jax.random.PRNGKey(1))
    restored = ckpt.restore(d, fresh)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_transfer_from_imagenet_grafts_trunk_not_stem(tmp_path):
    import pytest

    model = make_model(CFG)
    state = create_train_state(model, CFG, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    trunk = ResNetV2(dtype=jnp.float32)
    tvars = trunk.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 96, 3)),
                      train=False)
    pretrained = tvars["params"]
    pretrained_stats = tvars["batch_stats"]

    new_vars = ckpt.transfer_from_imagenet(variables, pretrained,
                                           pretrained_stats)
    new_params = new_vars["params"]

    # conv1 (13-ch stem) unchanged.
    np.testing.assert_array_equal(
        np.asarray(new_params["resnet_v2_50"]["conv1"]["conv"]["kernel"]),
        np.asarray(state.params["resnet_v2_50"]["conv1"]["conv"]["kernel"]),
    )
    # a deep block weight was grafted.
    np.testing.assert_array_equal(
        np.asarray(new_params["resnet_v2_50"]["block3_unit2"]["conv1"]["kernel"]),
        np.asarray(pretrained["block3_unit2"]["conv1"]["kernel"]),
    )
    # BN moving stats grafted too (the reference restores model variables,
    # which include moving mean/variance).
    np.testing.assert_array_equal(
        np.asarray(new_vars["batch_stats"]["resnet_v2_50"]["block2_unit1"]
                   ["bn1"]["mean"]),
        np.asarray(pretrained_stats["block2_unit1"]["bn1"]["mean"]),
    )
    # head untouched.
    np.testing.assert_array_equal(
        np.asarray(new_params["head"]["fc1"]["kernel"]),
        np.asarray(state.params["head"]["fc1"]["kernel"]),
    )

    # A wrong-shaped pretrained tensor must fail loudly.
    bad = jax.tree_util.tree_map(lambda a: a, pretrained)
    bad["block1_unit1"]["conv1"]["kernel"] = jnp.zeros((1, 1, 7, 7))
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt.transfer_from_imagenet(variables, bad)

    # A truncated checkpoint (missing model trunk units) must also fail
    # loudly, not silently leave those blocks randomly initialized.
    truncated = dict(pretrained)
    del truncated["block3_unit2"]
    with pytest.raises(KeyError, match="lacks"):
        ckpt.transfer_from_imagenet(variables, truncated)
