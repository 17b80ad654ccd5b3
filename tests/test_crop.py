"""Max black-free crop rectangle vs. brute-force oracle."""

import numpy as np
import pytest

from stabnet_tpu.ops.crop import (
    _max_clear_rect_py,
    max_clear_rect,
    max_clear_rect_bruteforce,
)


def area(rect):
    t, l, b, r = rect
    return (b - t + 1) * (r - l + 1)


@pytest.mark.parametrize("seed", range(5))
def test_matches_bruteforce_area(seed):
    rng = np.random.RandomState(seed)
    black = (rng.rand(18, 25) < 0.15).astype(np.int64)
    if black.all():
        black[9, 12] = 0
    got = max_clear_rect(black)
    oracle = max_clear_rect_bruteforce(black)
    assert area(got) == area(oracle)
    # Rectangle actually black-free.
    t, l, b, r = got
    assert black[t : b + 1, l : r + 1].sum() == 0


def test_all_clear():
    assert max_clear_rect(np.zeros((10, 20))) == (0, 0, 9, 19)


def test_border_black():
    black = np.ones((12, 16), np.int64)
    black[2:10, 3:13] = 0
    assert max_clear_rect(black) == (2, 3, 9, 12)


def test_all_black_raises():
    with pytest.raises(ValueError):
        _max_clear_rect_py(np.ones((4, 4)))
