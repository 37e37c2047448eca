"""Smoke tests for the example drivers (L4 parity surface, SURVEY §3.5).

The reference ships its drivers untested (the notebook's `predict` cell is
committed broken — SURVEY §2.1 C8); these pin that each maintained example
actually runs end-to-end at tiny scale through its public functions.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.smoke
def test_generate_example_predict():
    from examples.generate import build_pipeline, predict

    pipe = build_pipeline(size=64, steps=2, tiny=True)
    img = predict(pipe, "مرحبا", "a neon sign", position=(8, 16), font_size=20)
    img = np.asarray(img)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img.std() > 0  # not a constant image


def test_inpaint_example():
    from examples.inpaint import (
        _synthetic_photo, build_inpaint_pipeline, inpaint_text,
    )

    photo, mask = _synthetic_photo(64)
    pipe = build_inpaint_pipeline(size=64, steps=2, tiny=True)
    img = inpaint_text(pipe, photo, mask, "Hi", "a wooden sign",
                       position=(16, 24), font_size=16)
    img = np.asarray(img)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img.std() > 0


def test_train_example_loss_decreases():
    from examples.train_controlnet import main

    # main() asserts losses[-1] < losses[0] internally
    main(num_steps=4)
