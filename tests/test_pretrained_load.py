"""Shape-tolerant partial restore (reference base_segmentors.py:16-37):
tensors with matching name+shape load; mismatched (e.g. a classifier of a
different width) are skipped and reported.
"""
import jax.numpy as jnp
import numpy as np

from openpcseg_tpu.utils.checkpoint import merge_matching


def tree(cls_width):
    return {
        "backbone": {"conv1": {"kernel": jnp.ones((3, 3, 8, 16))}},
        "classifier": {"kernel": jnp.ones((16, cls_width)),
                       "bias": jnp.zeros((cls_width,))},
    }


def test_full_match():
    merged, n, skipped = merge_matching(tree(20), tree(20))
    assert n == 3 and skipped == []


def test_classifier_width_mismatch_skipped():
    target = tree(23)  # e.g. fine-tune 20-class checkpoint on Waymo
    saved = tree(20)
    saved["backbone"]["conv1"]["kernel"] = (
        saved["backbone"]["conv1"]["kernel"] * 7.0)
    merged, n, skipped = merge_matching(target, saved)
    assert n == 1  # only the backbone kernel
    assert set(skipped) == {"classifier/kernel", "classifier/bias"}
    # backbone took the saved value, classifier kept the fresh init
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["conv1"]["kernel"]), 7.0)
    np.testing.assert_allclose(
        np.asarray(merged["classifier"]["kernel"]), 1.0)


def test_missing_keys_kept():
    target = tree(20)
    saved = {"backbone": {"conv1": {"kernel":
                                    tree(20)["backbone"]["conv1"]["kernel"]}}}
    merged, n, skipped = merge_matching(target, saved)
    assert n == 1
    assert "classifier/kernel" in skipped and "classifier/bias" in skipped
    assert np.asarray(merged["classifier"]["bias"]).shape == (20,)


def test_scan_layout_mismatch_raises():
    import numpy as np
    import pytest
    from openpcseg_tpu.utils.checkpoint import merge_matching

    stacked = {"stage1": {"ResidualBlock_0": {"k": np.zeros((2,))},
                          "StackedBlocks_0": {"k": np.zeros((3, 2))}}}
    unrolled = {"stage1": {"ResidualBlock_0": {"k": np.zeros((2,))},
                           "ResidualBlock_1": {"k": np.zeros((2,))},
                           "ResidualBlock_2": {"k": np.zeros((2,))}}}
    with pytest.raises(ValueError, match="OPENPCSEG_SCAN_BLOCKS"):
        merge_matching(stacked, unrolled)
    with pytest.raises(ValueError, match="OPENPCSEG_SCAN_BLOCKS"):
        merge_matching(unrolled, stacked)
    # matching layouts still merge fine
    merged, n, skipped = merge_matching(stacked, stacked)
    assert n == 2 and not skipped
