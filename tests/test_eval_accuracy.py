"""Unit tests for the accuracy-harness arbiters (eval/accuracy.py).

The harness scores registration against goldens; for datasets without
published goldens the cv2.SIFT oracle supplies them and ``overlap_ncc``
arbitrates disputes at the pixel level.  These tests pin the arbiter's
semantics on synthetic translations where the truth is known exactly.
"""
import numpy as np
import pytest

from imagestitch_tpu.eval.accuracy import (dataset_configs, dendritic_golden_89,
                                           overlap_ncc)


def _pair(dr, dc, h=96, w=128, seed=0):
    """A and B = crops of one texture so B sits at A + (dr, dc) exactly."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + abs(dr) + 4, w + abs(dc) + 4),
                        np.uint8)
    a = base[:h, :w]
    b = base[dr:dr + h, dc:dc + w]
    return a, b


def test_overlap_ncc_true_offset_is_perfect():
    a, b = _pair(40, 8)
    assert overlap_ncc(a, b, (40, 8)) == pytest.approx(1.0)


def test_overlap_ncc_ranks_true_above_wrong():
    a, b = _pair(40, 8)
    true = overlap_ncc(a, b, (40, 8))
    for wrong in [(41, 8), (40, 9), (37, 8), (40, 0)]:
        assert true > overlap_ncc(a, b, wrong)


def test_overlap_ncc_no_overlap_is_none():
    a, b = _pair(0, 0)
    assert overlap_ncc(a, b, (96, 128)) is None
    assert overlap_ncc(a, b, (-96, 0)) is None


def test_overlap_ncc_constant_patch_is_none():
    a = np.zeros((64, 64), np.uint8)
    assert overlap_ncc(a, a, (0, 0)) is None


def test_dataset_configs_mirror_main_py():
    cfgs = dataset_configs()
    assert set(cfgs) == {"iron", "dendriticCrystal", "zirconBSE",
                         "zirconCL", "zirconREM", "zirconTEM"}
    # Main.py:17-27: iron/dendritic direction 1; dendritic serpentine incre 1
    assert cfgs["iron"].direction == 1 and cfgs["iron"].direct_incre == 0
    assert cfgs["dendriticCrystal"].direct_incre == 1
    # Main.py:29-51: all four zircon sets direction 4, non-incremental path
    for z in ("zirconBSE", "zirconCL", "zirconREM", "zirconTEM"):
        assert cfgs[z].direction == 4
        assert cfgs[z].registration == "feature"


def test_dendritic_golden_chain_shape():
    g = dendritic_golden_89()
    assert len(g) == 88
    # first golden spans the missing 1-002 frame: physically unstitchable
    assert abs(g[0][0]) > 1936
