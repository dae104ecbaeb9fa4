"""End-to-end stitching on the reference demo datasets (phase path)."""
import os

import numpy as np
import pytest

from conftest import REFERENCE_DEMO, has_demo_images
from imagestitch_tpu import StitchConfig, Stitcher
from imagestitch_tpu.io import dataset

pytestmark = pytest.mark.skipif(not has_demo_images(),
                                reason="reference demoImages not present")


def test_iron_pairwise_phase():
    """BASELINE config 1: iron 2-image stitch, phase correlation + fade.

    Golden offset (1698, 0): cv2.phaseCorrelate on the scale-1 strips gives
    y = -149.90 (cv2 reports minus the displacement); the true strip offset
    is +149.90 -> int() = 149, margin 1936 - 387 = 1549 -> 1698.  The
    feature path and a cv2.SIFT oracle agree at ~1700 (sub-pixel truncation
    accounts for the 2 px).  Note the reference's own (incomplete, unused)
    phase path would compute 1400 = 2*1549 - 1698 due to its sign inversion
    (see core/registration.py).
    """
    files = dataset.list_project_images(os.path.join(REFERENCE_DEMO, "iron"), 1)
    assert len(files) == 2
    cfg = StitchConfig(registration="phase_incre", direction=1, direct_incre=0,
                       roi_ratio=0.2, color_mode=True,
                       fuse_method="fadeInAndFadeOut")
    st = Stitcher(cfg)
    results = st.stitch_files(files)
    assert len(results) == 1
    res = results[0]
    assert res.offsets == [(1698, 0)]
    assert res.image.shape == (1936 + 1698, 2584, 3)
    # the panorama's top rows are image 1, bottom rows are image 2
    batch = dataset.load_batch(files, color_mode=True)
    np.testing.assert_array_equal(res.image[:1698], batch.color[0][:1698])
    np.testing.assert_array_equal(res.image[1936:], batch.color[1][1936 - 1698:])


def test_iron_gray_report():
    files = dataset.list_project_images(os.path.join(REFERENCE_DEMO, "iron"), 1)
    cfg = StitchConfig(registration="phase_incre", direction=1, direct_incre=0,
                       roi_ratio=0.2, color_mode=False, fuse_method="notFuse")
    st = Stitcher(cfg)
    results = st.stitch_files(files)
    rep = results[0].report
    assert rep.num_pairs == 1 and rep.num_ok == 1
    assert rep.offsets == [(1698, 0)]
    assert rep.confidences[0] > 0.15
    assert rep.directions == [1]
    assert rep.scales == [1]


def test_hybrid_registers_all_tem_pairs():
    """Hybrid (feature + phase fallback) beats either path alone on the
    sparse-texture TEM set: 8/8 pairs (feature-only: 7/8)."""
    from imagestitch_tpu.core import registration as reg
    files = dataset.list_project_images(
        os.path.join(REFERENCE_DEMO, "zirconTEM"), 1)
    batch = dataset.load_batch(files, color_mode=False)
    cfg = StitchConfig(registration="hybrid", direction=4, direct_incre=0,
                       roi_ratio=0.2)
    recs = reg.register_sequence_hybrid(batch.gray, cfg)
    assert all(r.ok for r in recs)
    # col offsets all ~ -2100..-2310 (linear left-moving strip)
    assert all(-2400 < r.offset[1] < -2000 for r in recs)
