"""Image utils, checkpoint/resume, profiling, fixed ROI variant."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from imagestitch_tpu.core import checkpoint
from imagestitch_tpu.core.registration import PairRegistration
from imagestitch_tpu.ops import roi
from imagestitch_tpu.utils import image as uimage
from imagestitch_tpu.utils.profiling import PhaseTimer, frames_per_second


def _recs():
    return [
        PairRegistration(ok=True, offset=(100, 2), offset_subpix=(100.3, 2.1),
                         direction=1, scale=1, confidence=0.9, attempts=1),
        PairRegistration(ok=False, offset=(0, 0), offset_subpix=(0.0, 0.0),
                         direction=0, scale=0, confidence=0.0, attempts=12),
    ]


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "reg.json")
    files = ["a.jpg", "b.jpg", "c.jpg"]
    checkpoint.save_registration(p, files, _recs())
    got = checkpoint.load_registration(p, files)
    assert got == _recs()


def test_checkpoint_stale_on_file_change(tmp_path):
    p = str(tmp_path / "reg.json")
    checkpoint.save_registration(p, ["a", "b"], _recs())
    assert checkpoint.load_registration(p, ["a", "DIFFERENT"]) is None
    assert checkpoint.load_registration(str(tmp_path / "nope.json")) is None


def test_stitcher_uses_checkpoint(tmp_path, rng):
    """Second stitch of the same files skips registration via checkpoint."""
    from imagestitch_tpu import StitchConfig
    from imagestitch_tpu.core.stitcher import Stitcher
    from imagestitch_tpu.io import codec
    base = rng.integers(1, 255, (300, 200), np.uint8)
    d = tmp_path / "proj" / "1"
    d.mkdir(parents=True)
    for i, r in enumerate([0, 100]):
        codec.imwrite(str(d / f"{i}.png"), base[r:r + 150])
    cfg = StitchConfig(registration="phase_incre", direction=1, direct_incre=0,
                       roi_ratio=0.4, color_mode=False, fuse_method="notFuse",
                       print_log=False)
    st = Stitcher(cfg, checkpoint_dir=str(tmp_path / "ckpt"))
    out1 = st.stitch_project_set(str(tmp_path / "proj"), str(tmp_path / "o1"),
                                 1, file_extension="png",
                                 output_extension="png")
    assert len(os.listdir(tmp_path / "ckpt")) == 1
    out2 = st.stitch_project_set(str(tmp_path / "proj"), str(tmp_path / "o2"),
                                 1, file_extension="png",
                                 output_extension="png")
    a = codec.imread(out1[0], color=False)
    b = codec.imread(out2[0], color=False)
    np.testing.assert_array_equal(a, b)


def test_resize_antialiased(rng):
    img = rng.integers(0, 255, (100, 80), np.uint8)
    out = uimage.resize(img, 0.5)
    assert out.shape == (50, 40)
    # downscale of a constant stays constant
    const = np.full((64, 64), 200, np.uint8)
    np.testing.assert_array_equal(uimage.resize(const, 0.25),
                                  np.full((16, 16), 200, np.uint8))


def test_rectify_final_passthrough(rng):
    img = rng.integers(1, 255, (60, 80), np.uint8)  # all corners nonzero
    np.testing.assert_array_equal(uimage.rectify_final(img), img)


def test_fixed_roi_variant(rng):
    a = jnp.asarray(rng.integers(0, 255, (2, 40, 60), np.uint8))
    b = jnp.asarray(rng.integers(0, 255, (2, 40, 60), np.uint8))
    ra, rb = roi.extract_fixed_strips(a, b, "horizontal", 10)
    assert ra.shape == (2, 40, 10) and rb.shape == (2, 40, 10)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(a)[:, :, 50:])
    ra, rb = roi.extract_fixed_strips(a, b, 1, 12, search_length_large=20)
    assert ra.shape == (2, 12, 20) and rb.shape == (2, 12, 20)


def test_phase_timer_and_fps():
    t = PhaseTimer()
    with t.phase("work"):
        x = jnp.ones((64, 64)).sum()
    t.fence("fence", x)
    assert "work" in t.spans and "fence" in t.spans
    fps = frames_per_second(10, lambda: jnp.ones((32, 32)) * 2, repeats=2)
    assert fps > 0


def test_read_back_equals_asarray():
    """utils/transfer.read_back: concurrent chunked D2H == np.asarray."""
    import jax.numpy as jnp

    from imagestitch_tpu.utils import transfer

    rng = np.random.default_rng(0)
    for shape in ((700, 300), (5, 4), (1,), (64, 33, 3)):
        x = jnp.asarray(rng.integers(0, 255, shape, np.uint8))
        got = transfer.read_back(x, chunk_bytes=64 << 10, threads=2)
        np.testing.assert_array_equal(got, np.asarray(x))
