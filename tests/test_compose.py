"""Placement + composition parity vs the reference-semantics oracle."""
import numpy as np
import pytest

from imagestitch_tpu import StitchConfig, compose, compute_placement
from oracle import placement_oracle


OFFSET_CASES = [
    [(100, 2)],
    [(100, 2), (90, -3)],
    [(100, 1), (-10, 120), (-95, -2)],          # serpentine row transition
    [(-50, 10), (30, -40)],                      # negative rebase both axes
    [(0, 0), (5, 5)],                            # zero offset edge
]


@pytest.mark.parametrize("offsets", OFFSET_CASES)
def test_placement_matches_oracle(offsets):
    shape = (120, 160)
    got = compute_placement(offsets, shape)
    pos, canvas, rr, rc = placement_oracle(offsets, shape)
    assert got.positions == pos
    assert got.canvas_shape == canvas
    assert got.range_rows == rr
    assert got.range_cols == rc


def _tiles_from_base(base, placements, shape):
    h, w = shape
    return np.stack([base[r:r + h, c:c + w] for r, c in placements])


def test_compose_notfuse_reconstructs(rng):
    """notFuse: later tiles overwrite; result equals direct reconstruction."""
    base = rng.integers(1, 255, (400, 500), np.uint8)
    shape = (120, 160)
    tl = [(0, 0), (80, 3), (160, 1)]
    offsets = [(80, 3), (80, -2)]
    tiles = _tiles_from_base(base, tl, shape)
    cfg = StitchConfig(color_mode=False, fuse_method="notFuse",
                       registration="phase_incre")
    out = compose(tiles, offsets, cfg)
    pos, canvas, _, _ = placement_oracle(offsets, shape)
    expect = np.zeros(canvas, np.int64) - 1
    for (r, c), t in zip(pos, tiles):
        expect[r:r + shape[0], c:c + shape[1]] = t
    expect[expect == -1] = 0
    assert out.shape == canvas
    np.testing.assert_array_equal(out, expect.astype(np.uint8))


@pytest.mark.parametrize("fuse", ["average", "maximum", "minimum",
                                  "fadeInAndFadeOut", "trigonometric"])
def test_compose_fuse_modes_run(rng, fuse):
    base = rng.integers(1, 255, (400, 500), np.uint8)
    shape = (120, 160)
    tl = [(0, 0), (80, 3)]
    offsets = [(80, 3)]
    tiles = _tiles_from_base(base, tl, shape)
    cfg = StitchConfig(color_mode=False, fuse_method=fuse,
                       registration="phase_incre")
    out = compose(tiles, offsets, cfg)
    # non-overlap area must match the pasted tiles exactly
    pos, canvas, _, _ = placement_oracle(offsets, shape)
    assert out.shape == canvas
    # region exclusively from tile 0 (above tile 1's extent):
    np.testing.assert_array_equal(out[:80, :160], tiles[0][:80, :])
    # region exclusively from tile 1 (below tile 0's extent):
    np.testing.assert_array_equal(out[120:200, 3:], tiles[1][40:, :])
    # never-covered corners are sentinel -> 0:
    np.testing.assert_array_equal(out[120:, :3], 0)
    np.testing.assert_array_equal(out[:80, 160:], 0)


def test_compose_color(rng):
    base = rng.integers(1, 255, (300, 400, 3), np.uint8)
    shape = (100, 140)
    tl = [(0, 0), (70, 2)]
    offsets = [(70, 2)]
    tiles = np.stack([base[r:r + shape[0], c:c + shape[1]] for r, c in tl])
    cfg = StitchConfig(color_mode=True, fuse_method="fadeInAndFadeOut",
                       registration="phase_incre")
    out = compose(tiles, offsets, cfg)
    assert out.shape == (170, 142, 3)
    np.testing.assert_array_equal(out[120:170, 2:], tiles[1][50:, :])


def test_compose_from_positions_matches_chain(rng):
    """Solver positions equal to the prefix chain reproduce compose()."""
    from imagestitch_tpu.core.compose import compose_from_positions
    base = rng.integers(1, 255, (400, 500), np.uint8)
    shape = (120, 160)
    tl = [(0, 0), (80, 3), (160, 1)]
    offsets = [(80, 3), (80, -2)]
    tiles = _tiles_from_base(base, tl, shape)
    cfg = StitchConfig(color_mode=False, fuse_method="fadeInAndFadeOut",
                       registration="phase_incre")
    a = compose(tiles, offsets, cfg)
    positions = np.concatenate([[[0, 0]], np.cumsum(offsets, axis=0)])
    b = compose_from_positions(tiles, positions.astype(np.float64), cfg)
    np.testing.assert_array_equal(a, b)


def test_stitcher_solver_mode(rng, tmp_path):
    """use_global_solver end-to-end on synthetic files."""
    from imagestitch_tpu import Stitcher
    from imagestitch_tpu.io import codec
    base = rng.integers(1, 255, (460, 200), np.uint8)
    d = tmp_path / "p" / "1"
    d.mkdir(parents=True)
    for i in range(4):
        codec.imwrite(str(d / f"{i}.png"), base[100 * i:100 * i + 150])
    cfg = StitchConfig(registration="phase_incre", direction=1, direct_incre=0,
                       roi_ratio=0.4, color_mode=False,
                       fuse_method="fadeInAndFadeOut", use_global_solver=True,
                       print_log=False)
    st = Stitcher(cfg)
    outs = st.stitch_project_set(str(tmp_path / "p"), str(tmp_path / "o"), 1,
                                 file_extension="png", output_extension="png")
    img = codec.imread(outs[0], color=False)
    assert img.shape == (450, 200)
