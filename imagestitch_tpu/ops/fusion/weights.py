"""Fusion weight matrices.

Replaces the reference's pure-Python pixel-scan weight construction
(reference: ImageFusion.py:43-190 ``getWeightsMatrix`` and the ramp loops in
``fuseByFadeInAndFadeOut`` ImageFusion.py:213-235) with iota-built separable
ramps and masked reductions — O(HW) vector ops instead of O(HW) Python
iterations, fully jittable.

Conventions: images carry the reference's ``-1`` background sentinel
(int32); ``valid`` means != -1 (gray) or channel-sum != -3 (color).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _valid_mask(image: jnp.ndarray, color: bool) -> jnp.ndarray:
    """(H, W) bool validity — ImageFusion.py:72/80 sentinel test."""
    if color:
        return jnp.sum(image, axis=-1) != -3
    return image != -1


def plain_fade_weights(shape_hw: Tuple[int, int], drow, dcol, dtype=jnp.float32
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Linear cross-fade ramps for a full-overlap region.

    Exact semantics of ImageFusion.py:213-235: orientation by ``col <= row``
    (static — rect shape is host-known); ramp direction by the sign of the
    *pairwise* offset component (traced).  Returns (wA, wB) of shape (H, W).
    """
    row, col = shape_hw
    if col <= row:  # "horizontal" stitch: ramp across columns
        j = jnp.arange(col, dtype=dtype)
        # dy >= 0:  wA[:, j] = (col-1-j)/col ; wB[:, j] = j/col
        # dy <  0:  wA[:, j] = (j+1)/col    ; wB[:, j] = (col-j)/col
        wa = jnp.where(dcol >= 0, (col - 1 - j) / col, (j + 1) / col)
        wb = jnp.where(dcol >= 0, j / col, (col - j) / col)
        wa = jnp.broadcast_to(wa[None, :], (row, col))
        wb = jnp.broadcast_to(wb[None, :], (row, col))
    else:  # "vertical" stitch: ramp across rows
        i = jnp.arange(row, dtype=dtype)
        # dx <= 0:  wA[i, :] = i/row       ; wB[i, :] = (row-1-i)/row
        # dx >  0:  wA[i, :] = (row-i)/row ; wB[i, :] = (i+1)/row
        wa = jnp.where(drow <= 0, i / row, (row - i) / row)
        wb = jnp.where(drow <= 0, (row - 1 - i) / row, (i + 1) / row)
        wa = jnp.broadcast_to(wa[:, None], (row, col))
        wb = jnp.broadcast_to(wb[:, None], (row, col))
    return wa, wb


def _last_true(m: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(index of last True, any True) along a 1-D bool vector."""
    n = m.shape[0]
    any_ = jnp.any(m)
    idx = (n - 1) - jnp.argmax(m[::-1])
    return jnp.where(any_, idx, 0), any_


def _first_true(m: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    any_ = jnp.any(m)
    return jnp.where(any_, jnp.argmax(m), 0), any_


def _select_first_nonzero(candidates: jnp.ndarray, order_desc: bool,
                          skip_col0: bool) -> jnp.ndarray:
    """Reference column-scan: first candidate != 0 in scan order, else 0.

    ``order_desc`` scans columns col-1 -> 1 (skipping col 0 when
    ``skip_col0``, matching the ``range(1, col)`` loops); ascending scans
    0 -> col-1.
    """
    c = candidates.shape[0]
    nz = candidates != 0
    if skip_col0:
        nz = nz.at[0].set(False)
    if order_desc:
        idx, any_ = _last_true(nz)
    else:
        idx, any_ = _first_true(nz)
    return jnp.where(any_, candidates[idx], 0)


def _row_ramp_up(row: int, row_index, dtype):
    """rows 0..rowIndex get r/rowIndex, rest 1 (ImageFusion.py:85-88 pattern).

    Degenerate rowIndex==0 -> all ones (the reference's in-loop guard).
    """
    ri = jnp.maximum(row_index, 1).astype(dtype)
    r = jnp.arange(row, dtype=dtype)
    ramp = jnp.where(jnp.arange(row) <= row_index, r / ri, 1.0)
    return jnp.where(row_index == 0, jnp.ones(row, dtype), ramp)


def _row_ramp_down(row: int, row_index, dtype):
    """rows rowIndex..row-1 get (row-1-r)/(row-rowIndex-1), rest 1.

    (ImageFusion.py:117-120 pattern.)  Degenerate rowIndex==0 follows the
    reference's in-loop guard: every row r>=0 gets (row-1-r)/(row-2).
    """
    eff = jnp.where(row_index == 0, 1, row_index)
    denom = (row - eff - 1).astype(dtype)
    denom = jnp.where(denom == 0, jnp.asarray(jnp.inf, dtype), denom)  # ref: div-by-zero -> inf
    start = jnp.minimum(row_index, row)  # row_index may be -1; treat like 0 with last-row no-op
    start = jnp.maximum(start, 0)
    r = jnp.arange(row, dtype=dtype)
    ramp = jnp.where(jnp.arange(row) >= start, (row - 1 - r) / denom, 1.0)
    return ramp


# --------------------------------------------------------------------------
# Dynamic-rect variants: the SAME reference semantics evaluated on a padded
# (BH, BW) window whose true rect occupies rows [orow, orow+rh) and cols
# [ocol, ocol+rw) (all traced scalars).  Composition pads every fusion rect
# to a shape bucket so one compiled program serves every rect of the bucket
# — without these, each distinct overlap shape recompiles and dispatches
# separately (the dendritic grid has ~80 distinct shapes).
# Outside-rect output values are arbitrary; the caller masks them out.
# --------------------------------------------------------------------------


def plain_fade_weights_dyn(shape_hw: Tuple[int, int], orow, ocol, rh, rw,
                           drow, dcol, dtype=jnp.float32
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``plain_fade_weights`` on a padded window with dynamic true dims."""
    bh, bw = shape_hw
    i = jnp.arange(bh, dtype=dtype)[:, None] - orow.astype(dtype)
    j = jnp.arange(bw, dtype=dtype)[None, :] - ocol.astype(dtype)
    rhf = rh.astype(dtype)
    rwf = rw.astype(dtype)
    # horizontal (ramp across columns) — reference's col <= row branch
    wa_h = jnp.where(dcol >= 0, (rwf - 1 - j) / rwf, (j + 1) / rwf)
    wb_h = jnp.where(dcol >= 0, j / rwf, (rwf - j) / rwf)
    # vertical (ramp across rows)
    wa_v = jnp.where(drow <= 0, i / rhf, (rhf - i) / rhf)
    wb_v = jnp.where(drow <= 0, (rhf - 1 - i) / rhf, (i + 1) / rhf)
    horiz = rw <= rh
    wa = jnp.where(horiz, wa_h, wa_v)
    wb = jnp.where(horiz, wb_h, wb_v)
    return (jnp.broadcast_to(wa, (bh, bw)), jnp.broadcast_to(wb, (bh, bw)))


def _last_true_masked(m: jnp.ndarray, axis: int):
    """(last True index, any True) along ``axis`` of a masked bool array."""
    n = m.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, m.shape, axis)
    idx = jnp.max(jnp.where(m, pos, -1), axis=axis)
    return jnp.maximum(idx, 0), idx >= 0


def _first_true_masked(m: jnp.ndarray, axis: int):
    n = m.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, m.shape, axis)
    idx = jnp.min(jnp.where(m, pos, n), axis=axis)
    return jnp.where(idx < n, idx, 0), idx < n


def corner_fade_weights_dyn(image_a: jnp.ndarray, color: bool,
                            orow, ocol, rh, rw, dtype=jnp.float32
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``corner_fade_weights`` on a padded window with dynamic true dims.

    Every scan/count/ramp of the static version re-expressed as a masked
    reduction over the true rect; indices are rect-local.
    """
    bh, bw = image_a.shape[0], image_a.shape[1]
    il = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0) - orow  # rect-local
    jl = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1) - ocol
    in_rect = (il >= 0) & (il < rh) & (jl >= 0) & (jl < rw)
    valid = _valid_mask(image_a, color) & in_rect
    positive = (jnp.sum(image_a, axis=-1) if color else image_a) > 0
    if color:
        positive = jnp.any(image_a > 0, axis=-1)
    positive = positive & in_rect

    half_r = rh // 2
    half_c = rw // 2
    upper = il < half_r
    left = jl < half_c
    quad = jnp.stack([
        jnp.sum((positive & upper & left)),          # 0: upper-left
        jnp.sum((positive & ~upper & left)),         # 1: lower-left
        jnp.sum((positive & ~upper & ~left)),        # 2: lower-right
        jnp.sum((positive & upper & ~left)),         # 3: upper-right
    ])
    if color:  # reference counts per-channel nonzeros in color mode
        cpos = (image_a > 0) & in_rect[..., None]
        quad = jnp.stack([
            jnp.sum(cpos & (upper & left)[..., None]),
            jnp.sum(cpos & (~upper & left)[..., None]),
            jnp.sum(cpos & (~upper & ~left)[..., None]),
            jnp.sum(cpos & (upper & ~left)[..., None]),
        ])
    index = jnp.argmin(quad)

    # per-column (rect-local) candidates
    last_r, any_col = _last_true_masked(valid, axis=0)     # padded row idx
    first_r, _ = _first_true_masked(valid, axis=0)
    last_r_loc = last_r - orow
    first_r_loc = first_r - orow
    cand_bottom_up = jnp.where(any_col, last_r_loc + 1, 0)   # (BW,)
    cand_top_down = jnp.where(any_col, first_r_loc - 1, 0)

    jcol = jnp.arange(bw) - ocol                            # rect-local col id
    in_cols = (jcol >= 0) & (jcol < rw)

    def select_first_nonzero(cand, order_desc: bool, skip_col0: bool):
        nz = (cand != 0) & in_cols
        if skip_col0:
            nz = nz & (jcol != 0)
        if order_desc:
            pos = jnp.where(nz, jcol, -1)
            k = jnp.argmax(pos)
        else:
            pos = jnp.where(nz, jcol, bw)
            k = jnp.argmin(pos)
        return jnp.where(jnp.any(nz), cand[k], 0)

    def col_index_after(row_index_loc, from_right: bool, minus_one: bool):
        # static version clips to the rect's row range before the lookup
        rpad = jnp.clip(row_index_loc, 0, rh - 1) + orow
        vrow = jax.lax.dynamic_index_in_dim(valid, rpad, 0, keepdims=False)
        if from_right:
            pos = jnp.where(vrow, jcol, -1)
            idx = jnp.max(pos)
            return jnp.where(idx >= 0, idx + 1, 0)
        pos = jnp.where(vrow, jcol, rw)
        idx = jnp.min(pos)
        found = idx < rw
        if minus_one:
            return jnp.where(found, idx - 1, 0)
        return jnp.where(found, idx + 1, 0)

    rhf = rh.astype(dtype)
    rwf = rw.astype(dtype)
    i1 = il.astype(dtype)
    j1 = jl.astype(dtype)

    def ramp_up(coord, length_f, idx):
        ri = jnp.maximum(idx, 1).astype(dtype)
        ramp = jnp.where(coord <= idx, coord / ri, 1.0)
        return jnp.where(idx == 0, jnp.ones_like(ramp), ramp)

    def ramp_down(coord, length_f, idx):
        eff = jnp.where(idx == 0, 1, idx).astype(dtype)
        denom = length_f - eff - 1.0
        denom = jnp.where(denom == 0, jnp.asarray(jnp.inf, dtype), denom)
        start = jnp.maximum(jnp.minimum(idx, length_f.astype(jnp.int32)), 0)
        return jnp.where(coord >= start, (length_f - 1 - coord) / denom, 1.0)

    def case_upper_left():
        ri = select_first_nonzero(cand_bottom_up, True, True)
        ci = col_index_after(ri, from_right=True, minus_one=False)
        return ramp_up(i1, rhf, ri) * ramp_up(j1, rwf, ci)

    def case_lower_left():
        ri = select_first_nonzero(cand_top_down, True, True)
        ci = col_index_after(ri, from_right=True, minus_one=False)
        return ramp_down(i1, rhf, ri) * ramp_up(j1, rwf, ci)

    def case_lower_right():
        ri = select_first_nonzero(cand_top_down, False, False)
        ci = col_index_after(ri, from_right=False, minus_one=True)
        return ramp_down(i1, rhf, ri) * ramp_down(j1, rwf, ci)

    def case_upper_right():
        ri = select_first_nonzero(cand_bottom_up, False, False)
        ci = col_index_after(ri, from_right=False, minus_one=True)
        return ramp_up(i1, rhf, ri) * ramp_down(j1, rwf, ci)

    wb = jax.lax.switch(index, [case_lower_right, case_upper_right,
                                case_upper_left, case_lower_left])
    wa = 1.0 - wb
    return wa, wb


def corner_fade_weights(image_a: jnp.ndarray, color: bool, dtype=jnp.float32
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Corner-overlap weight matrices (grid/serpentine row transitions).

    Exact semantics of ImageFusion.py:43-190: the quadrant of A with the
    fewest positive pixels locates the overlap; boundary row/col of A's valid
    region define separable linear ramps, weightB = ramp_rows x ramp_cols,
    weightA = 1 - weightB.  The reference's per-pixel Python scans become
    masked argmax reductions.

    Returns (wA, wB) of shape (H, W) (caller broadcasts over channels).
    """
    row = image_a.shape[0]
    col = image_a.shape[1]
    valid = _valid_mask(image_a, color)
    positive = (image_a > 0)
    if color:
        pos_count = lambda rs, re, cs, ce: jnp.count_nonzero(positive[rs:re, cs:ce, :])
    else:
        pos_count = lambda rs, re, cs, ce: jnp.count_nonzero(positive[rs:re, cs:ce])
    quad = jnp.stack([
        pos_count(0, row // 2, 0, col // 2),        # 0: upper-left count
        pos_count(row // 2, row, 0, col // 2),      # 1: lower-left count
        pos_count(row // 2, row, col // 2, col),    # 2: lower-right count
        pos_count(0, row // 2, col // 2, col),      # 3: upper-right count
    ])
    index = jnp.argmin(quad)  # ties -> lowest index, matching list.index(min)

    # Per-column candidates for the four scan styles.
    last_valid_r, any_col = jax.vmap(_last_true, in_axes=1)(valid)
    first_valid_r, _ = jax.vmap(_first_true, in_axes=1)(valid)
    cand_bottom_up = jnp.where(any_col, last_valid_r + 1, 0)   # rowIndex = i+1
    cand_top_down = jnp.where(any_col, first_valid_r - 1, 0)   # rowIndex = i-1

    def col_index_after(row_index, from_right: bool, minus_one: bool):
        vrow = valid[jnp.clip(row_index, 0, row - 1)]
        if from_right:
            idx, any_ = _last_true(vrow)
            return jnp.where(any_, idx + 1, 0)
        idx, any_ = _first_true(vrow)
        return jnp.where(any_, idx - 1, 0) if minus_one else jnp.where(any_, idx + 1, 0)

    def case_upper_left():  # index == 2 (overlap upper-left, ImageFusion.py:64-94)
        ri = _select_first_nonzero(cand_bottom_up, order_desc=True, skip_col0=True)
        ci = col_index_after(ri, from_right=True, minus_one=False)
        wb = _row_ramp_up(row, ri, dtype)[:, None] * _row_ramp_up(col, ci, dtype)[None, :]
        return wb

    def case_lower_left():  # index == 3 (ImageFusion.py:96-126)
        ri = _select_first_nonzero(cand_top_down, order_desc=True, skip_col0=True)
        ci = col_index_after(ri, from_right=True, minus_one=False)
        wb = _row_ramp_down(row, ri, dtype)[:, None] * _row_ramp_up(col, ci, dtype)[None, :]
        return wb

    def case_lower_right():  # index == 0 (ImageFusion.py:128-158)
        ri = _select_first_nonzero(cand_top_down, order_desc=False, skip_col0=False)
        ci = col_index_after(ri, from_right=False, minus_one=True)
        wb = _row_ramp_down(row, ri, dtype)[:, None] * _row_ramp_down(col, ci, dtype)[None, :]
        return wb

    def case_upper_right():  # index == 1 (ImageFusion.py:160-187)
        ri = _select_first_nonzero(cand_bottom_up, order_desc=False, skip_col0=False)
        ci = col_index_after(ri, from_right=False, minus_one=True)
        wb = _row_ramp_up(row, ri, dtype)[:, None] * _row_ramp_down(col, ci, dtype)[None, :]
        return wb

    wb = jax.lax.switch(index, [case_lower_right, case_upper_right,
                                case_upper_left, case_lower_left])
    wa = 1.0 - wb
    return wa, wb
