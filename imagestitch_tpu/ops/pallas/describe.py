"""Pallas TPU kernel: band-streaming batched SURF descriptors.

The XLA describe path fetches each keypoint's 18x18 window with
``lax.gather`` — measured on the v5e, TPU gathers cost ~140 ns per gathered
ROW regardless of width or alignment, so 6k keypoints x 18 rows = ~16
ms/frame of pure gather latency (baselines/pool_profile_tpu.json).  This
kernel eliminates per-keypoint HBM traffic entirely:

  * the pyramid atlas streams through VMEM in 256-row bands (one bulk DMA
    per band — the same pattern as the DoH kernel);
  * keypoints arrive ROW-SORTED FOR FREE (the fused per-row select of
    ops/pallas/doh.doh_select emits candidates in row-major order), so each
    band processes a contiguous keypoint range [band_start[b], band_start[b+1]);
  * per keypoint, ONE VMEM->VMEM (18, 256) window copy into a chunk scratch
    (128-aligned lanes, no relayout);
  * per 256-keypoint chunk, the descriptor math runs fully vectorized:
    log2 lane-shift window extraction, gradient taps, and the subregion
    binning as ONE MXU matmul against a constant pooling matrix;
  * chunk results land as ONE contiguous (256, D) store — overrun rows are
    legally rewritten by later bands (the grid is sequential and keypoint
    ranges are contiguous ascending).

Descriptor VALUES match ops/features/describe.describe_batch (upright
SURF/SURF-extended) up to lane ORDER within a vector — distances are
permutation-invariant and descriptors are only ever compared to descriptors
from the same path, so no unpermute is needed (and by construction of
_pool_matrix the lane order in fact matches the XLA layout exactly —
the parity tests compare directly).

Reference analog: the per-keypoint descriptor loops inside
cv2.xfeatures2d.SURF (reference: ImageUtility.py:255-262) and the CUDA
SURF descriptors of appendix/myGpuFeatures.cpp:77-84.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..features.describe import _S, _gauss_weight

BAND = 256          # atlas rows streamed per grid step
HALO = 32           # strip slack: 16 top guard + window overhang
CHUNK = 256         # keypoints vectorized per math batch
_WIN = _S + 2       # 18: descriptor sample window edge
_WIN_READ = 32      # rows read per keypoint: window start aligned DOWN to a
                    # multiple of 8 (Mosaic sublane-alignment proof) + the
                    # <=7-row remainder shifted in registers
_MARGIN = _S // 2   # 8 — the XLA _patch_gather margin (window is
                    # asymmetric: rows [r-8, r+10), exactly its semantics)
_READ_W = 256       # per-keypoint window read width (128-aligned start)


def _gauss_1d_factor() -> np.ndarray:
    """1-D factor f with outer(f, f) == describe_batch's gw * S * S
    (the normalized Gaussian window is separable: gw = outer(g, g)/(sum g)^2).
    """
    ax = np.arange(_S, dtype=np.float64) - (_S - 1) / 2.0
    g = np.exp(-0.5 * (ax / (_S / 2.0)) ** 2)
    return (g / g.sum() * _S).astype(np.float32)


def _pool_matrix(extended: bool) -> np.ndarray:
    """(16*C, 4*C) constant: maps (channel-major lanes ch*16 + col) to
    (col-subregion, channel) sums with the Gaussian column weight folded in;
    the row half of the weight folds into the row-pool adds.
    """
    c = 8 if extended else 4
    g = _gauss_1d_factor()
    b = np.zeros((16 * c, 4 * c), np.float32)
    for ch in range(c):
        for col in range(16):
            b[ch * 16 + col, (col // 4) * c + ch] = g[col]
    return b


def _row_weights() -> np.ndarray:
    return _gauss_1d_factor()


def _make_describe_kernel(extended: bool):
    c = 8 if extended else 4
    grow = _row_weights()

    def kernel(r8_s, ca128_s, bs_s, off_ref, bmat_ref, atlas_ref, out_ref,
               strip, patches, xcs, dsc, sem):
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(
            atlas_ref.at[pl.ds(b * BAND, BAND + HALO), :], strip, sem)
        dma.start()
        dma.wait()
        lo = bs_s[b]
        hi = bs_s[b + 1]
        # chunks are GLOBALLY aligned (base = ci*CHUNK) so the out-row store
        # start is provably aligned; a chunk straddling a band boundary is
        # processed by both bands — the patch scratch persists across grid
        # steps, so the second band's math pass sees the first band's copies
        # and the final (later) store is complete.
        ci0 = lo // CHUNK
        ci1 = (hi + CHUNK - 1) // CHUNK

        def do_chunk(ci, _):
            base = ci * CHUNK
            j0 = jnp.maximum(lo - base, 0)
            j1 = jnp.minimum(hi - base, CHUNK)

            def copy_one(j, _):
                i = base + j
                # Mosaic must PROVE slice-start alignment: sublane start is
                # a multiple of 8 (rows read 8-aligned, remainder shifted in
                # registers below), lane start a multiple of 128.
                r8 = (r8_s[i] - b * (BAND // 8)) * 8
                patches[j] = strip[pl.ds(r8, _WIN_READ),
                                   pl.ds(ca128_s[i] * 128, _READ_W)]
                return 0

            jax.lax.fori_loop(j0, j1, copy_one, 0)

            # ---- batched math over the chunk ----
            off = off_ref[pl.ds(base, CHUNK), :]           # (CH, 2) int32
            coloff = off[:, 0:1]
            rowoff = off[:, 1:2]
            x = patches[:]                                  # (CH, 32, 256)
            for sh in (4, 2, 1):                            # row remainder
                bit = ((rowoff & sh) != 0)[:, :, None]
                x = jnp.where(bit, jnp.roll(x, -sh, axis=1), x)
            x = x[:, :_WIN, :]
            sh = _READ_W // 2
            while sh >= 1:
                bit = ((coloff & sh) != 0)[:, :, None]      # (CH, 1, 1)
                x = jnp.where(bit, jnp.roll(x, -sh, axis=2), x)
                sh //= 2
            q = x[:, :, :_WIN]                              # (CH, 18, 18)
            # gradients (exact _grads_from_samples taps)
            sm = 0.25 * q[:, :-2, :] + 0.5 * q[:, 1:-1, :] + 0.25 * q[:, 2:, :]
            gx = 0.5 * sm[:, :, :-2] - 0.5 * sm[:, :, 2:]   # (CH, 16, 16)
            dr = 0.5 * q[:, :-2, :] - 0.5 * q[:, 2:, :]
            gy = (0.25 * dr[:, :, :-2] + 0.5 * dr[:, :, 1:-1]
                  + 0.25 * dr[:, :, 2:])
            # channel maps (unweighted signs == weighted signs; the Gaussian
            # weight is folded into the pooling matmul + row adds)
            if extended:
                py = gy >= 0
                px = gx >= 0
                chans = [jnp.where(py, gx, 0.0), jnp.where(~py, gx, 0.0),
                         jnp.where(py, jnp.abs(gx), 0.0),
                         jnp.where(~py, jnp.abs(gx), 0.0),
                         jnp.where(px, gy, 0.0), jnp.where(~px, gy, 0.0),
                         jnp.where(px, jnp.abs(gy), 0.0),
                         jnp.where(~px, jnp.abs(gy), 0.0)]
            else:
                chans = [gx, gy, jnp.abs(gx), jnp.abs(gy)]
            # channel assembly via scratch stores (Mosaic cannot concat
            # vectors whose sliced-operand layouts disagree off the concat
            # dimension; stores normalize the layout)
            for ch, m in enumerate(chans):
                xcs[:, :, pl.ds(ch * 16, 16)] = m
            flat = xcs[:].reshape(CHUNK * 16, 16 * c)
            pooled = jax.lax.dot_general(
                flat, bmat_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (CH*16, 4*C)
            y = pooled.reshape(CHUNK, 16, 4 * c)
            for rs in range(4):
                acc = None
                for i in range(4):
                    t = y[:, 4 * rs + i, :] * float(grow[4 * rs + i])
                    acc = t if acc is None else acc + t
                dsc[:, pl.ds(rs * 4 * c, 4 * c)] = acc      # (CH, 4*C)
            d = dsc[:]                                      # (CH, 16*C)
            nrm = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
            d = d / (nrm + 1e-8)
            out_ref[pl.ds(base, CHUNK), :] = d
            return 0

        jax.lax.fori_loop(ci0, ci1, do_chunk, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("extended", "interpret"))
def describe_atlas(atlas: jnp.ndarray, r0w: jnp.ndarray, ca: jnp.ndarray,
                   off: jnp.ndarray, band_start: jnp.ndarray,
                   extended: bool = True, interpret: bool = False
                   ) -> jnp.ndarray:
    """Band-streamed upright SURF descriptors.

    atlas:      (Hp, Wp) float32, Hp = n_bands*BAND + HALO, Wp % 128 == 0.
    r0w:        (K,) int32 window start rows (atlas coords, in [0, Hp-18]),
                in non-decreasing band order.
    ca:         (K,) int32 128-aligned read col starts (in [0, Wp-256]).
    off:        (K,) int32 window col offset within the read (c0 - ca).
    band_start: (n_bands+1,) int32 — keypoint range per band.  Band b's
                strip covers atlas rows [b*BAND, b*BAND + BAND + HALO), so
                every keypoint in range [band_start[b], band_start[b+1])
                must satisfy b*BAND <= r0w < b*BAND + BAND + HALO - 18.
                With r0w derived from a monotone integer row key rm via
                r0w in [rm - MARGIN - 1, rm - MARGIN + 1], assigning
                b = (rm - MARGIN - 1) // BAND satisfies this:
                band_start = searchsorted(rm, arange(n+1)*BAND + MARGIN+1).
    Returns (K, 64|128) float32 descriptors (see module note on lane order).
    """
    hp, wp = atlas.shape
    n_bands = (hp - HALO) // BAND
    assert hp == n_bands * BAND + HALO, (hp, n_bands)
    assert wp % 128 == 0 and wp >= _READ_W
    k = r0w.shape[0]
    kpad = -(-k // CHUNK) * CHUNK + CHUNK
    dim = 128 if extended else 64
    # pre-divided indices so the kernel's slice starts are PROVABLY aligned
    # (Mosaic rejects unprovable dynamic sublane/lane offsets): row start is
    # read 8-aligned with the remainder shifted in registers, col start is
    # 128-aligned by construction.
    r8_p = jnp.pad(r0w // 8, (0, kpad - k))
    ca128_p = jnp.pad(ca // 128, (0, kpad - k))
    offs = jnp.stack([off, r0w - (r0w // 8) * 8], axis=1)   # (K, 2)
    offs_p = jnp.pad(offs, ((0, kpad - k), (0, 0)))
    # keypoints in the last band's bottom margin (monotone key beyond
    # n_bands*BAND) belong to the last band — its strip reaches Hp anyway
    band_start = band_start.at[-1].set(k)
    out = pl.pallas_call(
        _make_describe_kernel(extended),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_bands,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BAND + HALO, wp), jnp.float32),
                pltpu.VMEM((CHUNK, _WIN_READ, _READ_W), jnp.float32),
                pltpu.VMEM((CHUNK, 16, dim), jnp.float32),
                pltpu.VMEM((CHUNK, dim), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kpad, dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(r8_p, ca128_p, band_start, offs_p,
      jnp.asarray(_pool_matrix(extended)), atlas)
    return out[:k]
