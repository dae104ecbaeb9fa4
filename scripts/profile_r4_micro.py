"""Round-4 micro-benchmarks: candidate optimizations for the pool stage.

The round-3 profile (baselines/pool_profile_tpu.json) shows the pool is
bound by (a) full-map approx_max_k + subpixel gathers (8.4 ms/frame) and
(b) the per-keypoint 18x18 lax.gather in describe (15.7 ms/frame).  This
script measures drop-in variants for both on the real TPU:

  select:   approx_max_k (current) | exact top_k | row-segment two-stage
            (per-(1,128) top-B in-register, then approx over survivors)
  describe: unaligned (18,18) gather (current) | 64-aligned (18,128) gather
            + log2 lane-shift extraction (bit-identical window contents)

Each variant reports min-of-3 fenced seconds over 8 real dendritic frames,
plus recall/equality checks vs the exact/current path.
"""
import dataclasses, functools, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from imagestitch_tpu import StitchConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.ops.features import describe, detect
from imagestitch_tpu.ops.pallas import doh
from imagestitch_tpu.io import dataset

N_FRAMES = 8
K = 6144

files = dataset.list_project_images(
    "/root/reference/demoImages/dendriticCrystal", 1)[:N_FRAMES]
batch = dataset.load_batch(files, color_mode=False)
gray = jax.device_put(batch.gray)
np.asarray(gray[:1, :1, :1].astype(jnp.float32).sum())
print("loaded", gray.shape, "backend", jax.default_backend(), flush=True)

cfg = StitchConfig(registration="feature_incre", direction=1, direct_incre=1,
                   roi_ratio=0.2, color_mode=False)
cfg = cfg.replace(features=dataclasses.replace(cfg.features, upright=True))
params = freg._detect_params(cfg)
sparams = freg._describe_params(cfg)
spacing = 2.0 ** (1.0 / max(params.n_octave_layers, 1))


def fence(x):
    for l in jax.tree_util.tree_leaves(x):
        np.asarray(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)))


def best_of(f, *args, n=3, name=""):
    best = 1e9
    for i in range(n):
        t0 = time.time()
        fence(f(*args))
        dt = time.time() - t0
        best = min(best, dt)
    print(f"{name}: {best*1000/N_FRAMES:.2f} ms/frame  ({best:.3f} s total)",
          flush=True)
    return best


# --------------------------------------------------------------------------
# Stage inputs: o=0 score/raw maps per frame (via the Pallas DoH kernel)
# --------------------------------------------------------------------------

@jax.jit
def maps_o0(imgs):
    def one(img):
        return doh.doh_score_map(img.astype(jnp.float32),
                                 threshold=params.threshold,
                                 n_scales=params.n_octave_layers,
                                 base_sigma=params.base_sigma,
                                 border=params.border, spacing=spacing)
    return jax.lax.map(one, imgs)


score_b, raw_b = maps_o0(gray)
fence((score_b, raw_b))
H, W = score_b.shape[1:]
print("score maps", score_b.shape, flush=True)
nz = np.asarray((score_b[0] > 0).sum())
print(f"NMS survivors frame0: {nz} of {H*W}", flush=True)


# --------------------------------------------------------------------------
# Select variants
# --------------------------------------------------------------------------

def sel_approx(score):
    fs, fi = jax.lax.approx_max_k(score.reshape(-1), K, recall_target=0.95)
    return fs, fi


def sel_exact(score):
    return jax.lax.top_k(score.reshape(-1), K)


def sel_rowseg(score, b=2):
    """Two-stage: per-(1,128)-row-segment top-b (layout-preserving reshape),
    then approx_max_k over the nseg*b survivors."""
    h, w = score.shape
    x = score.reshape(h * w // 128, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    vals, lanes = [], []
    for _ in range(b):
        a = jnp.argmax(x, axis=1)
        m = jnp.max(x, axis=1)
        vals.append(m)
        lanes.append(a)
        x = jnp.where(lane == a[:, None], -jnp.inf, x)
    cv = jnp.stack(vals, 1).reshape(-1)            # (nseg*b,)
    cl = jnp.stack(lanes, 1).reshape(-1)
    seg = jax.lax.broadcasted_iota(jnp.int32, (h * w // 128, b), 0).reshape(-1)
    fs, ci = jax.lax.approx_max_k(cv, K, recall_target=0.95)
    fi = seg[ci] * 128 + cl[ci]
    return fs, fi


def sel_subpix(raw, fi):
    h, w = raw.shape
    r = (fi // w).astype(jnp.int32)
    c = (fi % w).astype(jnp.int32)
    return detect.refine_subpixel(raw, r, c)


for name, fn in (("sel_approx", sel_approx), ("sel_exact", sel_exact),
                 ("sel_rowseg2", lambda s: sel_rowseg(s, 2)),
                 ("sel_rowseg4", lambda s: sel_rowseg(s, 4))):
    f = jax.jit(lambda ss, fn=fn: jax.lax.map(fn, ss))
    best_of(f, score_b, name=name)

# subpixel alone (on exact top-k indices)
top_i = jax.jit(lambda ss: jax.lax.map(sel_exact, ss))(score_b)[1]
fence(top_i)
f = jax.jit(lambda rr, ii: jax.vmap(sel_subpix)(rr, ii))
best_of(f, raw_b, top_i, name="subpix_gather3x3")

# recall of variants vs exact top-K set (frame 0)
s0 = score_b[0]
_, ie = jax.jit(sel_exact)(s0)
ie_set = set(np.asarray(ie)[np.asarray(_) > 0].tolist())
for name, fn in (("approx", sel_approx),
                 ("rowseg2", lambda s: sel_rowseg(s, 2)),
                 ("rowseg4", lambda s: sel_rowseg(s, 4))):
    fs, fi = jax.jit(fn)(s0)
    got = set(np.asarray(fi)[np.asarray(fs) > 0].tolist())
    print(f"recall {name}: {len(got & ie_set)/max(len(ie_set),1):.4f} "
          f"({len(ie_set)} live)", flush=True)


# --------------------------------------------------------------------------
# Describe variants
# --------------------------------------------------------------------------

pool = freg._pool_features_jit(gray, K, params, sparams, use_pallas_doh=True)
fence(pool)
rows_p, cols_p, scores_p, _ = pool
print("pool ready", flush=True)

_S = describe._S


def gather_cur(image, rows, cols):
    return describe._patch_gather(image.astype(jnp.float32), rows, cols,
                                  _S + 2, _S // 2)


def gather_aligned(image, rows, cols, size=_S + 2, margin=_S // 2, wide=128):
    """64-aligned (size, wide) slice gather + log2 lane shifts; window
    contents bit-identical to gather_cur for in-bounds keypoints."""
    x = image.astype(jnp.float32)
    h, w = x.shape
    r0 = jnp.clip(jnp.round(rows).astype(jnp.int32) - margin, 0, h - size)
    c0 = jnp.clip(jnp.round(cols).astype(jnp.int32) - margin, 0, w - size)
    ca = jnp.clip((c0 // 64) * 64, 0, w - wide)
    off = c0 - ca                                    # [0, wide-18]
    starts = jnp.stack([r0, ca], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
    p = jax.lax.gather(x, starts, dn, slice_sizes=(size, wide),
                       mode=jax.lax.GatherScatterMode.CLIP)
    sh = wide // 2
    while sh >= 1:
        bit = (off & sh) != 0
        p = jnp.where(bit[:, None, None], jnp.roll(p, -sh, axis=-1), p)
        sh //= 2
    return p[..., :size]


img0 = gray[0].astype(jnp.float32)
r8 = rows_p
c8 = cols_p

fj = jax.jit(lambda im, r, c: jax.vmap(
    lambda i, rr, cc: gather_cur(i, rr, cc))(im, r, c))
best_of(fj, gray, r8, c8, name="gather_cur_18x18")
fa = jax.jit(lambda im, r, c: jax.vmap(
    lambda i, rr, cc: gather_aligned(i, rr, cc))(im, r, c))
best_of(fa, gray, r8, c8, name="gather_aligned_18x128")

# equality check (frame 0, interior keypoints)
p_cur = np.asarray(jax.jit(gather_cur)(img0, rows_p[0], cols_p[0]))
p_al = np.asarray(jax.jit(gather_aligned)(img0, rows_p[0], cols_p[0]))
print("gather equal:", bool((p_cur == p_al).all()), flush=True)

# full describe: current vs aligned-gather patched in
fd = jax.jit(lambda im, r, c: describe.describe_batch(im, r, c, sparams))
best_of(fd, gray, r8, c8, name="describe_cur")

orig_gather = describe._patch_gather


def patched_gather(image, rows, cols, size, margin):
    if size == _S + 2:
        return gather_aligned(image, rows, cols, size, margin)
    return orig_gather(image, rows, cols, size, margin)


describe._patch_gather = patched_gather
fd2 = jax.jit(lambda im, r, c: describe.describe_batch(im, r, c, sparams))
best_of(fd2, gray, r8, c8, name="describe_aligned")
d_cur = np.asarray(fd(gray[:1], r8[:1], c8[:1]))
d_al = np.asarray(fd2(gray[:1], r8[:1], c8[:1]))
print("describe equal:", bool((d_cur == d_al).all()),
      "maxdiff", float(np.abs(d_cur - d_al).max()), flush=True)
describe._patch_gather = orig_gather


# --------------------------------------------------------------------------
# End-to-end pool: current vs best variants composed
# --------------------------------------------------------------------------

fp = jax.jit(functools.partial(freg._pool_features_jit, max_pool=K,
                               dparams=params, sparams=sparams,
                               use_pallas_doh=True))
best_of(fp, gray, name="pool_current")
print("done", flush=True)
