"""Round-4 micro-benchmarks #2: selection primitives + Pallas describe
backbone prototype.

Questions this answers (all on the real TPU):
  1. stage-2 selection: top_k vs approx_max_k vs variadic sort on ~108k
     candidates, and whether jnp.take of 6k scalars from a small array is
     usable for payload extraction (vs payload-carry through lax.sort).
  2. the cost of a 128-aligned rowseg select when the map width IS padded
     to a lane multiple (2688) — isolating round 1's relayout suspicion.
  3. the Pallas band-streaming describe backbone: DMA strips + per-keypoint
     VMEM window reads + per-keypoint output-row writes (no math), to know
     the floor before writing the full descriptor kernel.
"""
import functools, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

K = 6144
NC = 108 * 1024
REP = 8   # batch to amortize dispatch

rng = np.random.default_rng(0)
cand = jnp.asarray(rng.random((REP, NC), np.float32))
pay1 = jnp.asarray(rng.random((REP, NC), np.float32))
pay2 = jnp.asarray(rng.random((REP, NC), np.float32))
idx6 = jnp.asarray(rng.integers(0, NC, (REP, K)).astype(np.int32))
keys6 = jnp.asarray(rng.random((REP, K), np.float32))
np.asarray(cand.sum())
print("backend", jax.default_backend(), flush=True)


def fence(x):
    for l in jax.tree_util.tree_leaves(x):
        np.asarray(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)))


def best_of(f, *args, n=3, name="", div=REP):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        fence(f(*args))
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1000/div:.3f} ms/unit ({best:.4f} s)", flush=True)


best_of(jax.jit(lambda c: jax.vmap(lambda x: jax.lax.top_k(x, K))(c)),
        cand, name="top_k_108k")
best_of(jax.jit(lambda c: jax.vmap(
    lambda x: jax.lax.approx_max_k(x, K, recall_target=0.95))(c)),
        cand, name="approx_108k")
best_of(jax.jit(lambda c, p, q: jax.vmap(
    lambda x, a, b: jax.lax.sort((-x, a, b), num_keys=1))(c, p, q)),
        cand, pay1, pay2, name="sort3_108k")
best_of(jax.jit(lambda p, i: jax.vmap(jnp.take)(p, i)),
        pay1, idx6, name="take_6k_of_108k")
best_of(jax.jit(lambda k6, p, q: jax.vmap(
    lambda x, a, b: jax.lax.sort((x, a[:K], b[:K], a[:K], b[:K], a[:K]),
                                 num_keys=1))(k6, pay1, pay2)),
        keys6, pay1, pay2, name="sort6_6k")

# padded-width rowseg: (1936, 2688) map, layout-preserving reshape
H, WP = 1936, 2688
smap = jnp.asarray(rng.random((REP, H, WP), np.float32))
np.asarray(smap.sum())


def rowseg2_pad(score):
    x = score.reshape(H * WP // 128, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    vals, lanes = [], []
    for _ in range(2):
        a = jnp.argmax(x, axis=1)
        m = jnp.max(x, axis=1)
        vals.append(m); lanes.append(a)
        x = jnp.where(lane == a[:, None], -jnp.inf, x)
    cv = jnp.stack(vals, 1).reshape(-1)
    fs, ci = jax.lax.top_k(cv, K)
    return fs, ci


best_of(jax.jit(lambda s: jax.lax.map(rowseg2_pad, s)), smap,
        name="rowseg2_padded_topk")


def rowseg2_pad_sort(score):
    x = score.reshape(H * WP // 128, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    vals, lanes = [], []
    for _ in range(2):
        a = jnp.argmax(x, axis=1)
        m = jnp.max(x, axis=1)
        vals.append(m); lanes.append(a)
        x = jnp.where(lane == a[:, None], -jnp.inf, x)
    cv = jnp.stack(vals, 1).reshape(-1)
    cl = jnp.stack(lanes, 1).reshape(-1)
    sv, sl = jax.lax.sort((-cv, cl), num_keys=1)
    return -sv[:K], sl[:K]


best_of(jax.jit(lambda s: jax.lax.map(rowseg2_pad_sort, s)), smap,
        name="rowseg2_padded_sort")


# --------------------------------------------------------------------------
# Pallas backbone prototype: band-streamed per-keypoint window extraction
# --------------------------------------------------------------------------
HA, WA = 3840, 2688
BAND = 256
HALO = 24
GR, GC = 24, 256     # per-keypoint read window (rows padded 18->24)
atlas = jnp.asarray(rng.random((HA + BAND, WA), np.float32))  # slack rows
r0_np = np.sort(rng.integers(0, HA - GR, K)).astype(np.int32)
ca_np = (rng.integers(0, (WA - GC) // 128, K) * 128).astype(np.int32)
band_of = r0_np // BAND
n_bands = HA // BAND
starts = np.searchsorted(band_of, np.arange(n_bands + 1)).astype(np.int32)
r0_d, ca_d, starts_d = map(jnp.asarray, (r0_np, ca_np, starts))


def _proto_kernel(r0_s, ca_s, st_s, atlas_ref, out_ref, strip, sem):
    b = pl.program_id(0)
    dma = pltpu.make_async_copy(
        atlas_ref.at[pl.ds(b * BAND, BAND + HALO), :], strip, sem)
    dma.start()
    dma.wait()
    lo = st_s[b]
    hi = st_s[b + 1]

    def body(i, _):
        r = r0_s[i] - b * BAND
        c = ca_s[i]
        win = strip[pl.ds(r, GR), pl.ds(c, GC)]
        # keep it live with a cheap per-kp reduction (stand-in for math)
        out_ref[i, :] = jnp.sum(win, axis=0)[None, :128]
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)


@functools.partial(jax.jit, static_argnames=())
def proto(r0, ca, st, at):
    return pl.pallas_call(
        _proto_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_bands,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BAND + HALO, WA), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(r0, ca, st, at)


try:
    out = proto(r0_d, ca_d, starts_d, atlas)
    fence(out)
    best_of(proto, r0_d, ca_d, starts_d, atlas, name="pallas_backbone",
            div=1)
    # sanity: row 0 equals the reference reduction
    ref = np.asarray(atlas)[r0_np[0]:r0_np[0] + GR,
                            ca_np[0]:ca_np[0] + GC].sum(0)[:128]
    print("backbone correct:",
          bool(np.allclose(np.asarray(out)[0], ref, atol=1e-3)), flush=True)
except Exception as e:
    print("pallas_backbone FAILED:", repr(e)[:2000], flush=True)

print("done", flush=True)
