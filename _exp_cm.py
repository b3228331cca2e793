"""Kernels fed chan-major [C,T,768] directly: expected corr ~5.3, bf ~1.2."""
import time, json, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from caltech_bifrost_dsp_tpu.ops.pallas.corr_blk import (_blocks, BLK,
                                                         _unpack_planes,
                                                         _dot3)
from caltech_bifrost_dsp_tpu.ops.pallas.beamform_fused import (
    _make_kernel as bf_make_kernel, _choose_tile, stacked_gains)
from caltech_bifrost_dsp_tpu.ops import beamform as bf

rng = np.random.RandomState(1)
T, C, I, NI = 2400, 192, 704, 768
NB = 32
packed_cm = jnp.asarray(rng.randint(
    0, 255, [C, T, NI]).astype(np.uint8))   # garbage lanes 704:768 incl.


def timeit(fn, args, probe, niter=10):
    def fetch(o):
        return float(np.asarray(jax.device_get(probe(o))))
    out = fn(*args); fetch(out)
    t0 = time.perf_counter(); fetch(fn(*args))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(niter):
        out = fn(*args)
    fetch(out)
    return max((time.perf_counter() - t0 - ovh) / (niter - 1), 1e-9)


# --- corr: same as packed_corr_blk_acc fast/slow variant, no prologue ---
@jax.jit
def corr_cm(pcm, slow_in_r, slow_in_i):
    nblk = NI // BLK
    pairs = _blocks(nblk)
    npair = len(pairs)
    bi = jnp.asarray(pairs[:, 0])
    bj = jnp.asarray(pairs[:, 1])
    cb = 8

    def kernel(bi_ref, bj_ref, a_ref, b_ref, sr_in, si_in, fr_out, fi_out,
               sr_out, si_out):
        for ci in range(cb):
            vr, vi = _dot3(*_unpack_planes(a_ref[ci].astype(jnp.int32),
                                           b_ref[ci].astype(jnp.int32)))
            fr_out[ci] = vr
            fi_out[ci] = vi
            sr_out[ci] = sr_in[ci] + vr
            si_out[ci] = si_in[ci] + vi

    blk_in = [
        pl.BlockSpec((cb, T, BLK), lambda c, k, bi, bj: (c, 0, bi[k])),
        pl.BlockSpec((cb, T, BLK), lambda c, k, bi, bj: (c, 0, bj[k])),
    ]
    vspec = pl.BlockSpec((cb, BLK, BLK),
                         lambda c, k, bi, bj: (c, bi[k], bj[k]))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(C // cb, npair),
        in_specs=blk_in + [vspec, vspec],
        out_specs=[vspec] * 4,
    )
    outs = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((C, NI, NI), jnp.int32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * C * npair * BLK * BLK * 3 * T,
            bytes_accessed=2 * C * npair * T * BLK
            + 4 * 6 * C * npair * BLK * BLK,
            transcendentals=0),
    )(bi, bj, pcm, pcm, slow_in_r, slow_in_i)
    return outs


slow0 = jnp.zeros((C, NI, NI), jnp.int32)
res = {}
res["corr_cm"] = timeit(
    corr_cm, (packed_cm, slow0, slow0),
    jax.jit(lambda o: jnp.sum(o[0][0, 0, :8]) + jnp.sum(o[2][0, 1, :8])))


# --- beamform fused, chan-major input, no transpose ---
g = (rng.standard_normal([C, NB, I])
     + 1j * rng.standard_normal([C, NB, I])).astype(np.complex64)
gains = bf.BeamGains.from_complex(g)
gstack = stacked_gains(gains, NI)
NTSUM = 24


@jax.jit
def bf_cm(pcm, gst):
    ts = _choose_tile(T, NTSUM, cap=1200)
    n_t = T // ts
    nb2 = NB // 2
    seg_np = np.zeros((ts, ts // NTSUM), np.float32)
    for k in range(ts // NTSUM):
        seg_np[k * NTSUM:(k + 1) * NTSUM, k] = 1.0
    seg = jnp.asarray(seg_np)
    kernel = bf_make_kernel(NB, NTSUM, ts, True, True)
    ntb = ts // NTSUM
    outs = pl.pallas_call(
        kernel,
        grid=(C, n_t),
        in_specs=[
            pl.BlockSpec((1, ts, NI), lambda c, t: (c, t, 0)),
            pl.BlockSpec((1, 4 * NB, NI), lambda c, t: (c, 0, 0)),
            pl.BlockSpec((ts, ts // NTSUM), lambda c, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 4 * nb2, ntb), lambda c, t: (c, t, 0, 0)),
            pl.BlockSpec((1, 1, 4, ts), lambda c, t: (c, t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, n_t, 4 * nb2, ntb), jnp.float32),
            jax.ShapeDtypeStruct((C, n_t, 4, ts), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pcm, gst, seg)
    return outs


res["bf_cm"] = timeit(
    bf_cm, (packed_cm, gstack),
    jax.jit(lambda o: jnp.sum(o[0][0, 0, :8]) + jnp.sum(o[1][0, 0, :, 0])))


# chained: corr + bf sharing the input, what the step would cost
@jax.jit
def chain(pcm, gst, sr, si):
    outs = corr_cm.__wrapped__(pcm, sr, si) if hasattr(corr_cm, "__wrapped__") else None
    return outs

res_chain = None

for k, v in res.items():
    print(f"{k}: {v*1e3:.2f} ms")
print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))
