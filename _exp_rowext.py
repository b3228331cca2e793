"""Pallas manual-DMA row-extract + small take: prototype + timing."""
import time, json, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.RandomState(1)
NI = 768
NV = 4704
NC = 192

stands = np.sort(rng.choice(352, 49, replace=False))
prs = [(2 * s0 + p0, 2 * s1 + p1)
       for i, s0 in enumerate(stands) for s1 in stands[i:]
       for p0 in (0, 1) for p1 in (0, 1)][:NV]
lo_np = np.array([p[0] for p in prs], np.int32)
hi_np = np.array([p[1] for p in prs], np.int32)
lo2 = np.minimum(lo_np, hi_np)
hi2 = np.maximum(lo_np, hi_np)
rows, slot = np.unique(lo2, return_inverse=True)
nrow_pad = -(-len(rows) // 8) * 8
rows_p = np.zeros(nrow_pad, np.int32)
rows_p[:len(rows)] = rows
rows_j = jnp.asarray(rows_p)
idx = jnp.asarray(slot.astype(np.int32) * NI + hi2)
print(f"unique rows: {len(rows)} pad {nrow_pad}")

cube_r = jnp.asarray(rng.randint(-1 << 20, 1 << 20, [NC, NI, NI]),
                     jnp.int32)
cube_i = jnp.asarray(rng.randint(-1 << 20, 1 << 20, [NC, NI, NI]),
                     jnp.int32)

CCH = 8


def _make_kernel(nrow, cch):
    def kernel(rows_ref, vr_hbm, vi_hbm, or_ref, oi_ref, sem):
        c0 = pl.program_id(0) * cch

        def make(j, plane_hbm, out_ref, s):
            r = rows_ref[j]
            return pltpu.make_async_copy(
                plane_hbm.at[pl.ds(c0, cch), pl.ds(r * NI, NI)],
                out_ref.at[:, pl.ds(j * NI, NI)],
                sem.at[j, s])

        def issue(j, _):
            make(j, vr_hbm, or_ref, 0).start()
            make(j, vi_hbm, oi_ref, 1).start()
            return 0

        jax.lax.fori_loop(0, nrow, issue, 0)

        def wait(j, _):
            make(j, vr_hbm, or_ref, 0).wait()
            make(j, vi_hbm, oi_ref, 1).wait()
            return 0

        jax.lax.fori_loop(0, nrow, wait, 0)

    return kernel


@jax.jit
def rows_extract(vr, vi, rows):
    nrow = rows.shape[0]
    nc = vr.shape[0]
    vr = vr.reshape(nc, NI * NI)
    vi = vi.reshape(nc, NI * NI)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc // CCH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec((CCH, nrow * NI), lambda c, rows: (c, 0)),
                   pl.BlockSpec((CCH, nrow * NI), lambda c, rows: (c, 0))],
        scratch_shapes=[pltpu.SemaphoreType.DMA((nrow, 2))],
    )
    return pl.pallas_call(
        _make_kernel(nrow, CCH), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nc, nrow * NI), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rows, vr, vi)


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


rr, ri = rows_extract(cube_r, cube_i, rows_j)
ref = np.asarray(cube_r)[:, rows_p, :].reshape(NC, -1)
np.testing.assert_array_equal(np.asarray(rr), ref)
ref_i = np.asarray(cube_i)[:, rows_p, :].reshape(NC, -1)
np.testing.assert_array_equal(np.asarray(ri), ref_i)
print("row extract exact")

sel = jnp.take(rr, idx, axis=1)
np.testing.assert_array_equal(np.asarray(sel),
                              np.asarray(cube_r)[:, lo2, hi2])
print("take-on-rows exact")

res = {}
res["rows_extract"] = timeit(
    rows_extract, (cube_r, cube_i, rows_j),
    jax.jit(lambda o: jnp.sum(o[0][0, :8])))


def full(vr, vi, rows, i):
    rr, ri = rows_extract(vr, vi, rows)
    sr = jnp.take(rr, i, axis=1)
    si = jnp.take(ri, i, axis=1)
    csr = sr.reshape(NC // 4, 4, NV).sum(axis=1, dtype=jnp.int32)
    csi = si.reshape(NC // 4, 4, NV).sum(axis=1, dtype=jnp.int32)
    return csr, csi


res["rows_take_csum_full"] = timeit(
    jax.jit(full), (cube_r, cube_i, rows_j, idx),
    jax.jit(lambda o: jnp.sum(o[0][0, :8])))

for k, v in res.items():
    print(f"{k}: {v*1e3:.2f} ms")
print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))
