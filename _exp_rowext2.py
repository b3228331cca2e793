"""Row-extract DMA variants: cch sweep + HBM->HBM."""
import time, json, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.RandomState(1)
NI = 768
NC = 192
NROW = 96

rows_p = np.sort(rng.choice(704, NROW, replace=False)).astype(np.int32)
rows_j = jnp.asarray(rows_p)
cube_r = jnp.asarray(rng.randint(-1 << 20, 1 << 20, [NC, NI, NI]),
                     jnp.int32)
cube_i = jnp.asarray(rng.randint(-1 << 20, 1 << 20, [NC, NI, NI]),
                     jnp.int32)


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


def make_vmem(cch):
    def kernel(rows_ref, vr_hbm, vi_hbm, or_ref, oi_ref, sem):
        c0 = pl.program_id(0) * cch

        def mk(j, plane, out, s):
            return pltpu.make_async_copy(
                plane.at[pl.ds(c0, cch), pl.ds(rows_ref[j] * NI, NI)],
                out.at[:, pl.ds(j * NI, NI)], sem.at[j, s])

        def issue(j, _):
            mk(j, vr_hbm, or_ref, 0).start()
            mk(j, vi_hbm, oi_ref, 1).start()
            return 0
        jax.lax.fori_loop(0, NROW, issue, 0)

        def wait(j, _):
            mk(j, vr_hbm, or_ref, 0).wait()
            mk(j, vi_hbm, oi_ref, 1).wait()
            return 0
        jax.lax.fori_loop(0, NROW, wait, 0)

    @jax.jit
    def run(vr, vi, rows):
        vr = vr.reshape(NC, NI * NI)
        vi = vi.reshape(NC, NI * NI)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(NC // cch,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[pl.BlockSpec((cch, NROW * NI),
                                    lambda c, rows: (c, 0))] * 2,
            scratch_shapes=[pltpu.SemaphoreType.DMA((NROW, 2))],
        )
        return pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((NC, NROW * NI),
                                            jnp.int32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(rows, vr, vi)
    return run


def make_hbm():
    def kernel(rows_ref, vr_hbm, vi_hbm, or_ref, oi_ref, sem):
        def mk(j, plane, out, s):
            return pltpu.make_async_copy(
                plane.at[:, pl.ds(rows_ref[j] * NI, NI)],
                out.at[:, pl.ds(j * NI, NI)], sem.at[j, s])

        def issue(j, _):
            mk(j, vr_hbm, or_ref, 0).start()
            mk(j, vi_hbm, oi_ref, 1).start()
            return 0
        jax.lax.fori_loop(0, NROW, issue, 0)

        def wait(j, _):
            mk(j, vr_hbm, or_ref, 0).wait()
            mk(j, vi_hbm, oi_ref, 1).wait()
            return 0
        jax.lax.fori_loop(0, NROW, wait, 0)

    @jax.jit
    def run(vr, vi, rows):
        vr = vr.reshape(NC, NI * NI)
        vi = vi.reshape(NC, NI * NI)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            scratch_shapes=[pltpu.SemaphoreType.DMA((NROW, 2))],
        )
        return pl.pallas_call(
            kernel, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((NC, NROW * NI),
                                            jnp.int32)] * 2,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(rows, vr, vi)
    return run


probe = jax.jit(lambda o: jnp.sum(o[0][0, :8]))
res = {}
ref = np.asarray(cube_r)[:, rows_p, :].reshape(NC, -1)
for cch in (8, 24, 48):
    fn = make_vmem(cch)
    np.testing.assert_array_equal(np.asarray(fn(cube_r, cube_i, rows_j)[0]),
                                  ref)
    res[f"vmem_cch{cch}"] = timeit(fn, (cube_r, cube_i, rows_j), probe)

fn = make_hbm()
np.testing.assert_array_equal(np.asarray(fn(cube_r, cube_i, rows_j)[0]), ref)
res["hbm2hbm"] = timeit(fn, (cube_r, cube_i, rows_j), probe)

for k, v in res.items():
    print(f"{k}: {v*1e3:.2f} ms")
print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))
