"""Rows-first subselection gather experiments."""
import time, json
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.RandomState(1)
NI = 768
NV = 4704
NC = 192
NROW = 384

# reference-like selection: all pol pairs among 49 stands (~98 rows)
stands = np.sort(rng.choice(352, 49, replace=False))
prs = [(2 * s0 + p0, 2 * s1 + p1)
       for i, s0 in enumerate(stands) for s1 in stands[i:]
       for p0 in (0, 1) for p1 in (0, 1)][:NV]
lo_np = np.array([p[0] for p in prs], np.int32)
hi_np = np.array([p[1] for p in prs], np.int32)
lo2 = np.minimum(lo_np, hi_np)
hi2 = np.maximum(lo_np, hi_np)
rows, slot = np.unique(lo2, return_inverse=True)
assert len(rows) <= NROW
rows_p = np.zeros(NROW, np.int32)
rows_p[:len(rows)] = rows
rows_j = jnp.asarray(rows_p)
idx_in_rows = jnp.asarray(slot.astype(np.int32) * NI + hi2)

cube = jnp.asarray(rng.randint(-1 << 20, 1 << 20, [NC, NI, NI]), jnp.int32)


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


res = {}
probe2 = jax.jit(lambda o: jnp.sum(o[0, :8]))
probe3 = jax.jit(lambda o: jnp.sum(o[0, 0, :8]))

# row gather alone
res["rows_gather"] = timeit(
    jax.jit(lambda c, r: jnp.take(c, r, axis=1)), (cube, rows_j), probe3)

# rows then element take
def rows_take(c, r, i):
    rg = jnp.take(c, r, axis=1)                    # [NC, NROW, NI]
    return jnp.take(rg.reshape(NC, NROW * NI), i, axis=1)
res["rows_then_take"] = timeit(jax.jit(rows_take), (cube, rows_j,
                                                    idx_in_rows), probe2)

# rows, csum, take
def rows_csum_take(c, r, i):
    rg = jnp.take(c, r, axis=1)
    cs = rg.reshape(NC // 4, 4, NROW * NI).sum(axis=1, dtype=jnp.int32)
    return jnp.take(cs, i, axis=1)
res["rows_csum_take"] = timeit(jax.jit(rows_csum_take),
                               (cube, rows_j, idx_in_rows), probe2)

# rows via dynamic_slice-free one-hot? skip. csum on rows then take
for k, v in res.items():
    print(f"{k}: {v*1e3:.2f} ms")
print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))
