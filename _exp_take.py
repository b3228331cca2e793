"""How does XLA take() cost scale with elements and operand size?"""
import time, json
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.RandomState(1)
NI = 768
NV = 4704

lo = rng.randint(0, 704, NV).astype(np.int32)
hi = rng.randint(0, 704, NV).astype(np.int32)
idx = jnp.asarray(np.minimum(lo, hi) * NI + np.maximum(lo, hi))


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
probe = jax.jit(lambda o: jnp.sum(o[0, :8]))

for nch in (192, 48, 12):
    cube = jnp.asarray(
        rng.randint(-1 << 20, 1 << 20, [nch, NI * NI]), jnp.int32)
    res[f"take_c{nch}"] = timeit(
        jax.jit(lambda c, i: jnp.take(c, i, axis=1)), (cube, idx), probe)

# operand-size dependence at fixed element count
cube_small = jnp.asarray(
    rng.randint(-1 << 20, 1 << 20, [192, 384 * NI]), jnp.int32)
idx_small = jnp.asarray((np.minimum(lo, hi) % 384) * NI
                        + np.maximum(lo, hi))
res["take_c192_small_operand"] = timeit(
    jax.jit(lambda c, i: jnp.take(c, i, axis=1)), (cube_small, idx_small),
    probe)

# csum with XLA on the cube (what they measured slow), then take
cube3 = jnp.asarray(
    rng.randint(-1 << 20, 1 << 20, [192, NI, NI]), jnp.int32)
def csum_take(c, i):
    cs = c.reshape(48, 4, NI * NI).sum(axis=1, dtype=jnp.int32)
    return jnp.take(cs, i, axis=1)
res["xla_csum_then_take"] = timeit(jax.jit(csum_take), (cube3, idx), probe)

# csum alone
res["xla_csum_alone"] = timeit(
    jax.jit(lambda c: c.reshape(48, 4, NI * NI).sum(axis=1,
                                                    dtype=jnp.int32)),
    (cube3,), probe)

for k, v in res.items():
    print(f"{k}: {v*1e3:.2f} ms")
print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))
