"""Decompose the X/B chain cost on the real chip."""
import time, json
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from caltech_bifrost_dsp_tpu.config import LWA352
from caltech_bifrost_dsp_tpu.models import xengine
from caltech_bifrost_dsp_tpu.ops.pallas.beamform_fused import (
    stacked_gains, beamform_products_pallas)
from caltech_bifrost_dsp_tpu.ops.pallas.corr_blk import (
    packed_corr_blk_acc, padded_ni)
from caltech_bifrost_dsp_tpu.ops import correlate as corr

cfg = LWA352.replace(corr_engine="pallas_blk", bf_engine="pallas")
state, _, gains, pairs = xengine.default_inputs(cfg)
gstack = stacked_gains(gains, xengine.bf_operand_ni(cfg))
rng = np.random.RandomState(1)
T, C, I = cfg.acc_len, cfg.nchan, cfg.ninput
packed = jnp.asarray(rng.randint(0, 255, [T, C, I]).astype(np.uint8))
NI = padded_ni(I)


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

# 1. full step (bench config: all products, static flags True/True/False)
def step_full(st, pk, gs, pr):
    return xengine.xengine_step(st, pk, gs, pr, True, True, False, cfg)

def step_nosubsel(st, pk, gs, pr):
    return xengine.xengine_step(st, pk, gs, pr, True, True, False, cfg,
                                want_subsel=False)

def step_corr_only(st, pk, gs, pr):
    return xengine.xengine_step(st, pk, gs, pr, True, True, False, cfg,
                                want_power=False, want_vlbi=False,
                                want_subsel=False)

def step_no_vlbi(st, pk, gs, pr):
    return xengine.xengine_step(st, pk, gs, pr, True, True, False, cfg,
                                want_vlbi=False, want_subsel=False)

probe_step = jax.jit(lambda o: jnp.sum(o[0].vis_slow.real[0, 0, :8]))
for name, f in [("step_full", step_full), ("step_nosubsel", step_nosubsel),
                ("step_no_vlbi", step_no_vlbi),
                ("step_corr_only", step_corr_only)]:
    res[name] = timeit(jax.jit(f), (state, packed, gstack, pairs),
                       probe_step)

# 2. transpose+pad prologue alone
def prolog(pk):
    pk = jnp.pad(pk, ((0, 0), (0, 0), (0, NI - I)))
    return jnp.transpose(pk, (1, 0, 2))
res["transpose_pad"] = timeit(
    jax.jit(prolog), (packed,),
    jax.jit(lambda o: jnp.sum(o[0, 0, :8].astype(jnp.int32))))

# 3. corr kernel standalone (measured in stage bench at 7.81)
slow0 = corr.Vis(jnp.zeros((C, NI, NI), jnp.int32),
                 jnp.zeros((C, NI, NI), jnp.int32))
res["corr_blk_acc"] = timeit(
    jax.jit(lambda pk, sl: packed_corr_blk_acc(pk, None, sl, True, True,
                                               False)),
    (packed, slow0),
    jax.jit(lambda o: jnp.sum(o[0].real[0, 0, :8])))

# 4. beamform standalone
res["beamform_fused"] = timeit(
    jax.jit(lambda pk, gs: beamform_products_pallas(pk, gs, cfg.ntime_sum)),
    (packed, gstack),
    jax.jit(lambda o: jnp.sum(o[0][0, 0, :8, 0])))

# 5. beamform without the power/vlbi epilogue transposes? just vlbi off
res["beamform_power_only"] = timeit(
    jax.jit(lambda pk, gs: beamform_products_pallas(
        pk, gs, cfg.ntime_sum, want_vlbi=False)),
    (packed, gstack),
    jax.jit(lambda o: jnp.sum(o[0][0, 0, :8, 0])))

for k, v in res.items():
    print(f"{k}: {v*1e3:.2f} ms")
print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))
