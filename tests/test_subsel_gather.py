"""Pallas subselection-gather kernel: exactness vs the XLA take() path
(interpret mode on CPU; the TPU lowering is measured by
scripts/bench_stages.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from caltech_bifrost_dsp_tpu.ops import corr_subsel as cs
from caltech_bifrost_dsp_tpu.ops.correlate import Vis
from caltech_bifrost_dsp_tpu.ops.pallas.subsel_gather import \
    corr_subsel_pallas


@pytest.mark.parametrize("nv", [64, 700, 1024])
def test_pallas_subsel_matches_xla(rng, nv):
    c, ni = 8, 256
    vis = Vis(
        jnp.asarray(rng.randint(-(1 << 20), 1 << 20, [c, ni, ni])
                    .astype(np.int32)),
        jnp.asarray(rng.randint(-(1 << 20), 1 << 20, [c, ni, ni])
                    .astype(np.int32)))
    pairs = jnp.asarray(rng.randint(0, ni - 6, [nv, 2]).astype(np.int32))
    ref = cs.corr_subsel(vis, pairs, 4)
    got = corr_subsel_pallas(vis, pairs, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.real),
                                  np.asarray(ref.real))
    np.testing.assert_array_equal(np.asarray(got.imag),
                                  np.asarray(ref.imag))


def test_out_of_range_pairs_clamp_like_xla(rng):
    """A malformed runtime baselines command (index >= ninput) must stay
    bounded and deterministic in both engines: the kernel clamps its
    gather indices exactly as XLA's take() does under jit."""
    c, ni, nv = 4, 256, 96
    vis = Vis(
        jnp.asarray(rng.randint(-1000, 1000, [c, ni, ni])
                    .astype(np.int32)),
        jnp.asarray(rng.randint(-1000, 1000, [c, ni, ni])
                    .astype(np.int32)))
    pairs = jnp.asarray(rng.randint(0, 2 * ni, [nv, 2]).astype(np.int32))
    ref = cs.corr_subsel(vis, pairs, 4)
    got = corr_subsel_pallas(vis, pairs, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.real),
                                  np.asarray(ref.real))
    np.testing.assert_array_equal(np.asarray(got.imag),
                                  np.asarray(ref.imag))


@pytest.mark.parametrize("corr_engine", ["xla", "pallas_blk"])
def test_step_subsel_engine_parity(rng, corr_engine):
    """Full fused step with subsel_engine='pallas' is bit-identical to
    the XLA take() path — including on the block engine's 256-padded
    accumulators."""
    from caltech_bifrost_dsp_tpu import config as cfgmod
    from caltech_bifrost_dsp_tpu.models import xengine

    base = cfgmod.TINY.replace(corr_engine=corr_engine)
    outs = {}
    for eng in ("xla", "pallas"):
        cfg = base.replace(subsel_engine=eng)
        state, packed, gains, pairs = xengine.default_inputs(cfg)
        _, out = xengine.xengine_step_jit(state, packed, gains, pairs,
                                          True, True, False, cfg)
        outs[eng] = out.subsel
    np.testing.assert_array_equal(np.asarray(outs["pallas"].real),
                                  np.asarray(outs["xla"].real))
    np.testing.assert_array_equal(np.asarray(outs["pallas"].imag),
                                  np.asarray(outs["xla"].imag))


def test_pallas_subsel_conjugation_sign(rng):
    """Pairs with i0 > i1 must return the conjugate (negated imag) of
    the upper-triangle element, exactly as the XLA path."""
    c, ni, nv = 4, 256, 128
    vis = Vis(
        jnp.asarray(rng.randint(-1000, 1000, [c, ni, ni])
                    .astype(np.int32)),
        jnp.asarray(rng.randint(-1000, 1000, [c, ni, ni])
                    .astype(np.int32)))
    lo = rng.randint(0, ni // 2, nv).astype(np.int32)
    hi = (lo + 1 + rng.randint(0, ni // 2 - 2, nv)).astype(np.int32)
    pairs = jnp.asarray(np.stack([hi, lo], axis=1))  # all conjugated
    got = corr_subsel_pallas(vis, pairs, 1, interpret=True)
    want_r = np.asarray(vis.real)[:, lo, hi]
    want_i = -np.asarray(vis.imag)[:, lo, hi]
    np.testing.assert_array_equal(np.asarray(got.real), want_r)
    np.testing.assert_array_equal(np.asarray(got.imag), want_i)
