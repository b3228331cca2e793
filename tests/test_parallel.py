"""Sharded F/X/B programs on the virtual 8-device CPU mesh: halo-exchange
PFB, all_to_all corner-turn, psum visibility reduction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.ops import beamform as bf
from caltech_bifrost_dsp_tpu.ops import corr_subsel as cs
from caltech_bifrost_dsp_tpu.ops import pfb as pfb_ops
from caltech_bifrost_dsp_tpu.parallel import mesh as pmesh

# nchan=32 so every chan-shard count in the parametrization keeps the
# per-shard channel count a multiple of nchan_sum
CFG = cfgmod.XEngineConfig(nstand=8, nchan=32, ntime_gulp=48, acc_len=96,
                           acc_len_slow=192, nbeam=4, ntime_sum=12,
                           nchan_sum=4, npipeline=2, pfb_ntap=4)


def _fx_inputs(rng, nspec_total):
    nadc = nspec_total * 2 * CFG.nchan
    adc = jnp.asarray(rng.standard_normal([nadc, CFG.ninput])
                      .astype(np.float32) * 3)
    window = jnp.asarray(pfb_ops.pfb_window(CFG.nchan, CFG.pfb_ntap))
    g = (rng.standard_normal([CFG.nchan, CFG.nbeam, CFG.ninput])
         + 1j * rng.standard_normal([CFG.nchan, CFG.nbeam, CFG.ninput])
         ).astype(np.complex64)
    gains = bf.BeamGains.from_complex(g)
    pairs = jnp.asarray(cs.baselines_to_inputs(
        cs.default_baselines(CFG.nvis_out, CFG.nstand)).astype(np.int32))
    return adc, window, gains, pairs


@pytest.mark.parametrize("n_time,n_chan,impl", [
    (2, 4, "fft"), (4, 2, "fft"), (1, 8, "fft"), (8, 1, "fft"),
    (2, 4, "matmul")])
def test_fx_sharded_matches_unsharded(rng, n_time, n_chan, impl):
    if len(jax.devices()) < n_time * n_chan:
        pytest.skip("need 8 virtual devices")
    cfg = CFG.replace(pfb_fft_impl=impl)
    mesh = pmesh.make_mesh(n_time, n_chan)
    nspec_total = 8 * CFG.ntime_sum  # divisible by time shards * ntime_sum
    adc, window, gains, pairs = _fx_inputs(rng, nspec_total)
    fn = jax.jit(pmesh.fx_sharded_fn(cfg, mesh))
    with jax.set_mesh(mesh):
        out = fn(adc, window, gains, pairs, jnp.float32(1.0))
        vis_r = np.asarray(out.vis.real)
        vis_i = np.asarray(out.vis.imag)
        sub_r = np.asarray(out.subsel.real)
        power = np.asarray(out.bf_power)
    ref = pmesh.fx_reference_unsharded(CFG, adc, window, gains, pairs,
                                       jnp.float32(1.0),
                                       n_time_shards=n_time)
    np.testing.assert_array_equal(vis_r, np.asarray(ref.vis.real))
    np.testing.assert_array_equal(vis_i, np.asarray(ref.vis.imag))
    np.testing.assert_array_equal(sub_r, np.asarray(ref.subsel.real))
    np.testing.assert_allclose(power, np.asarray(ref.bf_power), rtol=1e-3,
                               atol=1e-2)


def test_fx_halo_exchange_removes_shard_seams(rng):
    """With >1 time shard, all spectra except shard 0's startup transient
    must equal the full unsharded PFB (no seams at shard boundaries)."""
    n_time = 4
    mesh = pmesh.make_mesh(n_time, 2)
    nspec_total = 8 * CFG.ntime_sum
    adc, window, gains, pairs = _fx_inputs(rng, nspec_total)
    fn = jax.jit(pmesh.fx_sharded_fn(CFG, mesh))
    with jax.set_mesh(mesh):
        out = fn(adc, window, gains, pairs, jnp.float32(1.0))
        vis_sharded = np.asarray(out.vis.real)
    # Reference with n_time_shards=n_time reproduces only shard-0's
    # transient; interior shards must match it exactly, proving the halo
    # actually crossed shard boundaries.
    ref = pmesh.fx_reference_unsharded(CFG, adc, window, gains, pairs,
                                       jnp.float32(1.0),
                                       n_time_shards=n_time)
    np.testing.assert_array_equal(vis_sharded, np.asarray(ref.vis.real))
    # and differ from a halo-less (per-shard-independent) computation
    ref_nohalo_specs = []
    t_local = adc.shape[0] // n_time
    for s in range(n_time):
        ref_nohalo_specs.append(pfb_ops.pfb_channelize(
            adc[s * t_local:(s + 1) * t_local], window, CFG.nchan,
            CFG.pfb_ntap))
    assert sum(x.shape[0] for x in ref_nohalo_specs) < nspec_total


def test_xengine_sharded_stateful_stream(rng):
    """Drive a full fast accumulation through the stateful sharded step
    (2 gulps) and compare fast/slow/subsel against the single-device
    fused step."""
    from caltech_bifrost_dsp_tpu.models import xengine

    cfg = CFG
    mesh = pmesh.make_mesh(2, 4)
    ntime = 2 * cfg.ntime_sum * 2  # per-gulp global spectra (div by mesh)
    gulps = [jnp.asarray(rng.randint(
        0, 255, [ntime, cfg.nchan, cfg.ninput]).astype(np.uint8))
        for _ in range(2)]
    _, _, gains, pairs = xengine.default_inputs(cfg)
    step_mid = jax.jit(pmesh.xengine_sharded_state_fn(
        cfg, mesh, fast_first=True, fast_last=False, slow_first=True))
    step_end = jax.jit(pmesh.xengine_sharded_state_fn(
        cfg, mesh, fast_first=False, fast_last=True, slow_first=True))
    state = pmesh.zero_sharded_state(cfg, mesh)
    with jax.set_mesh(mesh):
        state, out1, _ = step_mid(state, gulps[0], gains, pairs)
        # mid-window gulps carry partials only: no full vis/subsel output
        assert out1.vis is None and out1.subsel is None
        state, out2, vlbi = step_end(state, gulps[1], gains, pairs)
        fast_r = np.asarray(out2.vis.real)
        slow_r = np.asarray(state[1].real)
        sub_r = np.asarray(out2.subsel.real)
        vlbi_np = np.asarray(vlbi)
    # single-device reference
    ref_state = xengine.init_state(cfg)
    ref_state, _ = xengine.xengine_step_jit(
        ref_state, gulps[0], gains, pairs, True, False, True, cfg)
    ref_state, ref_out = xengine.xengine_step_jit(
        ref_state, gulps[1], gains, pairs, False, True, True, cfg)
    np.testing.assert_array_equal(fast_r, np.asarray(ref_state.vis_fast.real))
    np.testing.assert_array_equal(slow_r, np.asarray(ref_state.vis_slow.real))
    np.testing.assert_array_equal(sub_r, np.asarray(ref_out.subsel.real))
    np.testing.assert_allclose(vlbi_np, np.asarray(ref_out.vlbi),
                               rtol=1e-4, atol=1e-3)


def test_corr_stand_sharded_matches_unsharded(rng):
    """Antenna-sharded correlator (all_gather over 'stand') vs dense."""
    from caltech_bifrost_dsp_tpu.ops import correlate

    mesh = pmesh.make_stand_mesh(4)
    packed = jnp.asarray(rng.randint(
        0, 255, [48, CFG.nchan, CFG.ninput]).astype(np.uint8))
    fn = jax.jit(pmesh.corr_stand_sharded_fn(CFG, mesh))
    with jax.set_mesh(mesh):
        vis = fn(packed)
        vr = np.asarray(vis.real)
        vi = np.asarray(vis.imag)
    ref = correlate.correlate_gulp(packed)
    np.testing.assert_array_equal(vr, np.asarray(ref.real))
    np.testing.assert_array_equal(vi, np.asarray(ref.imag))


def test_xengine_sharded_matches_unsharded(rng):
    from caltech_bifrost_dsp_tpu.ops import correlate

    mesh = pmesh.make_mesh(2, 4)
    ntime = 4 * CFG.ntime_sum
    packed = jnp.asarray(rng.randint(
        0, 255, [ntime, CFG.nchan, CFG.ninput]).astype(np.uint8))
    _, window, gains, pairs = _fx_inputs(rng, 8)
    fn = jax.jit(pmesh.xengine_sharded_fn(CFG, mesh))
    with jax.set_mesh(mesh):
        out = fn(packed, gains, pairs)
        vis_r = np.asarray(out.vis.real)
        power = np.asarray(out.bf_power)
    ref_vis = correlate.correlate_gulp(packed)
    np.testing.assert_array_equal(vis_r, np.asarray(ref_vis.real))
    beams = bf.beamform_gulp(packed, gains)
    ref_power = np.asarray(bf.beam_power_sum(beams, CFG.ntime_sum))
    np.testing.assert_allclose(power, ref_power, rtol=1e-3, atol=1e-2)


def test_xengine_sharded_with_pallas_engines(rng):
    """Sharded step with the production engines (256-block Karatsuba
    correlator + fused beamformer): visibilities bit-exact against the
    unsharded same-engine step; beam powers in the bf16x2 class."""
    from caltech_bifrost_dsp_tpu.ops.pallas.beamform_fused import (
        beamform_products_pallas, stacked_gains)
    from caltech_bifrost_dsp_tpu.ops.pallas.corr_blk import packed_corr_blk
    from caltech_bifrost_dsp_tpu.ops.pallas.corr_triu import mirror_vis

    cfg = CFG.replace(corr_engine="pallas_blk", bf_engine="pallas",
                      subsel_engine="pallas")
    mesh = pmesh.make_mesh(2, 4)
    ntime = 4 * cfg.ntime_sum
    packed = jnp.asarray(rng.randint(
        0, 255, [ntime, cfg.nchan, cfg.ninput]).astype(np.uint8))
    _, window, gains, pairs = _fx_inputs(rng, 8)
    fn = jax.jit(pmesh.xengine_sharded_fn(cfg, mesh))
    with jax.set_mesh(mesh):
        out = fn(packed, gains, pairs)
        vis_r = np.asarray(out.vis.real)
        vis_i = np.asarray(out.vis.imag)
        sub_r = np.asarray(out.subsel.real)
        sub_i = np.asarray(out.subsel.imag)
        power = np.asarray(out.bf_power)
    ref = mirror_vis(packed_corr_blk(packed, interpret=True))
    np.testing.assert_array_equal(vis_r, np.asarray(ref.real))
    np.testing.assert_array_equal(vis_i, np.asarray(ref.imag))
    from caltech_bifrost_dsp_tpu.ops.correlate import Vis
    ref_sub = cs.corr_subsel(
        Vis(jnp.asarray(vis_r), jnp.asarray(vis_i)), pairs,
        cfg.nchan_sum)
    np.testing.assert_array_equal(sub_r, np.asarray(ref_sub.real))
    np.testing.assert_array_equal(sub_i, np.asarray(ref_sub.imag))
    gstack = stacked_gains(gains, cfg.ninput)
    ref_power, _ = beamform_products_pallas(
        packed, gstack, cfg.ntime_sum, want_vlbi=False, interpret=True)
    ref_power = np.asarray(ref_power)
    np.testing.assert_allclose(
        power, ref_power, rtol=2e-4,
        atol=2e-4 * np.abs(ref_power).max())


def test_fx_sharded_int8_adc_matches_f32(rng):
    """int8 ADC through the sharded FX program (ppermute halo and
    all_to_all ride the 4x-smaller int8/packed bytes) is exactly equal
    to the same values fed as f32."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 virtual devices")
    cfg = CFG.replace(pfb_fft_impl="matmul", adc_dtype="int8")
    mesh = pmesh.make_mesh(2, 4)
    nspec_total = 8 * CFG.ntime_sum
    adc, window, gains, pairs = _fx_inputs(rng, nspec_total)
    adc8 = jnp.asarray(np.clip(np.rint(np.asarray(adc) * 10), -127, 127)
                       .astype(np.int8))
    fn = jax.jit(pmesh.fx_sharded_fn(cfg, mesh))
    with jax.set_mesh(mesh):
        out8 = fn(adc8, window, gains, pairs, jnp.float32(0.2))
        out32 = fn(adc8.astype(jnp.float32), window, gains, pairs,
                   jnp.float32(0.2))
        np.testing.assert_array_equal(np.asarray(out8.vis.real),
                                      np.asarray(out32.vis.real))
        np.testing.assert_array_equal(np.asarray(out8.vis.imag),
                                      np.asarray(out32.vis.imag))


@pytest.mark.parametrize("impl", ["fft", "matmul"])
def test_fx_sharded_per_channel_eq_vector(rng, impl):
    """A per-channel [nchan] EQ/requant vector through the chan-sharded
    FX program equals the unsharded reference — the fft-impl branch
    quantizes AFTER the corner-turn, so each shard must slice its local
    channel range out of the full vector (regression: the full-length
    vector used to broadcast-fail against the local channel count)."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 virtual devices")
    cfg = CFG.replace(pfb_fft_impl=impl)
    mesh = pmesh.make_mesh(2, 4)
    nspec_total = 8 * CFG.ntime_sum
    adc, window, gains, pairs = _fx_inputs(rng, nspec_total)
    eq = jnp.asarray(np.linspace(0.5, 2.0, CFG.nchan).astype(np.float32))
    fn = jax.jit(pmesh.fx_sharded_fn(cfg, mesh))
    with jax.set_mesh(mesh):
        out = fn(adc, window, gains, pairs, eq)
        vis_r = np.asarray(out.vis.real)
        vis_i = np.asarray(out.vis.imag)
        sub_r = np.asarray(out.subsel.real)
    ref = pmesh.fx_reference_unsharded(CFG, adc, window, gains, pairs,
                                       eq, n_time_shards=2)
    np.testing.assert_array_equal(vis_r, np.asarray(ref.vis.real))
    np.testing.assert_array_equal(vis_i, np.asarray(ref.vis.imag))
    np.testing.assert_array_equal(sub_r, np.asarray(ref.subsel.real))


def test_fx_sharded_state_per_channel_eq_vector(rng):
    """Same regression against the stateful sharded FX step's fft branch
    (runtime eq_gains command on a mesh pipeline)."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 virtual devices")
    cfg = CFG.replace(pfb_fft_impl="fft")
    mesh = pmesh.make_mesh(2, 4)
    fn = pmesh.fx_sharded_state_fn(cfg, mesh, fast_first=True,
                                   fast_last=True, slow_first=True,
                                   want_power=False, want_vlbi=False)
    nspec_total = 8 * CFG.ntime_sum
    adc, window, gains, pairs = _fx_inputs(rng, nspec_total)
    eq = jnp.asarray(np.linspace(0.5, 2.0, CFG.nchan).astype(np.float32))
    state = pmesh.zero_sharded_state(cfg, mesh)
    halo = (cfg.pfb_ntap - 1) * 2 * cfg.nchan
    carry = jnp.zeros([halo, cfg.ninput], adc.dtype)
    with jax.set_mesh(mesh):
        _, outs, _ = fn(state, adc, carry, window, eq, gains, pairs)
        fast_r = np.asarray(outs.vis.real)
    ref = pmesh.fx_reference_unsharded(cfg, adc, window, gains, pairs,
                                       eq, n_time_shards=2)
    np.testing.assert_array_equal(fast_r, np.asarray(ref.vis.real))
