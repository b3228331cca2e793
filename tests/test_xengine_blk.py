"""Fused step + driver with the 256-block int8 Karatsuba correlator
(interpret mode on CPU): kernel exactness and golden equality
end-to-end."""

import jax.numpy as jnp
import numpy as np

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.ops import correlate as corr
from caltech_bifrost_dsp_tpu.ops.pallas.corr_blk import (BLK,
                                                         packed_corr_blk)
from caltech_bifrost_dsp_tpu.ops.pallas.corr_triu import mirror_vis
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline
from caltech_bifrost_dsp_tpu.verification import golden

CFG = cfgmod.TINY.replace(corr_engine="pallas_blk")


def test_kernel_valid_blocks_exact():
    """Every block with blk(j) >= blk(i) must be bit-identical to the
    dense engine (includes sub-diagonal entries of diagonal blocks,
    which this kernel computes fully)."""
    rng = np.random.RandomState(3)
    ntime, nchan, ninput = 32, 3, 300  # 300 -> 2 blocks with padding
    packed = jnp.asarray(rng.randint(0, 256, [ntime, nchan, ninput])
                         .astype(np.uint8))
    want = corr.correlate_gulp(packed)
    got = packed_corr_blk(packed, interpret=True)
    for b0 in range(-(-ninput // BLK)):
        for b1 in range(b0, -(-ninput // BLK)):
            sl0 = slice(b0 * BLK, min((b0 + 1) * BLK, ninput))
            sl1 = slice(b1 * BLK, min((b1 + 1) * BLK, ninput))
            np.testing.assert_array_equal(
                np.asarray(got.real[:, sl0, sl1]),
                np.asarray(want.real[:, sl0, sl1]))
            np.testing.assert_array_equal(
                np.asarray(got.imag[:, sl0, sl1]),
                np.asarray(want.imag[:, sl0, sl1]))


def test_mirror_vis_completes_hermitian():
    rng = np.random.RandomState(4)
    packed = jnp.asarray(rng.randint(0, 256, [16, 2, 40])
                         .astype(np.uint8))
    want = corr.correlate_gulp(packed)
    got = mirror_vis(packed_corr_blk(packed, interpret=True))
    np.testing.assert_array_equal(np.asarray(got.real),
                                  np.asarray(want.real))
    np.testing.assert_array_equal(np.asarray(got.imag),
                                  np.asarray(want.imag))


def test_acc_kernel_flag_algebra():
    """packed_corr_blk_acc must reproduce the reference integration
    algebra (corr_block.py:433-445 / corr_acc_block.py:303-306)
    bit-exactly on the valid blocks for every boundary-flag combo."""
    from caltech_bifrost_dsp_tpu.ops.pallas.corr_blk import (
        packed_corr_blk_acc, padded_ni)

    rng = np.random.RandomState(5)
    ntime, nchan, ninput = 24, 2, 48
    ni = padded_ni(ninput)
    packed = jnp.asarray(rng.randint(0, 256, [ntime, nchan, ninput])
                         .astype(np.uint8))
    v = corr.correlate_gulp(packed)

    def pad_vis(seed):
        r = np.zeros((nchan, ni, ni), np.int32)
        i = np.zeros((nchan, ni, ni), np.int32)
        rr = np.random.RandomState(seed)
        r[:, :ninput, :ninput] = rr.randint(-9999, 9999,
                                            (nchan, ninput, ninput))
        i[:, :ninput, :ninput] = rr.randint(-9999, 9999,
                                            (nchan, ninput, ninput))
        return corr.Vis(jnp.asarray(r), jnp.asarray(i))

    fast_in, slow_in = pad_vis(6), pad_vis(7)

    def valid(x):
        return np.asarray(x)[:, :ninput, :ninput]

    for ff in (True, False):
        for fl in (True, False):
            for sf in (True, False):
                fast, slow = packed_corr_blk_acc(
                    packed, None if ff else fast_in, slow_in,
                    ff, fl, sf, interpret=True)
                want_f_r = np.asarray(v.real) if ff else \
                    valid(fast_in.real) + np.asarray(v.real)
                np.testing.assert_array_equal(valid(fast.real), want_f_r)
                if not fl:
                    want_s = valid(slow_in.real)
                elif sf:
                    want_s = valid(fast.real)
                else:
                    want_s = valid(slow_in.real) + valid(fast.real)
                np.testing.assert_array_equal(valid(slow.real), want_s)


def test_pipeline_golden_with_blk_engine(tmp_path):
    ntime = CFG.acc_len_slow
    inp = str(tmp_path / "in.dat")
    corrfile = str(tmp_path / "corr.dat")
    golden.write_input_file(inp, ntime, CFG.nchan, CFG.nstand, CFG.npol,
                            CFG.acc_len)
    golden.write_corr_file(corrfile, ntime, CFG.nchan, CFG.nstand,
                           CFG.npol, CFG.acc_len)
    src = source.DummySource(CFG, mode="testfile", testfile=inp)
    sub_pkts = []
    corr_out = sink.CorrFullOutput(CFG, checkfile=corrfile,
                                   checkfile_acc_len=CFG.acc_len)
    sub_out = sink.CorrPartOutput(CFG, send=sub_pkts.append)
    pipe = XEnginePipeline(CFG, src, corr_outputs=[corr_out],
                           subsel_outputs=[sub_out], selftest=True)
    pipe.run(ntime // CFG.ntime_gulp, timeout_s=300)
    assert pipe.ndump_slow == 1
    assert corr_out.check_count == 1 and corr_out.check_failures == 0
    assert pipe.selftest_failures == 0 and pipe.selftest_count == 2
    assert sub_pkts


def test_cti_layout_step_bit_identical():
    """The chan-major staging order ("cti") must produce bit-identical
    products to the wire order ("tci"), including when the input
    arrives pre-padded to the 256 block width with garbage in the pad
    lanes (zero-gain rows and the dense_vis slice keep them out of
    every product)."""
    from caltech_bifrost_dsp_tpu.models import xengine
    from caltech_bifrost_dsp_tpu.ops.pallas.beamform_fused import \
        stacked_gains
    from caltech_bifrost_dsp_tpu.ops.pallas.corr_blk import padded_ni

    rng = np.random.RandomState(7)
    cfg = cfgmod.TINY.replace(corr_engine="pallas_blk",
                              bf_engine="pallas")
    state, packed, gains, pairs = xengine.default_inputs(cfg, seed=7)
    gstack = stacked_gains(gains, xengine.bf_operand_ni(cfg))

    st_t, out_t = xengine.xengine_step(
        state, packed, gstack, pairs, True, True, False, cfg)

    ni_pad = padded_ni(cfg.ninput)
    pk_cm = np.transpose(np.asarray(packed), (1, 0, 2))
    pk_cm_garbage = rng.randint(
        0, 256, [cfg.nchan, cfg.ntime_gulp, ni_pad]).astype(np.uint8)
    pk_cm_garbage[:, :, :cfg.ninput] = pk_cm

    for cm in (jnp.asarray(pk_cm), jnp.asarray(pk_cm_garbage)):
        st_c, out_c = xengine.xengine_step(
            state, cm, gstack, pairs, True, True, False, cfg,
            layout="cti")
        for a, b in ((xengine.dense_vis(st_t.vis_fast, cfg),
                      xengine.dense_vis(st_c.vis_fast, cfg)),
                     (xengine.dense_vis(st_t.vis_slow, cfg),
                      xengine.dense_vis(st_c.vis_slow, cfg)),
                     (out_t.subsel, out_c.subsel)):
            np.testing.assert_array_equal(np.asarray(a.real),
                                          np.asarray(b.real))
            np.testing.assert_array_equal(np.asarray(a.imag),
                                          np.asarray(b.imag))
        np.testing.assert_array_equal(np.asarray(out_t.bf_power),
                                      np.asarray(out_c.bf_power))
        np.testing.assert_array_equal(np.asarray(out_t.vlbi),
                                      np.asarray(out_c.vlbi))


def test_cti_layout_fx_step_bit_identical():
    """FX variant: raw ADC in, cti staging out of the PFB corner-turn
    must match the tci products bit-exactly."""
    from caltech_bifrost_dsp_tpu.models import xengine
    from caltech_bifrost_dsp_tpu.ops import pfb as pfb_ops
    from caltech_bifrost_dsp_tpu.ops.pallas.beamform_fused import \
        stacked_gains

    rng = np.random.RandomState(8)
    cfg = cfgmod.TINY.replace(corr_engine="pallas_blk",
                              bf_engine="pallas",
                              pfb_fft_impl="matmul")
    state, _, gains, pairs = xengine.default_inputs(cfg, seed=8)
    gstack = stacked_gains(gains, xengine.bf_operand_ni(cfg))
    window = jnp.asarray(pfb_ops.pfb_window(cfg.nchan, cfg.pfb_ntap))
    nadc = (cfg.ntime_gulp + cfg.pfb_ntap - 1) * 2 * cfg.nchan
    adc = jnp.asarray((rng.standard_normal([nadc, cfg.ninput]) * 3)
                      .astype(np.float32))
    scale = jnp.float32(0.5)

    st_t, out_t = xengine.fx_step(state, adc, window, scale, gstack,
                                  pairs, True, True, False, cfg)
    st_c, out_c = xengine.fx_step(state, adc, window, scale, gstack,
                                  pairs, True, True, False, cfg,
                                  layout="cti")
    for a, b in ((st_t.vis_fast, st_c.vis_fast),
                 (out_t.subsel, out_c.subsel)):
        np.testing.assert_array_equal(np.asarray(a.real),
                                      np.asarray(b.real))
        np.testing.assert_array_equal(np.asarray(a.imag),
                                      np.asarray(b.imag))
    np.testing.assert_array_equal(np.asarray(out_t.bf_power),
                                  np.asarray(out_c.bf_power))
    np.testing.assert_array_equal(np.asarray(out_t.vlbi),
                                  np.asarray(out_c.vlbi))
