"""Fused Pallas beamform kernel (interpret mode): power and VLBI
products must match the XLA path inside the reference's rtol=1e-4 gate
(reference: tests/beamformer/beamformer_test.py:106-109)."""

import jax.numpy as jnp
import numpy as np
import pytest

from caltech_bifrost_dsp_tpu.ops import beamform as bf
from caltech_bifrost_dsp_tpu.ops.pallas.beamform_fused import (
    beamform_products_pallas, stacked_gains)


def _close(got, want):
    """Scale-aware gate: the reference tolerance is rtol=1e-4 against a
    software truth; bf16x2 cancellation on near-zero cross-pol terms
    needs an atol scaled to the product magnitudes."""
    want = np.asarray(want)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                               atol=2e-4 * np.abs(want).max())


@pytest.fixture
def setup():
    rng = np.random.RandomState(7)
    ntime, nchan, ninput, nbeam = 48, 3, 36, 8
    packed = jnp.asarray(rng.randint(0, 256, [ntime, nchan, ninput])
                         .astype(np.uint8))
    g = (rng.standard_normal([nchan, nbeam, ninput])
         + 1j * rng.standard_normal([nchan, nbeam, ninput])
         ).astype(np.complex64)
    gains = bf.BeamGains.from_complex(g)
    return packed, gains, ntime, nbeam


def test_power_and_vlbi_match_xla(setup):
    packed, gains, ntime, nbeam = setup
    ntime_sum = 12
    beams = bf.beamform_gulp(packed, gains)
    want_power = np.asarray(bf.beam_power_sum(beams, ntime_sum))
    want_vlbi = np.asarray(bf.vlbi_voltage_select(beams, nbeam_out=2))

    gstack = stacked_gains(gains, 64)
    power, vlbi = beamform_products_pallas(
        packed, gstack, ntime_sum, interpret=True)
    _close(power, want_power)
    _close(vlbi, want_vlbi)


def test_power_only_and_vlbi_only(setup):
    packed, gains, ntime, nbeam = setup
    gstack = stacked_gains(gains, 64)
    power, vlbi = beamform_products_pallas(
        packed, gstack, 12, want_vlbi=False, interpret=True)
    assert power is not None and vlbi is None
    power, vlbi = beamform_products_pallas(
        packed, gstack, 12, want_power=False, interpret=True)
    assert power is None and vlbi is not None


def test_driver_beam_products_engine_parity():
    """PBEAM/IBEAM packets from the fused engine must match the XLA
    engine through the full driver (gains loaded over the control
    plane), within the reference tolerance class."""
    import socket

    from caltech_bifrost_dsp_tpu import config as cfgmod
    from caltech_bifrost_dsp_tpu.control.client import (CorrControlClient,
                                                        PipelineControl)
    from caltech_bifrost_dsp_tpu.control.command import CommandBlock
    from caltech_bifrost_dsp_tpu.control.store import MemoryStore
    from caltech_bifrost_dsp_tpu.io import packets as pk
    from caltech_bifrost_dsp_tpu.io import sink, source
    from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline

    def run(bf_engine):
        CommandBlock.reset_instance_counts()
        cfg = cfgmod.TINY.replace(corr_engine="pallas_blk",
                                  bf_engine=bf_engine)
        store = MemoryStore()
        src = source.DummySource(cfg, mode="random")
        pb, ib = [], []
        pipe = XEnginePipeline(
            cfg, src, store=store,
            pbeam_outputs=[sink.PBeamOutput(cfg,
                                            senders={0: pb.append})],
            ibeam_outputs=[sink.IBeamOutput(cfg, send=ib.append)])
        cli = CorrControlClient(store=store, timeout_s=10.0)
        ctl = PipelineControl(cli, socket.gethostname(), 0)
        rng = np.random.RandomState(2)
        for b in range(2):
            ctl.beamform.update_delays(
                b, rng.uniform(0, 5, cfg.ninput),
                amps=np.ones(cfg.ninput), load_sample=-1)
        pipe.run(8, timeout_s=300)
        return pb, ib

    pb_x, ib_x = run("xla")
    pb_p, ib_p = run("pallas")
    assert pb_x and len(pb_x) == len(pb_p)
    assert ib_x and len(ib_x) == len(ib_p)
    nonzero = 0
    for a, b in zip(pb_x, pb_p):
        ha, da = pk.decode_pbeam(a)
        hb, db = pk.decode_pbeam(b)
        assert ha == hb
        _close(db, da)
        nonzero += np.abs(da).sum() > 0
    assert nonzero
    for a, b in zip(ib_x, ib_p):
        _, da = pk.decode_ibeam(a)
        _, db = pk.decode_ibeam(b)
        _close(db, da)


def test_multi_tile_time_axis(setup):
    """ntime spanning several tiles exercises the scratch accumulate
    (ts is capped; use a long gulp so n_t > 1)."""
    rng = np.random.RandomState(8)
    ntime, nchan, ninput, nbeam = 480, 2, 20, 4
    packed = jnp.asarray(rng.randint(0, 256, [ntime, nchan, ninput])
                         .astype(np.uint8))
    g = (rng.standard_normal([nchan, nbeam, ninput])
         + 1j * rng.standard_normal([nchan, nbeam, ninput])
         ).astype(np.complex64)
    gains = bf.BeamGains.from_complex(g)
    beams = bf.beamform_gulp(packed, gains)
    want_power = np.asarray(bf.beam_power_sum(beams, 24))
    want_vlbi = np.asarray(bf.vlbi_voltage_select(beams, nbeam_out=2))
    gstack = stacked_gains(gains, 32)
    power, vlbi = beamform_products_pallas(packed, gstack, 24,
                                           interpret=True)
    _close(power, want_power)
    _close(vlbi, want_vlbi)
