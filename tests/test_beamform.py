"""Beamformer vs numpy reference (tolerance gate matches the reference's
SoftwareBf comparator, tests/beamformer/beamformer_test.py:106-109)."""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.ops import beamform
from caltech_bifrost_dsp_tpu.utils import codec

NTIME, NCHAN, NSTAND, NPOL, NBEAM = 96, 8, 10, 2, 6
NINPUT = NSTAND * NPOL
NTIME_SUM = 24


def _data(rng):
    packed = rng.randint(0, 255, [NTIME, NCHAN, NINPUT]).astype(np.uint8)
    gains = (rng.standard_normal([NCHAN, NBEAM, NINPUT])
             + 1j * rng.standard_normal([NCHAN, NBEAM, NINPUT])
             ).astype(np.complex64)
    return packed, gains


def _software_bf(packed, gains):
    """Reference semantics: bf[c,b,t] = sum_i w[c,b,i] * x[t,c,i]
    (no conjugation; cublas_beamform.cu:248-276)."""
    x = codec.unpack_complex_np(packed).astype(np.complex128)
    return np.einsum("cbi,tci->cbt", gains.astype(np.complex128), x)


def test_beamform_matches_software_reference(rng):
    packed, gains = _data(rng)
    bf = beamform.beamform_gulp(jnp.asarray(packed),
                                beamform.BeamGains.from_complex(gains))
    got = np.asarray(bf.real) + 1j * np.asarray(bf.imag)
    want = _software_bf(packed, gains)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-3)


def test_beam_power_sum(rng):
    packed, gains = _data(rng)
    bf = beamform.beamform_gulp(jnp.asarray(packed),
                                beamform.BeamGains.from_complex(gains))
    pw = np.asarray(beamform.beam_power_sum(bf, NTIME_SUM))
    assert pw.shape == (NBEAM // 2, NTIME // NTIME_SUM, NCHAN, 4)
    z = _software_bf(packed, gains)  # [c, b, t]
    x = z[:, 0::2]
    y = z[:, 1::2]
    xs = x.reshape(NCHAN, NBEAM // 2, NTIME // NTIME_SUM, NTIME_SUM)
    ys = y.reshape(NCHAN, NBEAM // 2, NTIME // NTIME_SUM, NTIME_SUM)
    want = np.stack([
        np.sum(np.abs(xs) ** 2, -1),
        np.sum(np.abs(ys) ** 2, -1),
        np.sum(np.real(xs * np.conj(ys)), -1),
        np.sum(np.imag(xs * np.conj(ys)), -1),
    ], axis=-1).transpose(1, 2, 0, 3)
    # powers are O(1e5-1e6); near-cancelling cross terms need an atol
    # scaled to the power magnitude at the engine's ~2e-5 voltage error
    assert np.allclose(pw, want, rtol=1e-3,
                       atol=1e-4 * np.abs(want).max())


def test_beam_power_single_matches_pair(rng):
    packed, gains = _data(rng)
    bf = beamform.beamform_gulp(jnp.asarray(packed),
                                beamform.BeamGains.from_complex(gains))
    all_pw = np.asarray(beamform.beam_power_sum(bf, NTIME_SUM))
    one = np.asarray(beamform.beam_power_single(bf, 1, NTIME_SUM))
    np.testing.assert_allclose(one, all_pw[1], rtol=1e-6)


def test_vlbi_voltage_select(rng):
    packed, gains = _data(rng)
    bf = beamform.beamform_gulp(jnp.asarray(packed),
                                beamform.BeamGains.from_complex(gains))
    v = np.asarray(beamform.vlbi_voltage_select(bf))
    assert v.shape == (NTIME, NCHAN, 2, 2)
    z = _software_bf(packed, gains)
    np.testing.assert_allclose(v[..., 0] + 1j * v[..., 1],
                               z[:, :2].transpose(2, 0, 1), rtol=1e-4,
                               atol=1e-3)


def test_delays_to_gains_phase_convention():
    freqs = np.array([10e6, 20e6])
    delays_ns = np.zeros([1, 4])
    delays_ns[0, 2] = 50.0
    amps = np.ones([1, 4])
    cal = np.ones([2, 1, 4], dtype=np.complex64)
    g = beamform.delays_to_gains(freqs, delays_ns, amps, cal)
    gz = np.asarray(g.real) + 1j * np.asarray(g.imag)
    # phases = exp(+2j pi f tau) (reference: beamform_block.py:348)
    want = np.exp(1j * 2 * np.pi * freqs[:, None] * delays_ns[0] * 1e-9)
    np.testing.assert_allclose(gz[:, 0, :], want, rtol=1e-6)
