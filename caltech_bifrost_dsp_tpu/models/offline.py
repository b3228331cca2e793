"""Offline pipelines: upchannelizing beamformer and imaging correlator.

TPU-native analogs of the reference's high-level-API offline pipelines
(reference: pipeline/scripts/lwa352-upchan-bf.py and
lwa352-upchan-imag.py): instead of chains of bifrost blocks
(copy -> transpose -> fft -> weights -> reduce -> HDF5), each pipeline is a
plain jitted JAX program over gulps of replayed trigger-buffer data, plus a
small host loop for file IO.

Data layout mirrors the reference's labeled tensor axes
(['time','fine_time','freq','stand','pol'] framing from
trigger_source_block.py:30-49): a gulp of GSIZE samples is reshaped to
(time, NUPCHAN) frames, FFT'd over fine_time, and beam weights are applied
per (freq, fine_freq, stand, pol).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pfb as pfb_ops
from ..utils import skycoords
from ..utils.codec import unpack_complex_np


@dataclass
class OfflineBeamConfig:
    """Pointing + calibration for one offline beamforming run
    (reference: BfOfflineWeightsBlock.__init__, beamform_offline_block.py:50).
    """
    nbeam: int
    ra_deg: list
    dec_deg: list
    enz_positions: np.ndarray          # [nstand, 3] meters
    lat_deg: float = 37.2398          # OVRO-LWA site
    lon_deg: float = -118.2817
    nupchan: int = 32
    ntimestep: int = 1000             # samples between weight updates
    cal_gains: np.ndarray | None = None  # complex [nchan_fine, nstand*npol]
    weighting: np.ndarray = field(default=None)  # [nstand] taper


def compute_offline_weights(cfg: OfflineBeamConfig, freqs_hz: np.ndarray,
                            t_unix: float) -> np.ndarray:
    """Per-beam complex weights [nbeam, nchan_fine, nstand*npol].

    Geometric delays from antenna ENZ positions toward (ra, dec) at
    ``t_unix`` (beamform_offline_block.py:110-142 ``compute_weights``),
    times calibration gains when provided.
    """
    npol = 2
    nstand = len(cfg.enz_positions)
    taper = (np.ones(nstand) if cfg.weighting is None
             else np.clip(cfg.weighting, 0, 1))
    weights = np.empty((cfg.nbeam, len(freqs_hz), nstand * npol),
                       np.complex64)
    for b in range(cfg.nbeam):
        az, alt = skycoords.radec_to_altaz(cfg.ra_deg[b], cfg.dec_deg[b],
                                           t_unix, cfg.lat_deg,
                                           cfg.lon_deg)
        delays_s = skycoords.geometric_delays_s(cfg.enz_positions, az, alt)
        # amplitude taper multiplies the WEIGHT, never the delay: taper
        # inside the exponential leaves |w|==1 (no attenuation) and
        # mis-points the tapered antenna's phase instead
        wdel = np.repeat(delays_s, npol)                  # [nstand*npol]
        amp = np.repeat(taper, npol)
        w = amp[None, :] * np.exp(
            2j * np.pi * freqs_hz[:, None] * wdel[None, :])
        if cfg.cal_gains is not None:
            # cal_gains: complex [nchan_fine, nstand*npol]
            w = w * cfg.cal_gains
        weights[b] = w.astype(np.complex64)
    return weights


@functools.partial(jax.jit, static_argnames=("nupchan",))
def upchannelize_gulp(voltages: jax.Array, nupchan: int) -> jax.Array:
    """[time, chan, stand, pol] complex voltages ->
    [time//nupchan, chan, nupchan(fine), stand, pol]
    (the transpose->fft('fine_time') chain, lwa352-upchan-bf.py:94-97)."""
    fine = pfb_ops.upchannelize(voltages, nupchan)  # [T, nup, chan, s, p]
    return jnp.transpose(fine, (0, 2, 1, 3, 4))


@jax.jit
def apply_weights_and_sum(fine: jax.Array, weights: jax.Array) -> jax.Array:
    """Beamform the upchannelized data.

    Args:
      fine: complex64 [T, chan, fine, stand, pol].
      weights: complex64 [nbeam, chan*fine, stand*pol].

    Returns:
      complex64 [T, nbeam, chan*fine]: weights applied then reduced over
      stand and pol (the blocks.reduce 'stand'/'pol' chain,
      lwa352-upchan-bf.py:119-121).
    """
    T, nchan, nfine, nstand, npol = fine.shape
    x = fine.reshape(T, nchan * nfine, nstand * npol)
    return jnp.einsum("tfi,bfi->tbf", x, weights)


def upchan_beamform_run(voltages_packed: np.ndarray, cfg: OfflineBeamConfig,
                        sfreq_hz: float, chan_bw_hz: float,
                        t_unix: float = 0.0, gulp_ntime: int = 480,
                        accumulate: bool = True):
    """Full offline upchan + beamform pass over a trigger-buffer array.

    Args:
      voltages_packed: uint8 [ntime, nchan, nstand, npol] 4+4-bit.
      accumulate: if True, average beam powers over each gulp
        (AccumHDF5SaveBlock semantics); else return voltages per gulp.

    Returns:
      (fine_freqs_hz, list of per-gulp outputs [nbeam, nchan*nupchan]).
    """
    ntime, nchan, nstand, npol = voltages_packed.shape
    nup = cfg.nupchan
    fine_bw = chan_bw_hz / nup
    # fine-channel center frequencies after fftshift (fine index 0 = most
    # negative offset)
    offsets = (np.arange(nup) - nup // 2) * fine_bw
    freqs = (sfreq_hz + np.arange(nchan) * chan_bw_hz)[:, None] + offsets
    freqs = freqs.reshape(-1)
    weights = jnp.asarray(compute_offline_weights(cfg, freqs, t_unix))
    outputs = []
    next_update = cfg.ntimestep  # samples between weight updates
    for g0 in range(0, ntime - gulp_ntime + 1, gulp_ntime):
        if g0 >= next_update:
            # track sky rotation across a long replay: recompute the
            # geometric weights every ntimestep samples (the reference
            # BfOfflineWeightsBlock's update cadence) — one spectrum =
            # 1/chan_bw seconds of sky time
            weights = jnp.asarray(compute_offline_weights(
                cfg, freqs, t_unix + g0 / chan_bw_hz))
            next_update = g0 + cfg.ntimestep
        gulp = unpack_complex_np(voltages_packed[g0:g0 + gulp_ntime])
        fine = upchannelize_gulp(jnp.asarray(gulp), nup)
        beams = apply_weights_and_sum(fine, weights)  # [T', nbeam, F]
        if accumulate:
            outputs.append(np.asarray(
                jnp.mean(jnp.abs(beams) ** 2, axis=0)))
        else:
            outputs.append(np.asarray(beams))
    return freqs, outputs


@functools.partial(jax.jit, static_argnames=("nupchan", "chan_lo",
                                             "chan_hi"))
def upchan_select_gulp(voltages: jax.Array, nupchan: int, chan_lo: int,
                       chan_hi: int) -> jax.Array:
    """Upchannelize, merge (chan, fine) axes and slice a channel range —
    the transpose/merge_axes/FrequencySelectBlock chain
    (lwa352-upchan-imag.py:95-101, imaging_offline_block.py:28-77).

    Returns complex64 [T', chan_hi-chan_lo, stand, pol].
    """
    fine = upchannelize_gulp(voltages, nupchan)  # [T', c, f, s, p]
    T, nchan, nfine, nstand, npol = fine.shape
    merged = fine.reshape(T, nchan * nfine, nstand, npol)
    return merged[:, chan_lo:chan_hi]


@jax.jit
def correlate_offline(voltages: jax.Array) -> jax.Array:
    """blocks.correlate analog: integrate v_i v_j* over the gulp.

    Args:
      voltages: complex64 [T, chan, stand, pol].

    Returns:
      complex64 [chan, stand*pol, stand*pol].
    """
    T, nchan, nstand, npol = voltages.shape
    x = voltages.reshape(T, nchan, nstand * npol)
    return jnp.einsum("tci,tcj->cij", x, jnp.conj(x))


def upchan_imaging_run(voltages_packed: np.ndarray, nupchan: int,
                       chan_range: tuple[int, int],
                       nframe_per_integration: int,
                       gulp_ntime: int = 480):
    """Offline imaging pass: upchan -> channel select -> integrate
    visibilities (lwa352-upchan-imag.py:91-111).

    Returns list of integrated visibility matrices
    [nchan_sel, ninput, ninput].
    """
    ntime = voltages_packed.shape[0]
    acc = None
    nacc = 0
    out = []
    for g0 in range(0, ntime - gulp_ntime + 1, gulp_ntime):
        gulp = unpack_complex_np(voltages_packed[g0:g0 + gulp_ntime])
        sel = upchan_select_gulp(jnp.asarray(gulp), nupchan,
                                 chan_range[0], chan_range[1])
        v = correlate_offline(sel)
        acc = v if acc is None else acc + v
        nacc += sel.shape[0]
        if nacc >= nframe_per_integration:
            out.append(np.asarray(acc))
            acc, nacc = None, 0
    if acc is not None:
        out.append(np.asarray(acc))
    return out
