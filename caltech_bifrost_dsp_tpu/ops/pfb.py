"""Polyphase filterbank (F-engine) channelization.

The reference's 4096-channel PFB lives in FPGA gateware outside its repo;
per BASELINE.json's north star the TPU framework implements channelization
as a first-class component.  The only in-repo software channelizer is the
offline 32x "upchannelizer" — a blockwise, windowless frame FFT
(reference: pipeline/scripts/lwa352-upchan-bf.py:94-97, frame axes set up at
blocks/trigger_source_block.py:37-49) — which is also provided here.

Design notes (TPU-first):
- The critically-sampled PFB frontend is ``frames -> window FIR -> DFT``.
  Production path: input-major layout (frame axis innermost), real DFT
  as MXU matmuls — direct [L, nchan] at pipeline scale, two-stage
  Cooley-Tukey factored at F-engine scale — with the 4-bit requant
  fused behind it; engines are the XLA graph here or the fused Pallas
  kernel (:mod:`.pallas.pfb_fused`), selected by ``cfg.pfb_engine``.
  An XLA ``rfft`` variant exists for backends whose compiler supports
  the FFT lowering.  Everything is static-shaped and jit friendly.
- Overlap framing makes this the framework's sequence-parallel component:
  time-sharded operation needs (ntap-1)*L halo samples from the preceding
  shard, exchanged with ``ppermute``
  (``caltech_bifrost_dsp_tpu.parallel.mesh._halo_extend``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pfb_window(nchan: int, ntap: int, kind: str = "hamming") -> np.ndarray:
    """Standard sinc-windowed PFB prototype filter, [ntap, 2*nchan] f32.

    ``sinc`` spans [-ntap/2, ntap/2) so each branch applies one sinc lobe;
    normalized so the filter sums to 1 per polyphase branch on average.
    """
    taps = ntap * 2 * nchan
    t = np.arange(taps) / (2 * nchan) - ntap / 2.0
    sinc = np.sinc(t)
    if kind == "hamming":
        win = np.hamming(taps)
    elif kind == "hanning":
        win = np.hanning(taps)
    elif kind == "boxcar":
        win = np.ones(taps)
    else:
        raise ValueError(f"unknown window kind {kind!r}")
    coeff = (sinc * win).astype(np.float32)
    coeff /= coeff.sum() / ntap
    return coeff.reshape(ntap, 2 * nchan)


def required_ntime(nspec: int, nchan: int, ntap: int) -> int:
    """ADC samples needed to produce ``nspec`` spectra."""
    return (nspec + ntap - 1) * 2 * nchan


def rdft_matrices(nchan: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-input DFT as two f32 matrices [2*nchan, nchan]:
    X[k] = sum_n x[n] (cos - i sin)(2 pi n k / 2 nchan), k < nchan."""
    L = 2 * nchan
    n = np.arange(L)[:, None]
    k = np.arange(nchan)[None, :]
    ang = 2 * np.pi * n * k / L
    return (np.cos(ang).astype(np.float32),
            -np.sin(ang).astype(np.float32))


def _dft_factors(L: int) -> tuple[int, int] | None:
    """Pick (L1, L2) with L = L1*L2 for the two-stage factored DFT,
    preferring factors near sqrt(L).  Returns None when the direct
    O(L^2) matmul is the better TPU program: factoring only wins once
    both factors are MXU-sized — measured on TPU, L=384 -> (24, 16)
    factors *lose* to the direct [384, 192] matmul (tiny contraction
    dims idle the 128x128 systolic array), while L=8192 -> (128, 64)
    wins by the full ~21x work ratio."""
    if L < 2048:
        return None
    best = None
    f = int(np.sqrt(L))
    for d in range(f, 1, -1):
        if L % d == 0:
            best = (L // d, d)   # L1 (outer) >= L2 (inner)
            break
    if best is None or best[1] < 32 or best[0] < 64:
        return None
    return best


@functools.lru_cache(maxsize=8)
def _rdft_factored_tables(nchan: int):
    """Constant tables for the factored real-input DFT (f32):
    inner-DFT [L2, L2] cos/-sin, twiddle [L1, L2] cos/-sin, outer-DFT
    [L1, L1//2] cos/sin.  Derivation: n = n1 + L1*n2, k = k2 + L2*k1 ->
    X[k] = sum_n1 W_L1^{n1 k1} (W_L^{n1 k2} sum_n2 x[n1+L1 n2]
    W_L2^{n2 k2}); only k < nchan = L/2 is needed so k1 < L1/2."""
    L = 2 * nchan
    L1, L2 = _dft_factors(L)
    n2 = np.arange(L2)[:, None]
    k2 = np.arange(L2)[None, :]
    ang2 = 2 * np.pi * n2 * k2 / L2
    c2, s2 = np.cos(ang2), -np.sin(ang2)
    n1 = np.arange(L1)[:, None]
    angt = 2 * np.pi * n1 * k2 / L           # twiddle W_L^{n1 k2}
    twr, twi = np.cos(angt), -np.sin(angt)
    k1 = np.arange(L1 // 2)[None, :]
    ang1 = 2 * np.pi * n1 * k1 / L1
    c1, s1 = np.cos(ang1), np.sin(ang1)
    # cache NUMPY arrays: jnp constants created inside a jit trace
    # would leak tracers through the lru_cache
    return tuple(m.astype(np.float32)
                 for m in (c2, s2, twr, twi, c1, s1)), (L1, L2)


def _rdft_apply(fir2: jax.Array, nchan: int,
                precision: str = "high") -> tuple[jax.Array, jax.Array]:
    """Real-input DFT of the last axis (length 2*nchan) -> (re, im)
    planes with nchan bins, as MXU matmuls.

    Uses the O(L*(L1+L2)) two-stage Cooley-Tukey factorization when L
    factors usefully (essential at F-engine scale: direct O(L^2) at
    L=8192 is ~21x more MXU work), falling back to the direct [L, nchan]
    matmul pair for small L.  ``precision``: "high" (3-pass bf16) or
    "bf16" (1-pass).
    """
    L = 2 * nchan
    hp = (jax.lax.Precision.DEFAULT if precision == "bf16"
          else jax.lax.Precision.HIGH)
    if _dft_factors(L) is None:
        cos_m, msin_m = (jnp.asarray(m) for m in rdft_matrices(nchan))
        return (jnp.matmul(fir2, cos_m, precision=hp),
                jnp.matmul(fir2, msin_m, precision=hp))
    tables, (L1, L2) = _rdft_factored_tables(nchan)
    c2, s2, twr, twi, c1, s1 = (jnp.asarray(m) for m in tables)
    lead = fir2.shape[:-1]
    x = fir2.reshape(lead + (L2, L1))        # [.., n2, n1]
    y = jnp.swapaxes(x, -1, -2)              # [.., n1, n2]
    sr = jnp.matmul(y, c2, precision=hp)     # [.., n1, k2]
    si = jnp.matmul(y, s2, precision=hp)
    tr = sr * twr - si * twi                 # twiddle (fused elementwise)
    ti = sr * twi + si * twr
    tr = jnp.swapaxes(tr, -1, -2)            # [.., k2, n1]
    ti = jnp.swapaxes(ti, -1, -2)
    xr = (jnp.matmul(tr, c1, precision=hp)
          + jnp.matmul(ti, s1, precision=hp))   # [.., k2, k1]
    xi = (jnp.matmul(ti, c1, precision=hp)
          - jnp.matmul(tr, s1, precision=hp))
    # k = k1*L2 + k2 -> put k1 outer and flatten
    xr = jnp.swapaxes(xr, -1, -2).reshape(lead + (nchan,))
    xi = jnp.swapaxes(xi, -1, -2).reshape(lead + (nchan,))
    return xr, xi


@functools.partial(jax.jit, static_argnames=("nchan", "ntap", "fft_impl"))
def pfb_channelize(x: jax.Array, window: jax.Array, nchan: int,
                   ntap: int, fft_impl: str = "fft") -> jax.Array:
    """Critically-sampled real-input PFB.

    Args:
      x: f32 ADC samples [ntime, ...] with
        ntime == (nspec + ntap - 1) * 2 * nchan; trailing axes (e.g. input)
        are carried through.
      window: f32 [ntap, 2*nchan] prototype filter.
      nchan: output channels (FFT length is 2*nchan real samples).
      ntap: polyphase taps.

    Returns:
      complex64 [nspec, nchan, ...]: bins 0..nchan-1 of the rFFT (the
      Nyquist bin is dropped, matching an nchan-channel F-engine).
    """
    L = 2 * nchan
    ntime = x.shape[0]
    if ntime % L:
        raise ValueError("ntime must be a multiple of 2*nchan")
    nframe = ntime // L
    nspec = nframe - (ntap - 1)
    if nspec <= 0:
        raise ValueError("not enough samples for one spectrum")
    tail = x.shape[1:]
    frames = x.reshape((nframe, L) + tail)
    # FIR as a sum of ntap shifted frame views (NOT a gather, which would
    # materialize ntap copies of the input — 10+ GB at full scale);
    # int8 ADC input converts per-slice, fused into the multiply
    wshape = (1, L) + (1,) * len(tail)
    fir = sum(frames[k:k + nspec].astype(jnp.float32)
              * window[k].reshape(wshape)
              for k in range(ntap))           # [nspec, L, ...]
    if fft_impl == "matmul":
        # Real DFT as MXU matmuls — avoids the FFT lowering (the axon
        # AOT compile helper rejects it) and vectorizes over all
        # trailing axes at once; factored O(L*(L1+L2)) at F-engine scale.
        fir2 = jnp.moveaxis(fir, 1, -1)       # [nspec, ..., L]
        re, im = _rdft_apply(fir2, nchan)
        spec = jnp.moveaxis(re + 1j * im, -1, 1)
        return spec.astype(jnp.complex64)
    spec = jnp.fft.rfft(fir, axis=1)          # [nspec, nchan+1, ...]
    return spec[:, :nchan].astype(jnp.complex64)


def cdft_matrices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Complex DFT as two f32 matrices [n, n] (cos, -sin)."""
    k = np.arange(n)
    ang = 2 * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("nchan", "ntap"))
def pfb_channelize_planes(x: jax.Array, window: jax.Array, nchan: int,
                          ntap: int) -> tuple[jax.Array, jax.Array]:
    """Complex-free PFB: returns (re, im) f32 planes [nspec, nchan, ...].

    Uses the matmul real-DFT so no complex dtype ever exists — some AOT
    backends (the axon compile helper) reject complex HLO outright.
    """
    L = 2 * nchan
    ntime = x.shape[0]
    if ntime % L:
        raise ValueError("ntime must be a multiple of 2*nchan")
    nframe = ntime // L
    nspec = nframe - (ntap - 1)
    if nspec <= 0:
        raise ValueError("not enough samples for one spectrum")
    tail = x.shape[1:]
    frames = x.reshape((nframe, L) + tail)
    wshape = (1, L) + (1,) * len(tail)
    fir = sum(frames[k:k + nspec].astype(jnp.float32)
              * window[k].reshape(wshape)
              for k in range(ntap))           # [nspec, L, ...]
    fir2 = jnp.moveaxis(fir, 1, -1)           # [nspec, ..., L]
    re, im = _rdft_apply(fir2, nchan)
    return jnp.moveaxis(re, -1, 1), jnp.moveaxis(im, -1, 1)


@functools.partial(jax.jit, static_argnames=("nchan", "ntap",
                                             "precision"))
def pfb_channelize_planes_imajor(x: jax.Array, window: jax.Array,
                                 nchan: int, ntap: int,
                                 precision: str = "high"
                                 ) -> tuple[jax.Array, jax.Array]:
    """Input-major complex-free PFB: (re, im) f32 [ninput, nspec, nchan].

    The production layout: measured on TPU, the [nspec, L, ninput]
    chan-major FIR + moveaxis costs ~68 ms of the 100 ms real-time
    budget (strided VPU access + a 2.6 GB f32 transpose), while the
    same FIR with the frame axis innermost is roofline-fast and the
    layout fix-up moves to the 8x-smaller packed product
    (:func:`quantize_4bit_planes_imajor`).

    Args:
      x: f32 ADC samples [ntime, ninput].
      precision: "high" (3-pass bf16 DFT matmuls, ~1e-6) or "bf16"
        (1-pass; ~1e-2 — the class of error a fixed-point FPGA
        F-engine's own coefficients carry, and well inside the 4-bit
        requantizer's step at production scales).

    Measured alternative worth recording: folding the window into
    ntap per-tap DFT matrices (no FIR materialization) was SLOWER on
    TPU in both precisions (1.29x/1.59x real time vs 1.66x for
    FIR-then-DFT) — the 4x matmul work outweighs the saved FIR
    traffic, because the DFT matmul is MXU-bound while the FIR is
    HBM-bound and they overlap poorly.
    """
    L = 2 * nchan
    ntime, ninput = x.shape
    if ntime % L:
        raise ValueError("ntime must be a multiple of 2*nchan")
    nframe = ntime // L
    nspec = nframe - (ntap - 1)
    if nspec <= 0:
        raise ValueError("not enough samples for one spectrum")
    frames = x.T.reshape(ninput, nframe, L)   # int8 transposes 4x cheaper
    fir = sum(frames[:, k:k + nspec, :].astype(jnp.float32)
              * window[k][None, None, :]
              for k in range(ntap))               # [ninput, nspec, L]
    if precision == "bf16" and _dft_factors(L) is None:
        cos_m, msin_m = (jnp.asarray(m) for m in rdft_matrices(nchan))
        fb = fir.astype(jnp.bfloat16)
        dn = (((2,), (0,)), ((), ()))
        re = jax.lax.dot_general(fb, cos_m.astype(jnp.bfloat16), dn,
                                 preferred_element_type=jnp.float32)
        im = jax.lax.dot_general(fb, msin_m.astype(jnp.bfloat16), dn,
                                 preferred_element_type=jnp.float32)
        return re, im
    # factored scale honors bf16 via single-pass matmul precision
    return _rdft_apply(fir, nchan, precision=precision)


def quantize_pack_imajor(re: jax.Array, im: jax.Array,
                         scale=1.0) -> jax.Array:
    """Quantize+pack input-major planes -> packed uint8
    [ninput, nspec, nchan] (no layout change; the mesh corner-turn
    rides these 8x-smaller bytes).  ``scale``: scalar or per-channel
    [nchan]."""
    from ..utils.codec import pack_jnp

    s = jnp.asarray(scale)
    if s.ndim == 1:
        s = s.reshape(1, 1, -1)                   # chan is the last axis
    r = jnp.clip(jnp.round(re * s), -8, 7).astype(jnp.int8)
    i = jnp.clip(jnp.round(im * s), -8, 7).astype(jnp.int8)
    return pack_jnp(r, i)                         # [ninput, nspec, nchan]


def quantize_4bit_planes_imajor(re: jax.Array, im: jax.Array,
                                scale=1.0) -> jax.Array:
    """Quantize+pack input-major planes [ninput, nspec, nchan] and
    transpose the PACKED bytes to the correlator's [nspec, nchan,
    ninput] — the uint8 transpose is 8x cheaper than transposing the
    f32 planes.  ``scale`` may be scalar or per-channel [nchan]."""
    return jnp.transpose(quantize_pack_imajor(re, im, scale), (1, 2, 0))


def channelize_pack_imajor(adc: jax.Array, window: jax.Array, cfg,
                           quant_scale) -> jax.Array:
    """Engine dispatch for the production channelizer: ADC
    [ntime, ninput] -> packed uint8 [ninput, nspec, nchan] (input-major;
    callers transpose the bytes or corner-turn them first).

    The fused kernel holds direct [L, nchan] DFT matrices in VMEM at
    pipeline scale and the factored Cooley-Tukey tables at F-engine
    scale; shapes with no viable tiling fall back to the XLA path."""
    if cfg.pfb_engine == "pallas":
        from .pallas.pfb_fused import pfb_quantize_packed_pallas, \
            tiling_viable

        L = 2 * cfg.nchan
        nspec = adc.shape[0] // L - (cfg.pfb_ntap - 1)
        dft_vmem = 2 * L * cfg.nchan * 4
        viable = tiling_viable(nspec, adc.shape[1], cfg.nchan) and (
            dft_vmem <= 8 << 20 or _dft_factors(L) is not None)
        if viable:
            return pfb_quantize_packed_pallas(
                adc, window, cfg.nchan, cfg.pfb_ntap, quant_scale,
                fast=cfg.pfb_precision == "bf16",
                interpret=jax.default_backend() == "cpu")
    re, im = pfb_channelize_planes_imajor(adc, window, cfg.nchan,
                                          cfg.pfb_ntap,
                                          precision=cfg.pfb_precision)
    return quantize_pack_imajor(re, im, quant_scale)


def _broadcast_scale(scale, ndim: int):
    """Scalar or per-channel [nchan] requant gain -> broadcastable shape
    for [..., nchan, ninput] spectra (the F-engine 'eq' coefficient
    analog)."""
    s = jnp.asarray(scale)
    if s.ndim == 1:
        return s.reshape((1,) * (ndim - 2) + (-1, 1))
    return s


def quantize_4bit_planes(re: jax.Array, im: jax.Array,
                         scale=1.0) -> jax.Array:
    """Complex-free version of :func:`quantize_4bit`; ``scale`` may be a
    scalar or per-channel [nchan] vector."""
    from ..utils.codec import pack_jnp

    s = _broadcast_scale(scale, re.ndim)
    r = jnp.clip(jnp.round(re * s), -8, 7).astype(jnp.int8)
    i = jnp.clip(jnp.round(im * s), -8, 7).astype(jnp.int8)
    return pack_jnp(r, i)


def upchannelize(x: jax.Array, nup: int, axis_time: int = 0,
                 fft_impl: str = "fft") -> jax.Array:
    """Blockwise (zero-overlap) fine channelization.

    Reshapes time into (time, fine_time=nup) frames, FFTs over the fine
    axis and fftshifts so fine channel 0 is the most-negative offset —
    the offline upchannelizer decomposition
    (reference: lwa352-upchan-bf.py:94-97 over the 'fine_time' tensor axis).

    Args:
      x: complex [ntime, ...] post-F voltages (time on ``axis_time``).
      nup: fine channels per coarse channel (NUPCHAN=32,
        reference: blocks/beamform_offline_block.py).

    Returns:
      complex64 [ntime//nup, nup, ...]: coarse time x fine channel.
    """
    x = jnp.moveaxis(x, axis_time, 0)
    ntime = x.shape[0]
    if ntime % nup:
        raise ValueError("ntime must be a multiple of nup")
    frames = x.reshape((ntime // nup, nup) + x.shape[1:])
    if fft_impl == "matmul":
        cos_m, msin_m = (jnp.asarray(m) for m in cdft_matrices(nup))
        fr = jnp.moveaxis(jnp.real(frames), 1, -1)
        fi = jnp.moveaxis(jnp.imag(frames), 1, -1)
        hp = jax.lax.Precision.HIGH
        re = jnp.matmul(fr, cos_m, precision=hp) \
            - jnp.matmul(fi, msin_m, precision=hp)
        im = jnp.matmul(fr, msin_m, precision=hp) \
            + jnp.matmul(fi, cos_m, precision=hp)
        fine = jnp.moveaxis(re + 1j * im, -1, 1)
    else:
        fine = jnp.fft.fft(frames, axis=1)
    fine = jnp.fft.fftshift(fine, axes=1)
    return fine.astype(jnp.complex64)


def quantize_4bit(z: jax.Array, scale=1.0) -> jax.Array:
    """Requantize complex voltages to packed 4+4-bit bytes.

    The F-engine emits 4+4-bit complex ints; this closes the loop so the
    PFB output can feed the packed-input correlator/beamformer path.
    Rounds-to-nearest and saturates to [-8, 7].  ``scale`` may be a
    scalar or per-channel [nchan] vector (the F-engine 'eq' analog).
    """
    from ..utils.codec import pack_jnp

    s = _broadcast_scale(scale, z.ndim)
    re = jnp.clip(jnp.round(jnp.real(z) * s), -8, 7).astype(jnp.int8)
    im = jnp.clip(jnp.round(jnp.imag(z) * s), -8, 7).astype(jnp.int8)
    return pack_jnp(re, im)


def pfb_reference_np(x: np.ndarray, window: np.ndarray, nchan: int,
                     ntap: int) -> np.ndarray:
    """Plain numpy reference implementation for tests."""
    L = 2 * nchan
    nframe = x.shape[0] // L
    nspec = nframe - (ntap - 1)
    tail = x.shape[1:]
    frames = x.reshape((nframe, L) + tail)
    out = np.empty((nspec, nchan) + tail, dtype=np.complex64)
    w = window.reshape((ntap, L) + (1,) * len(tail))
    for s in range(nspec):
        fir = (frames[s:s + ntap] * w).sum(axis=0)
        out[s] = np.fft.rfft(fir, axis=0)[:nchan]
    return out
