"""The flagship model: one fused X-engine step.

Where the reference splits the per-gulp compute across five GPU-owning
threads joined by device rings (Corr -> CorrAcc / CorrSubsel and Beamform ->
BeamformSumBeams, reference: lwa352-pipeline.py:232-294), the TPU build
fuses the whole gulp into ONE jitted XLA program:

    packed 4+4-bit gulp ──┬─ correlate ── fast acc ──┬─ subsel (+chan sum)
                          │                          └─ slow acc
                          └─ beamform ──┬─ dual-pol power integration
                                        └─ VLBI voltage downselect

Integration boundaries arrive as scalar flags from the host arming state
machine (:mod:`..runtime.arming`), so the program itself stays control-flow
free; accumulators live in an on-device carry (:class:`XEngineState`).
Host<->device traffic per gulp is one packed-input H2D plus the small
product outputs — the full fast visibility matrix never crosses to the host
except on slow dumps, mirroring the reference's placement of CorrAcc/Subsel
on the GPU (corr_acc_block.py:304-318, corr_subsel_block.py:298).

An FX variant prepends the PFB channelizer + 4-bit requantization for raw
ADC input (the BASELINE.json north star; the reference's channelizer is FPGA
gateware outside its repo).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import XEngineConfig
from ..ops import beamform as bf
from ..ops import corr_subsel as cs
from ..ops import correlate as corr
from ..ops import pfb as pfb_ops
from ..ops.correlate import Vis


class XEngineState(NamedTuple):
    vis_fast: Vis   # int32 [nchan, ninput, ninput] fast accumulator
    vis_slow: Vis   # int32 [nchan, ninput, ninput] slow accumulator


class XEngineOutputs(NamedTuple):
    subsel: Vis          # int32 [nchan//nchan_sum, nvis_out] (valid on
                         # fast-dump gulps)
    bf_power: jax.Array | None  # f32 [nbeam//2, ntime_gulp//ntime_sum,
                         # nchan, 4]; None when no PBEAM sink is
                         # configured (the step never computes it)
    vlbi: jax.Array | None      # f32 [ntime_gulp, nchan, 2, 2] beam-0
                         # voltages; None when no IBEAM sink exists


def init_state(cfg: XEngineConfig) -> XEngineState:
    ni = cfg.ninput
    if cfg.corr_engine == "pallas_blk":
        # the block engine carries its accumulators at the 256-padded
        # width, avoiding a pad+slice HBM round trip per window; dumps
        # slice back to ninput in dense_vis()
        from ..ops.pallas.corr_blk import padded_ni

        ni = padded_ni(ni)
    return XEngineState(corr.zero_vis(cfg.nchan, ni),
                        corr.zero_vis(cfg.nchan, ni))


def bf_operand_ni(cfg: XEngineConfig) -> int:
    """Input width of the fused beamformer's gain operand — matches the
    correlator kernel's padded width when both engines are active so
    XLA shares ONE pad+transpose of the packed gulp between them."""
    if cfg.corr_engine == "pallas_blk":
        from ..ops.pallas.corr_blk import padded_ni

        return padded_ni(cfg.ninput)
    return cfg.ninput


def _subsel(fast: Vis, subsel_pairs: jax.Array, cfg: XEngineConfig,
            interpret: bool, fast_last, want_subsel: bool) -> Vis | None:
    """Subselection engine dispatch: XLA flat ``take()`` or the Pallas
    two-lane-gather kernel (one HBM cube read vs take's ~2.7x; both
    gather the same int32 elements, output bit-identical).

    Skipped entirely (returns ``None``) when no subsel sink exists
    (``want_subsel=False`` — the reference pipeline built without the
    CorrSubsel block) or when ``fast_last`` is a *static* False: subsel
    consumes fast *dumps* (corr_subsel_block.py:298), so mid-window
    gulps in per-gulp driver mode need not pay the gather."""
    if not want_subsel or fast_last is False:
        return None
    # clamp malformed runtime 'baselines' selections to the REAL input
    # count, not the engine's padded accumulator width: under cti
    # staging the pad rows hold don't-care bytes, so an out-of-range
    # pair must deterministically read a valid input's visibility
    # rather than nondeterministic pad garbage
    subsel_pairs = jnp.clip(subsel_pairs, 0, cfg.ninput - 1)
    return cs.corr_subsel_engine(fast, subsel_pairs, cfg.nchan_sum,
                                 cfg.subsel_engine, interpret)


def _beam_products(packed, gains, cfg: XEngineConfig, want_power: bool,
                   want_vlbi: bool, interpret: bool, layout: str = "tci"):
    """Beamformer product dispatch (XLA path or the fused Pallas
    kernel that never materializes the beam voltages in HBM).

    ``gains`` is either a :class:`BeamGains` pair, or — for the fused
    engine — an already-stacked bf16 operand from
    :func:`..ops.pallas.beamform_fused.stacked_gains` (the driver
    prestacks once per gain load instead of re-deriving the hi/lo
    split every call)."""
    if not (want_power or want_vlbi):
        return None, None
    if cfg.bf_engine == "pallas":
        from ..ops.pallas.beamform_fused import (beamform_products_pallas,
                                                 stacked_gains)

        if isinstance(gains, bf.BeamGains):
            gstack = stacked_gains(gains, bf_operand_ni(cfg))
        else:
            gstack = gains
        return beamform_products_pallas(packed, gstack, cfg.ntime_sum,
                                        want_power, want_vlbi,
                                        layout=layout,
                                        interpret=interpret)
    if not isinstance(gains, bf.BeamGains):
        raise TypeError("prestacked gains require bf_engine='pallas'")
    if layout == "cti":
        # the XLA beamform path wants the wire order; only the Pallas
        # engine consumes the chan-major staging natively
        packed = jnp.transpose(packed, (1, 0, 2))[:, :, :cfg.ninput]
    beams = bf.beamform_gulp(packed, gains)
    power = bf.beam_power_sum(beams, cfg.ntime_sum) if want_power else None
    vlbi = (bf.vlbi_voltage_select(beams, nbeam_out=2)
            if want_vlbi else None)
    return power, vlbi


def xengine_step(state: XEngineState,
                 packed: jax.Array,
                 gains: bf.BeamGains,
                 subsel_pairs: jax.Array,
                 fast_first: jax.Array,
                 fast_last: jax.Array,
                 slow_first: jax.Array,
                 cfg: XEngineConfig,
                 want_power: bool = True,
                 want_vlbi: bool = True,
                 want_subsel: bool = True,
                 layout: str = "tci"
                 ) -> tuple[XEngineState, XEngineOutputs]:
    """Process one gulp.

    Args:
      state: device-resident accumulators.
      packed: uint8 [ntime_gulp, nchan, ninput] (``layout="tci"``, the
        reference's capture-ring order, capture_block.py:262-292) or
        [nchan, ntime_gulp, ninput|padded] (``layout="cti"``, the
        TPU-native staging order: both Pallas engines read it directly,
        skipping a ~2.3 ms pad+transpose prologue per window at the
        production shape — see ops/pallas/corr_blk._to_chan_major).
      gains: beam gains planes [nchan, nbeam, ninput].
      subsel_pairs: int32 [nvis_out, 2] baseline-selection input pairs.
      fast_first: bool scalar — this gulp begins a fast accumulation
        (overwrite instead of add; the reference's ``this_gulp_time ==
        first``, corr_block.py:433).
      fast_last: bool scalar — this gulp completes a fast accumulation
        (the xGPU dump flag, corr_block.py:445); subsel output is valid and
        the slow accumulator ingests the completed fast matrix.
      slow_first: bool scalar — the completed fast dump begins a new slow
        accumulation (CorrAcc ``BFMap("a = b")`` vs ``"a += b"``,
        corr_acc_block.py:303-306).
      cfg: static configuration.
      want_power / want_vlbi: static flags — when False the beam product
        is not computed at all (the corresponding sink is unconfigured;
        saves both the beamform matmul work and the per-gulp D2H
        transfer).  When both are False the beamformer is skipped
        entirely, mirroring a reference pipeline built without the
        Beamform threads.
      want_subsel: static flag — when False (no subsel sink) the
        baseline-selection gather is skipped and ``outputs.subsel`` is
        None.  It is also skipped when ``fast_last`` is a static False
        (mid-window gulp in per-gulp mode: the driver only consumes
        subsel on dump gulps).
    """
    interpret = jax.default_backend() == "cpu"
    if layout not in ("tci", "cti"):
        raise ValueError(f"unknown layout {layout!r}")
    if (cfg.corr_engine == "pallas_blk"
            and isinstance(fast_first, bool)
            and isinstance(fast_last, bool)
            and isinstance(slow_first, bool)):
        # static boundary flags (the driver/bench path): correlate AND
        # apply the whole accumulator algebra inside the kernel — the
        # adds ride the visibility tiles in VMEM instead of separate
        # full-cube XLA passes
        from ..ops.pallas.corr_blk import packed_corr_blk_acc

        fast, slow = packed_corr_blk_acc(
            packed, None if fast_first else state.vis_fast,
            state.vis_slow, fast_first, fast_last, slow_first,
            layout=layout, interpret=interpret)
        subsel = _subsel(fast, subsel_pairs, cfg, interpret, fast_last,
                         want_subsel)
        power, vlbi = _beam_products(packed, gains, cfg, want_power,
                                     want_vlbi, interpret, layout)
        return (XEngineState(fast, slow),
                XEngineOutputs(subsel, power, vlbi))
    if cfg.corr_engine == "pallas_blk":
        from ..ops.pallas.corr_blk import packed_corr_blk

        # traced boundary flags: plain kernel + XLA selects on the
        # padded accumulators
        vis_gulp = packed_corr_blk(packed, interpret=interpret,
                                   slice_out=False, layout=layout)
    elif cfg.corr_engine == "pallas_triu":
        from ..ops.pallas.corr_triu import packed_corr_triu

        if layout == "cti":
            packed = jnp.transpose(packed, (1, 0, 2))[:, :, :cfg.ninput]
            layout = "tci"
        vis_gulp = packed_corr_triu(packed, interpret=interpret)
    else:
        if layout == "cti":
            packed = jnp.transpose(packed, (1, 0, 2))[:, :, :cfg.ninput]
            layout = "tci"
        vis_gulp = corr.correlate_gulp(packed)

    def _sel(flag, a, b):
        if isinstance(flag, bool):
            # static flag: XLA sees only the taken branch (the driver
            # passes python bools; saves dead accumulator traffic)
            return a if flag else b
        pred = jnp.asarray(flag, dtype=bool)
        return Vis(jnp.where(pred, a.real, b.real),
                   jnp.where(pred, a.imag, b.imag))

    fast = _sel(fast_first, vis_gulp, state.vis_fast + vis_gulp)
    slow_candidate = _sel(slow_first, fast, state.vis_slow + fast)
    slow = _sel(fast_last, slow_candidate, state.vis_slow)

    subsel = _subsel(fast, subsel_pairs, cfg, interpret, fast_last,
                     want_subsel)
    power, vlbi = _beam_products(packed, gains, cfg, want_power,
                                 want_vlbi, interpret, layout)
    return (XEngineState(fast, slow),
            XEngineOutputs(subsel, power, vlbi))


@functools.partial(jax.jit, static_argnames=("cfg", "fast_first",
                                             "fast_last", "slow_first",
                                             "want_power", "want_vlbi",
                                             "want_subsel", "layout"))
def xengine_step_jit(state, packed, gains, subsel_pairs, fast_first: bool,
                     fast_last: bool, slow_first: bool,
                     cfg: XEngineConfig, want_power: bool = True,
                     want_vlbi: bool = True, want_subsel: bool = True,
                     layout: str = "tci"):
    """Boundary flags are *static* here (at most 8 specializations);
    XLA folds the accumulator selects to the taken branch."""
    return xengine_step(state, packed, gains, subsel_pairs,
                        bool(fast_first), bool(fast_last),
                        bool(slow_first), cfg, want_power, want_vlbi,
                        want_subsel, layout)


def fx_step(state: XEngineState,
            adc: jax.Array,
            window: jax.Array,
            quant_scale: jax.Array,
            gains: bf.BeamGains,
            subsel_pairs: jax.Array,
            fast_first, fast_last, slow_first,
            cfg: XEngineConfig, want_power: bool = True,
            want_vlbi: bool = True, want_subsel: bool = True,
            layout: str = "tci"
            ) -> tuple[XEngineState, XEngineOutputs]:
    """FX variant: raw ADC samples -> PFB -> 4-bit requant -> X/B step.

    Args:
      adc: f32 or int8 [(ntime_gulp + pfb_ntap - 1) * 2 * nchan, ninput]
        real ADC samples (overlap of ntap-1 frames with the previous
        gulp — the halo that time-sharded operation exchanges between
        shards).  int8 is the production digitizer width; products are
        bit-identical to the same values in f32 at 4x less traffic.
      window: f32 [pfb_ntap, 2*nchan] PFB prototype filter.
      quant_scale: f32 scalar requantization gain.
    """
    if cfg.pfb_fft_impl == "matmul":
        # complex-free path (some AOT backends reject complex HLO);
        # input-major internals, XLA or fused-Pallas engine.  The
        # corner-turn out of input-major picks whichever staging order
        # the X/B kernels want, so "cti" costs nothing extra here.
        pk = pfb_ops.channelize_pack_imajor(adc, window, cfg,
                                            quant_scale)
        packed = (jnp.transpose(pk, (2, 1, 0)) if layout == "cti"
                  else jnp.transpose(pk, (1, 2, 0)))
    else:
        spec = pfb_ops.pfb_channelize(adc, window, cfg.nchan,
                                      cfg.pfb_ntap,
                                      fft_impl=cfg.pfb_fft_impl)
        packed = pfb_ops.quantize_4bit(spec, quant_scale)
        if layout == "cti":
            packed = jnp.transpose(packed, (1, 0, 2))
    return xengine_step(state, packed, gains, subsel_pairs, fast_first,
                        fast_last, slow_first, cfg, want_power,
                        want_vlbi, want_subsel, layout)


@functools.partial(jax.jit, static_argnames=("cfg", "fast_first",
                                             "fast_last", "slow_first",
                                             "want_power", "want_vlbi",
                                             "want_subsel", "layout"))
def fx_step_jit(state, adc, window, quant_scale, gains, subsel_pairs,
                fast_first, fast_last, slow_first, cfg: XEngineConfig,
                want_power: bool = True, want_vlbi: bool = True,
                want_subsel: bool = True, layout: str = "tci"):
    return fx_step(state, adc, window, quant_scale, gains, subsel_pairs,
                   fast_first, fast_last, slow_first, cfg, want_power,
                   want_vlbi, want_subsel, layout)


def dense_vis(vis, cfg: XEngineConfig):
    """Accumulator -> full Hermitian matrix (mirrors the triangular
    engine's upper-triangle-only accumulators; identity for the dense
    engine).  Called per dump, off the hot path."""
    if cfg.corr_engine in ("pallas_triu", "pallas_blk"):
        from ..ops.pallas.corr_triu import mirror_vis

        vis = mirror_vis(vis)
        if vis.real.shape[1] != cfg.ninput:  # blk engine: padded state
            vis = Vis(vis.real[:, :cfg.ninput, :cfg.ninput],
                      vis.imag[:, :cfg.ninput, :cfg.ninput])
        return vis
    return vis


def default_inputs(cfg: XEngineConfig, seed: int = 0):
    """Convenience: state + example inputs for compile checks and benches."""
    import numpy as np

    rng = np.random.RandomState(seed)
    packed = jnp.asarray(rng.randint(
        0, 255, [cfg.ntime_gulp, cfg.nchan, cfg.ninput]).astype(np.uint8))
    gains = bf.BeamGains(
        jnp.ones((cfg.nchan, cfg.nbeam, cfg.ninput), jnp.float32),
        jnp.zeros((cfg.nchan, cfg.nbeam, cfg.ninput), jnp.float32))
    # production-shaped selection (all pol pairs among the first 48
    # stands, reference: corr_subsel_block.py:185) so benches and
    # compile checks exercise the deployed gather pattern; falls back
    # to the autos-cycling default for configs too small to hold it
    pairs = jnp.asarray(cs.baselines_to_inputs(
        cs.production_baselines(cfg.nvis_out, cfg.nstand, cfg.npol),
        cfg.npol).astype(np.int32))
    return init_state(cfg), packed, gains, pairs
