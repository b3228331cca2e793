"""Device-mesh sharding of the F/X/B pipeline.

The reference scales out with 32 *share-nothing* pipelines, each owning
192 of 6144 channels — the F->X corner-turn is done by FPGAs and an
Ethernet switch before the data ever reaches software
(reference: lwa352-pipeline.py:164-180, SURVEY.md section 2.3).  On a TPU
mesh the corner-turn and the new shardings become XLA collectives:

- axis ``time``  — sequence parallelism: ADC time blocks are sharded;
  the PFB's (ntap-1)-frame overlap is exchanged between neighboring shards
  with ``ppermute`` (overlap-save halo); visibility partial sums over time
  reduce with ``psum``.
- axis ``chan`` — the reference's frequency sharding.  Before the
  correlator, the channelizer output is *input*-sharded over this axis, and
  one ``all_to_all`` performs the F->X corner-turn
  (input-sharded -> channel-sharded), the on-mesh equivalent of the
  FPGA/switch corner-turn.

Everything is expressed with ``shard_map`` over a ``jax.sharding.Mesh`` so
XLA schedules the collectives over ICI; no NCCL/MPI-style code exists
anywhere in the framework.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import XEngineConfig
from ..ops import beamform as bf
from ..ops import corr_subsel as cs
from ..ops import correlate as corr
from ..ops import pfb as pfb_ops
from ..ops.correlate import Vis

shard_map = jax.shard_map


def _corr_gulp(cfg: XEngineConfig, packed) -> Vis:
    """Per-shard correlate honoring ``cfg.corr_engine`` — the Pallas
    triangular kernels run per chan-shard inside ``shard_map`` (each
    shard owns whole channels, so the per-channel math is identical to
    the unsharded engine: sharded outputs stay bit-exact against the
    same-engine unsharded step).  The result is mirrored dense so the
    downstream psum/subsel/dump logic is engine-agnostic."""
    if cfg.corr_engine in ("pallas_blk", "pallas_triu"):
        from ..ops.pallas.corr_triu import mirror_vis

        interp = jax.default_backend() == "cpu"
        if cfg.corr_engine == "pallas_blk":
            from ..ops.pallas.corr_blk import packed_corr_blk

            v = packed_corr_blk(packed, interpret=interp)
        else:
            from ..ops.pallas.corr_triu import packed_corr_triu

            v = packed_corr_triu(packed, interpret=interp)
        return mirror_vis(v)
    return corr.correlate_gulp(packed)


def _beam_products_shard(cfg: XEngineConfig, packed, gains_r, gains_i,
                         want_power: bool = True,
                         want_vlbi: bool = False):
    """Per-shard beam products honoring ``cfg.bf_engine``."""
    if cfg.bf_engine == "pallas":
        from ..ops.pallas.beamform_fused import (beamform_products_pallas,
                                                 stacked_gains)

        gstack = stacked_gains(bf.BeamGains(gains_r, gains_i),
                               packed.shape[2])
        return beamform_products_pallas(
            packed, gstack, cfg.ntime_sum, want_power, want_vlbi,
            interpret=jax.default_backend() == "cpu")
    beams = bf.beamform_gulp(packed, bf.BeamGains(gains_r, gains_i))
    power = bf.beam_power_sum(beams, cfg.ntime_sum) if want_power else None
    vlbi = (bf.vlbi_voltage_select(beams, nbeam_out=2)
            if want_vlbi else None)
    return power, vlbi


def _subsel_shard(cfg: XEngineConfig, vis: Vis, pairs) -> Vis:
    """Per-shard subselection honoring ``cfg.subsel_engine`` (each
    chan-shard owns whole channels and the full input axis, so the
    gather is shard-local and bit-exact vs the unsharded engine).
    Malformed runtime 'baselines' selections are clamped exactly as on
    the single-device path (models/xengine.py _subsel): the command key
    validates only the list length, not stand/pol ranges."""
    pairs = jnp.clip(pairs, 0, cfg.ninput - 1)
    return cs.corr_subsel_engine(vis, pairs, cfg.nchan_sum,
                                 cfg.subsel_engine,
                                 jax.default_backend() == "cpu")


def make_mesh(n_time: int = 1, n_chan: int | None = None,
              devices=None) -> Mesh:
    """Build a ('time', 'chan') mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_chan is None:
        if len(devices) % n_time:
            raise ValueError("device count not divisible by n_time")
        n_chan = len(devices) // n_time
    devices = devices[:n_time * n_chan]
    arr = np.array(devices).reshape(n_time, n_chan)
    return Mesh(arr, axis_names=("time", "chan"))


class FxOutputs(NamedTuple):
    vis: Vis             # int32 [nchan, ninput, ninput] (chan-sharded)
    subsel: Vis          # int32 [nchan // nchan_sum, nvis_out]
    bf_power: jax.Array  # f32 [nbeam//2, nblock_total, nchan, 4]
                         # (time- and chan-sharded)


def _pfb_with_halo(adc_local: jax.Array, window: jax.Array, nchan: int,
                   ntap: int, axis: str,
                   fft_impl: str = "fft") -> jax.Array:
    """Overlap-save PFB across time shards.

    Each shard prepends the (ntap-1) boundary frames of its left neighbor
    (``ppermute`` ring shift; shard 0 gets zeros), so every shard emits
    exactly ``T_local / (2*nchan)`` spectra and the concatenation equals the
    unsharded PFB of the full stream (modulo shard 0's zero-padded
    startup transient).
    """
    adc_ext = _halo_extend(adc_local, nchan, ntap, axis)
    return pfb_ops.pfb_channelize(adc_ext, window, nchan, ntap,
                                  fft_impl=fft_impl)


def _local_scale(scale, n_chan_shards: int, nchan: int):
    """Slice a per-channel [nchan] requant/EQ vector to this chan-shard's
    channels.  The fft-impl branches quantize AFTER the F->X corner-turn,
    where each shard holds only ``nchan / n_chan_shards`` channels — the
    tiled ``all_to_all`` gives shard *i* the *i*-th contiguous channel
    tile, so the matching slice of the full vector applies.  Scalars (and
    the unsharded case) pass through untouched."""
    if n_chan_shards <= 1 or getattr(scale, "ndim", 0) != 1:
        return scale
    loc = nchan // n_chan_shards
    ci = jax.lax.axis_index("chan")
    return jax.lax.dynamic_slice_in_dim(scale, ci * loc, loc)


def _halo_extend(adc_local: jax.Array, nchan: int, ntap: int,
                 axis: str) -> jax.Array:
    """Prepend the (ntap-1) boundary frames of the left time-shard
    (``ppermute`` ring shift; shard 0 gets zeros)."""
    halo_n = (ntap - 1) * 2 * nchan
    if halo_n == 0:
        return adc_local
    n_shard = jax.lax.axis_size(axis)
    tail = adc_local[-halo_n:]
    perm = [(i, (i + 1) % n_shard) for i in range(n_shard)]
    halo = jax.lax.ppermute(tail, axis, perm)
    # Shard 0 received shard N-1's tail (wrap-around); replace with zeros.
    is_first = jax.lax.axis_index(axis) == 0
    halo = jnp.where(is_first, jnp.zeros_like(halo), halo)
    return jnp.concatenate([halo, adc_local], axis=0)


def fx_sharded_fn(cfg: XEngineConfig, mesh: Mesh):
    """Build the sharded FX+B step over ``mesh``.

    Global shapes:
      adc:    f32/int8 [ntime_total, ninput] — sharded [time, chan(inputs)]
      window: f32 [ntap, 2*nchan]        — replicated
      gains:  BeamGains [nchan, nbeam, ninput] — chan-sharded
      pairs:  int32 [nvis_out, 2]        — replicated

    Per-shard flow: PFB (halo via ppermute along 'time') -> all_to_all
    corner-turn along 'chan' (input-sharded -> chan-sharded) -> 4-bit
    requant -> correlate (+psum over 'time') -> subsel; beamform + power
    integration stay time-sharded.
    """
    n_time = mesh.shape["time"]
    n_chan_shards = mesh.shape["chan"]
    if cfg.ninput % n_chan_shards or cfg.nchan % n_chan_shards:
        raise ValueError("ninput and nchan must divide the chan axis")
    if (cfg.nchan // n_chan_shards) % cfg.nchan_sum:
        raise ValueError("per-shard channel count must be a multiple of "
                         "nchan_sum (shard-local subsel channel averaging)")

    def corner_turn(x):
        # F->X corner-turn: split channels, gather inputs.
        if n_chan_shards > 1:
            return jax.lax.all_to_all(x, "chan", split_axis=1,
                                      concat_axis=2, tiled=True)
        return x

    def shard_fn(adc_local, window, gains_r, gains_i, pairs, quant_scale):
        # adc_local: [T_local, ninput / n_chan_shards]
        if cfg.pfb_fft_impl == "matmul":
            # complex-free path (AOT backends without complex HLO);
            # input-major planes [nin_local, nspec, chan] -> the F->X
            # corner-turn splits the chan axis and gathers inputs on
            # axis 0, then quantize transposes only the packed bytes
            adc_ext = _halo_extend(adc_local, cfg.nchan, cfg.pfb_ntap,
                                   "time")
            # quantize BEFORE the F->X corner-turn: the all_to_all
            # then moves packed 4+4-bit bytes — 8x less ICI traffic
            # than the f32 planes (quantization is per-(chan, input)
            # elementwise, so shard order does not change the values)
            pk = pfb_ops.channelize_pack_imajor(adc_ext, window, cfg,
                                                quant_scale)
            if n_chan_shards > 1:
                pk = jax.lax.all_to_all(pk, "chan", split_axis=2,
                                        concat_axis=0, tiled=True)
            packed = jnp.transpose(pk, (1, 2, 0))
        else:
            spec = _pfb_with_halo(adc_local, window, cfg.nchan,
                                  cfg.pfb_ntap, "time",
                                  fft_impl=cfg.pfb_fft_impl)
            spec = corner_turn(spec)
            packed = pfb_ops.quantize_4bit(
                spec, _local_scale(quant_scale, n_chan_shards, cfg.nchan))
        vis_part = _corr_gulp(cfg, packed)
        vis = Vis(jax.lax.psum(vis_part.real, "time"),
                  jax.lax.psum(vis_part.imag, "time"))
        subsel = _subsel_shard(cfg, vis, pairs)
        power, _ = _beam_products_shard(cfg, packed, gains_r, gains_i)
        return (vis.real, vis.imag, subsel.real, subsel.imag, power)

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("time", "chan"),       # adc
                  P(),                     # window
                  P("chan", None, None),   # gains planes (chan-sharded)
                  P("chan", None, None),
                  P(),                     # pairs
                  P()),                    # quant scale
        out_specs=(P("chan", None, None),  # vis planes (time-replicated)
                   P("chan", None, None),
                   P("chan", None),        # subsel planes
                   P("chan", None),
                   P(None, "time", "chan", None)),  # beam powers
        check_vma=False)

    def fn(adc, window, gains: bf.BeamGains, pairs, quant_scale):
        vr, vi, sr, si, power = mapped(adc, window, gains.real, gains.imag,
                                       pairs, quant_scale)
        return FxOutputs(Vis(vr, vi), Vis(sr, si), power)

    return fn


def xengine_sharded_fn(cfg: XEngineConfig, mesh: Mesh):
    """Channel-parallel fused X/B step for post-F packed input — the
    direct analog of the reference's share-nothing frequency sharding
    (plus a time axis contributing visibility partial sums via psum).

    Global shapes: packed uint8 [ntime, nchan, ninput] sharded
    [time, chan, -]; gains chan-sharded; outputs chan-sharded.
    """
    def shard_fn(packed, gains_r, gains_i, pairs):
        vis_part = _corr_gulp(cfg, packed)
        vis = Vis(jax.lax.psum(vis_part.real, "time"),
                  jax.lax.psum(vis_part.imag, "time"))
        subsel = _subsel_shard(cfg, vis, pairs)
        power, _ = _beam_products_shard(cfg, packed, gains_r, gains_i)
        return (vis.real, vis.imag, subsel.real, subsel.imag, power)

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("time", "chan", None),
                  P("chan", None, None), P("chan", None, None), P()),
        out_specs=(P("chan", None, None), P("chan", None, None),
                   P("chan", None), P("chan", None),
                   P(None, "time", "chan", None)),
        check_vma=False)

    def fn(packed, gains: bf.BeamGains, pairs):
        vr, vi, sr, si, power = mapped(packed, gains.real, gains.imag,
                                       pairs)
        return FxOutputs(Vis(vr, vi), Vis(sr, si), power)

    return fn


def _state_xb_tail(cfg, fr, fi, sr, si, packed, gains_r, gains_i,
                   pairs, n_chan_shards, fast_first, fast_last,
                   slow_first, want_power, want_vlbi,
                   want_subsel=True):
    """Shared per-shard tail of the stateful sharded steps.

    The fast accumulator is carried as *per-time-shard partial sums*
    (leading local time axis of size 1), so mid-window gulps touch **no
    collective at all** for the visibilities: the ``psum`` over the
    'time' axis happens once per fast window, at the dump gulp —
    ``acc_len/ntime_gulp``x less ICI traffic than reducing every gulp
    (the dominant collective at production shape; see SCALING.md).
    Subselection likewise only exists at the dump (the reference's
    CorrSubsel consumes Corr *dumps*, corr_subsel_block.py:298), and the
    slow accumulator — updated from the psum'd full window — stays
    identical on every time shard.
    """
    vis_part = _corr_gulp(cfg, packed)
    part = vis_part if fast_first else Vis(fr[0] + vis_part.real,
                                           fi[0] + vis_part.imag)
    out = [part.real[None], part.imag[None]]
    if fast_last:
        vis = Vis(jax.lax.psum(part.real, "time"),
                  jax.lax.psum(part.imag, "time"))
        slow = vis if slow_first else Vis(sr + vis.real, si + vis.imag)
        out += [slow.real, slow.imag, vis.real, vis.imag]
        if want_subsel:
            subsel = _subsel_shard(cfg, vis, pairs)
            out += [subsel.real, subsel.imag]
    else:
        out += [sr, si]
    if want_power or want_vlbi:
        power, vlbi_local = _beam_products_shard(
            cfg, packed, gains_r, gains_i, want_power, want_vlbi)
        if want_power:
            out.append(power)
        if want_vlbi:
            # VLBI beam-0 voltages need every channel: gather the small
            # [t_local, c_local, 2, 2] slab over 'chan'
            if n_chan_shards > 1:
                vlbi_local = jax.lax.all_gather(vlbi_local, "chan",
                                                axis=1, tiled=True)
            out.append(vlbi_local)
    return tuple(out)


def _state_out_specs(fast_last, want_power, want_vlbi,
                     want_subsel=True):
    vis_spec = P("chan", None, None)
    part_spec = P("time", "chan", None, None)
    out_specs = [part_spec, part_spec, vis_spec, vis_spec]
    if fast_last:
        out_specs += [vis_spec, vis_spec]
        if want_subsel:
            out_specs += [P("chan", None), P("chan", None)]
    if want_power:
        out_specs.append(P(None, "time", "chan", None))
    if want_vlbi:
        out_specs.append(P("time", None, None, None))
    return tuple(out_specs)


def _state_unpack(res, fast_last, want_power, want_vlbi,
                  want_subsel=True):
    fr, fi, sr, si = res[:4]
    rest = list(res[4:])
    if fast_last:
        vr, vi = rest[:2]
        rest = rest[2:]
        vis = Vis(vr, vi)
        if want_subsel:
            subsel = Vis(rest[0], rest[1])
            rest = rest[2:]
        else:
            subsel = None
    else:
        vis = subsel = None
    power = rest.pop(0) if want_power else None
    vlbi = rest.pop(0) if want_vlbi else None
    return ((Vis(fr, fi), Vis(sr, si)),
            FxOutputs(vis, subsel, power), vlbi)


def zero_sharded_state(cfg: XEngineConfig, mesh: Mesh):
    """Initial accumulator state for the stateful sharded steps: fast
    per-time-shard partials [n_time, nchan, ninput, ninput] plus the
    replicated slow planes [nchan, ninput, ninput]."""
    n_time = mesh.shape["time"]
    # four DISTINCT buffers: zero_vis aliases real/imag, which trips
    # "donate the same buffer twice" when the state is donated
    fast = Vis(jnp.zeros((n_time, cfg.nchan, cfg.ninput, cfg.ninput),
                         jnp.int32),
               jnp.zeros((n_time, cfg.nchan, cfg.ninput, cfg.ninput),
                         jnp.int32))
    slow = Vis(jnp.zeros((cfg.nchan, cfg.ninput, cfg.ninput), jnp.int32),
               jnp.zeros((cfg.nchan, cfg.ninput, cfg.ninput), jnp.int32))
    return (fast, slow)


def xengine_sharded_state_fn(cfg: XEngineConfig, mesh: Mesh,
                             fast_first: bool, fast_last: bool,
                             slow_first: bool, want_power: bool = True,
                             want_vlbi: bool = True,
                             want_subsel: bool = True):
    """Stateful sharded fused step: the multi-chip analog of
    ``models.xengine.xengine_step``.

    Accumulator state lives on the mesh and never moves: the fast
    accumulator as per-time-shard partials [n_time, nchan, ninput,
    ninput] (``zero_sharded_state``), the slow planes chan-sharded and
    time-replicated.  Mid-window gulps are collective-free for the
    visibilities; the 'time'-axis ``psum`` fires once per fast window at
    the dump gulp.  Boundary flags are baked per-variant (the host
    driver selects the jitted variant, exactly like the single-chip
    static-flag specialization).

    Global shapes: packed [ntime, nchan, ninput] ([time, chan]-sharded);
    gains chan-sharded; outputs as in FxOutputs (vis/subsel present only
    on dump variants) plus the new state.
    """
    n_chan_shards = mesh.shape["chan"]

    def shard_fn(fr, fi, sr, si, packed, gains_r, gains_i, pairs):
        return _state_xb_tail(cfg, fr, fi, sr, si, packed, gains_r,
                              gains_i, pairs, n_chan_shards, fast_first,
                              fast_last, slow_first, want_power,
                              want_vlbi, want_subsel)

    vis_spec = P("chan", None, None)
    part_spec = P("time", "chan", None, None)
    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(part_spec, part_spec, vis_spec, vis_spec,
                  P("time", "chan", None),
                  P("chan", None, None), P("chan", None, None), P()),
        out_specs=_state_out_specs(fast_last, want_power, want_vlbi,
                                   want_subsel),
        check_vma=False)

    def fn(state, packed, gains: bf.BeamGains, pairs):
        res = mapped(
            state[0].real, state[0].imag, state[1].real, state[1].imag,
            packed, gains.real, gains.imag, pairs)
        return _state_unpack(res, fast_last, want_power, want_vlbi,
                             want_subsel)

    return fn


def fx_sharded_state_fn(cfg: XEngineConfig, mesh: Mesh,
                        fast_first: bool, fast_last: bool,
                        slow_first: bool, want_power: bool = True,
                        want_vlbi: bool = True,
                        want_subsel: bool = True):
    """Stateful sharded FX step: the streaming-driver analog of
    :func:`fx_sharded_fn` — PFB with on-mesh halo exchange, F->X
    corner-turn, requant, then the accumulating X/B step of
    :func:`xengine_sharded_state_fn`.

    The only host-side carry is the previous block's trailing
    ``(ntap-1)*2*nchan`` ADC samples (``carry_tail``), which time-shard 0
    prepends in place of the zero halo so block boundaries are seamless —
    exactly the single-device driver's ``_adc_tail`` carry.  Interior
    shard boundaries exchange their halo with ``ppermute`` on the mesh.

    Global shapes:
      state planes: int32 [nchan, ninput, ninput] (chan-sharded)
      adc:        f32/int8 [T, ninput]       — sharded [time, chan(inputs)]
      carry_tail: adc dtype [(ntap-1)*2*nchan, ninput] — input-sharded on 'chan'
      window:     f32 [ntap, 2*nchan]        — replicated
      gains:      BeamGains [nchan, nbeam, ninput] — chan-sharded
      pairs:      int32 [nvis_out, 2]        — replicated
      quant_scale: f32 scalar                — replicated
    """
    n_time = mesh.shape["time"]
    n_chan_shards = mesh.shape["chan"]
    if cfg.ninput % n_chan_shards or cfg.nchan % n_chan_shards:
        raise ValueError("ninput and nchan must divide the chan axis")
    if (cfg.nchan // n_chan_shards) % cfg.nchan_sum:
        raise ValueError("per-shard channel count must be a multiple of "
                         "nchan_sum")
    L = 2 * cfg.nchan
    halo_n = (cfg.pfb_ntap - 1) * L

    def corner_turn(x):
        if n_chan_shards > 1:
            return jax.lax.all_to_all(x, "chan", split_axis=1,
                                      concat_axis=2, tiled=True)
        return x

    def shard_fn(fr, fi, sr, si, adc_local, carry_local, window,
                 gains_r, gains_i, pairs, quant_scale):
        # halo: interior shards take the left neighbor's tail; time-shard
        # 0 takes the host carry from the previous block
        if halo_n and n_time > 1:
            tail = adc_local[-halo_n:]
            perm = [(i, (i + 1) % n_time) for i in range(n_time)]
            halo = jax.lax.ppermute(tail, "time", perm)
            is_first = jax.lax.axis_index("time") == 0
            halo = jnp.where(is_first, carry_local, halo)
            adc_ext = jnp.concatenate([halo, adc_local], axis=0)
        else:
            adc_ext = jnp.concatenate([carry_local, adc_local], axis=0)
        if cfg.pfb_fft_impl == "matmul":
            # quantize BEFORE the F->X corner-turn: the all_to_all
            # then moves packed 4+4-bit bytes — 8x less ICI traffic
            # than the f32 planes (quantization is per-(chan, input)
            # elementwise, so shard order does not change the values)
            pk = pfb_ops.channelize_pack_imajor(adc_ext, window, cfg,
                                                quant_scale)
            if n_chan_shards > 1:
                pk = jax.lax.all_to_all(pk, "chan", split_axis=2,
                                        concat_axis=0, tiled=True)
            packed = jnp.transpose(pk, (1, 2, 0))
        else:
            spec = pfb_ops.pfb_channelize(adc_ext, window, cfg.nchan,
                                          cfg.pfb_ntap,
                                          fft_impl=cfg.pfb_fft_impl)
            spec = corner_turn(spec)
            packed = pfb_ops.quantize_4bit(
                spec, _local_scale(quant_scale, n_chan_shards, cfg.nchan))
        return _state_xb_tail(cfg, fr, fi, sr, si, packed, gains_r,
                              gains_i, pairs, n_chan_shards, fast_first,
                              fast_last, slow_first, want_power,
                              want_vlbi, want_subsel)

    vis_spec = P("chan", None, None)
    part_spec = P("time", "chan", None, None)
    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(part_spec, part_spec, vis_spec, vis_spec,
                  P("time", "chan"),       # adc
                  P(None, "chan"),         # carry tail (input-sharded)
                  P(),                     # window
                  P("chan", None, None), P("chan", None, None),
                  P(), P()),
        out_specs=_state_out_specs(fast_last, want_power, want_vlbi,
                                   want_subsel),
        check_vma=False)

    def fn(state, adc, carry_tail, window, quant_scale,
           gains: bf.BeamGains, pairs):
        res = mapped(
            state[0].real, state[0].imag, state[1].real, state[1].imag,
            adc, carry_tail, window, gains.real, gains.imag, pairs,
            quant_scale)
        return _state_unpack(res, fast_last, want_power, want_vlbi,
                             want_subsel)

    return fn


def make_stand_mesh(n_stand: int, devices=None) -> Mesh:
    """1-D ('stand',) mesh for the antenna-sharded correlator."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices[:n_stand]), axis_names=("stand",))


def corr_stand_sharded_fn(cfg: XEngineConfig, mesh: Mesh):
    """Antenna-sharded correlation (the tensor-parallel analog).

    Each device owns a contiguous slice of correlator inputs.  Computing
    its rows of the visibility matrix needs every column, so the packed
    voltages are ``all_gather``-ed over the 'stand' axis (SURVEY.md
    section 2.3: "psum/all-gather for baseline partials when antennas are
    sharded" — a collective the reference's share-nothing design never
    required).  Output rows stay sharded: global [nchan, ninput, ninput]
    with axis 1 on 'stand'.

    Row blocks scale as 1/N while the gathered operand is all-to-one, so
    this axis suits memory-limited scaling of the ninput^2 accumulators.
    """
    n_shards = mesh.shape["stand"]
    if cfg.ninput % n_shards:
        raise ValueError("ninput must divide the stand axis")

    def shard_fn(packed_local):
        # packed_local: uint8 [ntime, nchan, ninput / n]
        x_all = jax.lax.all_gather(packed_local, "stand", axis=2,
                                   tiled=True)  # [t, c, ninput]
        from ..utils.codec import unpack_jnp

        lr, li = unpack_jnp(packed_local)
        ar, ai = unpack_jnp(x_all)
        dn = (((0,), (0,)), ((1,), (1,)))

        def xc(a, b):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        vr = (xc(lr, ar) + xc(li, ai)).astype(jnp.int32)
        vi = (xc(li, ar) - xc(lr, ai)).astype(jnp.int32)
        return vr, vi  # [nchan, ninput/n, ninput]

    mapped = shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(None, None, "stand"),),
                       out_specs=(P(None, "stand", None),
                                  P(None, "stand", None)),
                       check_vma=False)

    def fn(packed):
        vr, vi = mapped(packed)
        return Vis(vr, vi)

    return fn


def collective_volumes(cfg: XEngineConfig, n_time: int, n_chan: int,
                       gulp_spectra: int | None = None,
                       window_spectra: int | None = None,
                       want_vlbi: bool = True) -> dict:
    """Analytic per-collective traffic accounting for the sharded FX
    step (:func:`fx_sharded_state_fn`) at a given mesh shape.

    Counts bytes that actually cross a device boundary (ICI on a TPU
    slice; DCN if the axis spans hosts) per *gulp* (one step call) and
    per *fast window* (``acc_len`` spectra = ``acc_len/ntime_gulp``
    calls), plus the per-device send rate required to run in real time
    (window period = ``acc_len / spectra_rate``).

    Formulas (D = n_time*n_chan devices, L = 2*nchan frame,
    h = ntap-1 halo frames, G = gulp spectra, G_loc = G/n_time,
    nin_loc = ninput/n_chan, nchan_loc = nchan/n_chan):

    - ``ppermute`` halo ('time' axis): every device sends its trailing
      h*L x nin_loc ADC samples (``cfg.adc_dtype`` wide — int8 is 4x
      cheaper than f32) once per gulp.
    - ``all_to_all`` F->X corner-turn ('chan' axis): each device's
      packed 4+4-bit slab [nin_loc, G_loc, nchan] moves
      (n_chan-1)/n_chan of itself off-device (the quantize-first design
      makes this 8x cheaper than corner-turning f32 spectra).
    - ``psum`` visibilities ('time' axis): ring all-reduce of the two
      int32 planes [nchan_loc, ninput, ninput] sends
      2*(n_time-1)/n_time of the operand per device — once per FAST
      WINDOW, not per gulp: mid-window gulps accumulate per-time-shard
      partials with no collective (``_state_xb_tail``).
    - ``all_gather`` VLBI voltages ('chan' axis): each device sends its
      [G_loc, nchan_loc, 2, 2] f32 shard to the other n_chan-1 ranks.
    """
    gulp = gulp_spectra or cfg.ntime_gulp
    window = window_spectra or cfg.acc_len
    D = n_time * n_chan
    L = 2 * cfg.nchan
    h = cfg.pfb_ntap - 1
    nin_loc = cfg.ninput // n_chan
    nchan_loc = cfg.nchan // n_chan
    g_loc = gulp // n_time
    gulps_per_window = window // gulp
    window_s = window / cfg.chan_bw_hz  # spectra rate = chan_bw (fs/8192)

    def entry(name, axis, active, bytes_sent_per_dev, period_gulps=1):
        per_dev = int(bytes_sent_per_dev) if active else 0
        fires_per_window = gulps_per_window // period_gulps
        return {
            "collective": name, "mesh_axis": axis,
            "per_device_bytes_per_fire": per_dev,
            "fires_per_window": fires_per_window,
            "total_bytes_per_window": per_dev * D * fires_per_window,
            "per_device_gbps_realtime":
                per_dev * fires_per_window * 8 / window_s / 1e9,
        }

    vis_plane_dev = 2 * nchan_loc * cfg.ninput * cfg.ninput * 4
    vols = [
        entry("ppermute_halo", "time", n_time > 1 and h > 0,
              h * L * nin_loc * cfg.adc_np_dtype.itemsize),
        entry("all_to_all_corner_turn", "chan", n_chan > 1,
              nin_loc * g_loc * cfg.nchan * (n_chan - 1) / n_chan),
        # per-time-shard partial accumulation: the vis all-reduce fires
        # once per fast window (the dump gulp), not per gulp
        entry("psum_visibilities", "time", n_time > 1,
              vis_plane_dev * 2 * (n_time - 1) / n_time,
              period_gulps=gulps_per_window),
        entry("all_gather_vlbi", "chan", want_vlbi and n_chan > 1,
              g_loc * nchan_loc * 2 * 2 * 4 * (n_chan - 1)),
    ]
    total_dev_gbps = sum(v["per_device_gbps_realtime"] for v in vols)
    return {"mesh": {"time": n_time, "chan": n_chan, "devices": D},
            "gulp_spectra": gulp, "window_spectra": window,
            "window_seconds": window_s,
            "collectives": vols,
            "per_device_gbps_realtime_total": total_dev_gbps}


def fx_reference_unsharded(cfg: XEngineConfig, adc, window, gains, pairs,
                           quant_scale, n_time_shards: int = 1):
    """Single-device reference of the sharded program, reproducing the
    shard-0 zero-halo startup transient per time shard (for equality
    tests)."""
    ntime = adc.shape[0]
    t_local = ntime // n_time_shards
    specs = []
    L = 2 * cfg.nchan
    halo_n = (cfg.pfb_ntap - 1) * L
    for s in range(n_time_shards):
        lo = s * t_local
        chunk = adc[lo:lo + t_local]
        halo = (jnp.zeros((halo_n,) + adc.shape[1:], adc.dtype)
                if s == 0 else adc[lo - halo_n:lo])
        ext = jnp.concatenate([halo, chunk], axis=0)
        specs.append(pfb_ops.pfb_channelize(ext, window, cfg.nchan,
                                            cfg.pfb_ntap,
                                            fft_impl=cfg.pfb_fft_impl))
    spec = jnp.concatenate(specs, axis=0)
    packed = pfb_ops.quantize_4bit(spec, quant_scale)
    vis = corr.correlate_gulp(packed)
    subsel = cs.corr_subsel(vis, pairs, cfg.nchan_sum)
    beams = bf.beamform_gulp(packed, gains)
    power = bf.beam_power_sum(beams, cfg.ntime_sum)
    return FxOutputs(vis, subsel, power)
