"""Pallas TPU kernel: fused unpack + beamform + power/VLBI products.

The XLA beamform path (ops/beamform.py) materializes f32 voltage planes
for the whole gulp in HBM (~2.6 GB written + re-read per window at the
production shape) before the power integration reduces them 24-fold;
measured 3.8 ms — its own HBM roofline.  This kernel computes the beam
products without ever writing the voltages to HBM:

- gains are pre-split into a bf16 hi+lo pair (the 4-bit voltages are
  exact in bf16, so the product carries ~2^-16 relative error — two
  orders inside the reference's rtol=1e-4 gate,
  reference: tests/beamformer/beamformer_test.py:106-109) and stacked
  with the imaginary planes into ONE [4*nbeam, ninput] operand, so each
  (chan, time-tile) instance runs just TWO wide MXU contractions
  (against the unpacked re/im voltage planes) instead of 12 narrow
  passes;
- beams are pre-permuted so X-pol rows precede Y-pol rows
  (contiguous row slices replace Mosaic-rejected strided ones); the
  X/Y pairing convention is the reference's (2b, 2b+1)
  (reference: blocks/beamform_sum_beams_block.py docstring);
- the ``ntime_sum`` power integration (trans_output_and_sum,
  reference: pipeline/bf_src/cublas_beamform.cu:46-79) is a matmul
  against a 0/1 segment matrix — no in-kernel reshapes — so the beam
  voltages never leave VMEM; each (chan, time-tile) instance writes
  only its ntime_sum-reduced power block (and the tiny VLBI slice),
  24x less HBM traffic than the XLA path's full voltage planes;
- the VLBI voltage downselect (beam-0 dual-pol pair,
  reference: blocks/beamform_vlbi_output_block.py:260-264) rides the
  same pass.

Outputs match :func:`..beamform.beam_power_sum` /
:func:`..beamform.vlbi_voltage_select` layouts after two tiny XLA
transposes (a few MB, vs the gigabytes this kernel avoids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..beamform import BeamGains


def _choose_tile(ntime: int, ntime_sum: int, cap: int = 1200) -> int:
    """Largest time tile <= cap dividing ntime, multiple of ntime_sum
    (power-block aligned) and of 8 (f32 sublanes)."""
    step = ntime_sum
    while step % 8:
        step += ntime_sum
    best = 0
    t = step
    while t <= min(cap, ntime):
        if ntime % t == 0:
            best = t
        t += step
    return best


def stacked_gains(gains: BeamGains, ninput_padded: int) -> jax.Array:
    """bf16 [nchan, 4*nbeam, ninput_padded] kernel operand.

    Row groups: [re_hi | re_lo | im_hi | im_lo], each group's rows in
    X-pol-beams-then-Y-pol-beams order.  jnp-traced (safe inside jit;
    XLA folds it when gains are constant across calls).
    """
    def permute_pad(g):
        g = jnp.concatenate([g[:, 0::2], g[:, 1::2]], axis=1)
        pad = ninput_padded - g.shape[2]
        if pad:
            g = jnp.pad(g, ((0, 0), (0, 0), (0, pad)))
        return g

    gr = permute_pad(gains.real)
    gi = permute_pad(gains.imag)

    def split(g):
        hi = g.astype(jnp.bfloat16)
        lo = (g - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    gr_hi, gr_lo = split(gr)
    gi_hi, gi_lo = split(gi)
    return jnp.concatenate([gr_hi, gr_lo, gi_hi, gi_lo], axis=1)


def _make_kernel(nbeam: int, ntime_sum: int, ts: int,
                 want_power: bool, want_vlbi: bool):
    from jax.experimental import pallas as pl

    nb2 = nbeam // 2
    ntb = ts // ntime_sum

    def kernel(x_ref, g_ref, seg_ref, *rest):
        it = iter(rest)
        pw_ref = next(it) if want_power else None
        vl_ref = next(it) if want_vlbi else None

        x32 = x_ref[0].astype(jnp.int32)            # [ts, NI]
        xr = (((x32 >> 4) ^ 8) - 8).astype(jnp.bfloat16)
        xi = (((x32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
        g = g_ref[0]                                # [4nb, NI] bf16
        dn = (((1,), (1,)), ((), ()))

        def dot(a, b, dnn=dn):
            return jax.lax.dot_general(a, b, dimension_numbers=dnn,
                                       preferred_element_type=jnp.float32)

        p = dot(g, xr)                              # [4nb, ts] f32
        q = dot(g, xi)

        def comb(m):
            return (m[0 * nbeam:1 * nbeam] + m[1 * nbeam:2 * nbeam],
                    m[2 * nbeam:3 * nbeam] + m[3 * nbeam:4 * nbeam])

        pr, pi_ = comb(p)      # gr@xr, gi@xr
        qr, qi_ = comb(q)      # gr@xi, gi@xi
        br = pr - qi_          # [nb, ts] beam voltages (X rows | Y rows)
        bi = qr + pi_

        if want_vlbi:
            # single-pol beams 0 (X row 0) and 1 (Y row 0):
            # rows [re0, im0, re1, im1] so the [t, c, 2, 2] reshape
            # lands (beam, re/im) in the reference order
            vl = jnp.concatenate([br[0:1], bi[0:1],
                                  br[nb2:nb2 + 1], bi[nb2:nb2 + 1]],
                                 axis=0)            # [4, ts]
            vl_ref[0, 0] = vl

        if want_power:
            xr_b, yr_b = br[:nb2], br[nb2:]
            xi_b, yi_b = bi[:nb2], bi[nb2:]
            xx = xr_b * xr_b + xi_b * xi_b          # [nb2, ts]
            yy = yr_b * yr_b + yi_b * yi_b
            xyr = xr_b * yr_b + xi_b * yi_b
            xyi = xi_b * yr_b - xr_b * yi_b
            comp = jnp.concatenate([xx, yy, xyr, xyi], axis=0)
            # ntime_sum integration as a [4nb2, ts] x [ts, ntb] matmul.
            # HIGHEST precision is REQUIRED here: Mosaic's DEFAULT
            # rounds f32 MXU operands to one bf16 pass, and comp's
            # |v|^2 values reach ~2^35 at production scale, so a bf16
            # seg pass loses ~2^-9 relative per element — measured
            # rel err up to ~3 vs the float64 truth where the XY cross
            # terms cancel (caught ON CHIP by scripts/tpu_parity.py;
            # interpret mode computes exact f32 and hid it).  The
            # voltage dots above are unaffected (bf16 inputs, exact).
            seg = jax.lax.dot_general(
                comp, seg_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [4nb2, ntb]
            pw_ref[0, 0] = seg

    return kernel


@functools.partial(jax.jit, static_argnames=("ntime_sum", "want_power",
                                             "want_vlbi", "ts_cap",
                                             "layout", "interpret"))
def beamform_products_pallas(packed: jax.Array, gstack: jax.Array,
                             ntime_sum: int, want_power: bool = True,
                             want_vlbi: bool = True, ts_cap: int = 1200,
                             layout: str = "tci",
                             interpret: bool = False):
    """Fused beam products for one gulp.

    Args:
      packed: uint8 [ntime, nchan, ninput] (``layout="tci"``) or
        [nchan, ntime, ninput|gstack-width] (``layout="cti"`` — the
        TPU-native staging order; skips the ~2.3 ms XLA pad+transpose
        prologue, 3.55 -> 0.84 ms measured at production shape.  Pad
        lanes beyond ninput may hold garbage: their gain rows are zero
        in ``gstack`` so they cannot reach the beam sums).
      gstack: bf16 [nchan, 4*nbeam, ninput_padded] from
        :func:`stacked_gains`.
      ntime_sum: power integration length (BEAM_TIME_SUM=24,
        reference: lwa352-pipeline.py:174).

    Returns:
      (power, vlbi):
        power f32 [nbeam//2, ntime//ntime_sum, nchan, 4] or None,
        vlbi  f32 [ntime, nchan, 2, 2] or None.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ni = gstack.shape[2]
    nbeam = gstack.shape[1] // 4
    if not (want_power or want_vlbi):
        return None, None
    if layout == "cti":
        nchan, ntime, ninput = packed.shape
        if ninput > ni:
            raise ValueError("gstack narrower than the input count")
        if ninput != ni:
            packed = jnp.pad(packed, ((0, 0), (0, 0), (0, ni - ninput)))
        packed_cm = packed
    elif layout == "tci":
        ntime, nchan, ninput = packed.shape
        if ni < ninput:
            raise ValueError("gstack narrower than the input count")
        if ninput != ni:
            packed = jnp.pad(packed, ((0, 0), (0, 0), (0, ni - ninput)))
        packed_cm = jnp.transpose(packed, (1, 0, 2))
    else:
        raise ValueError(f"unknown layout {layout!r}")
    ts = _choose_tile(ntime, ntime_sum, cap=ts_cap)
    if not ts:
        raise ValueError(f"no time tile for ntime={ntime}, "
                         f"ntime_sum={ntime_sum}")
    n_t = ntime // ts
    ntb_total = ntime // ntime_sum
    nb2 = nbeam // 2

    seg_np = np.zeros((ts, ts // ntime_sum), np.float32)
    for k in range(ts // ntime_sum):
        seg_np[k * ntime_sum:(k + 1) * ntime_sum, k] = 1.0
    seg = jnp.asarray(seg_np)

    kernel = _make_kernel(nbeam, ntime_sum, ts, want_power,
                          want_vlbi)
    in_specs = [
        pl.BlockSpec((1, ts, ni), lambda c, t: (c, t, 0)),
        pl.BlockSpec((1, 4 * nbeam, ni), lambda c, t: (c, 0, 0)),
        pl.BlockSpec((ts, ts // ntime_sum), lambda c, t: (0, 0)),
    ]
    out_specs = []
    out_shape = []
    ntb = ts // ntime_sum
    if want_power:
        out_specs.append(pl.BlockSpec((1, 1, 4 * nb2, ntb),
                                      lambda c, t: (c, t, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct(
            (nchan, n_t, 4 * nb2, ntb), jnp.float32))
    if want_vlbi:
        out_specs.append(pl.BlockSpec((1, 1, 4, ts),
                                      lambda c, t: (c, t, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((nchan, n_t, 4, ts),
                                              jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(nchan, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nchan * ntime * 4 * nbeam * ni,
            bytes_accessed=nchan * ntime * ni
            + 2 * nchan * 4 * nbeam * ni,
            transcendentals=0),
    )(packed_cm, gstack, seg)
    outs = list(outs) if isinstance(outs, (list, tuple)) else [outs]
    power = vlbi = None
    if want_power:
        pw = outs.pop(0)                   # [c, n_t, 4*nb2, ntb]
        pw = pw.reshape(nchan, n_t, 4, nb2, ntb)
        pw = jnp.transpose(pw, (3, 1, 4, 0, 2))  # [nb2, n_t, ntb, c, 4]
        power = pw.reshape(nb2, ntb_total, nchan, 4)
    if want_vlbi:
        vl = outs.pop(0)                   # [c, n_t, 4, ts]
        vl = jnp.transpose(vl, (1, 3, 0, 2))     # [n_t, ts, c, 4]
        vlbi = vl.reshape(ntime, nchan, 2, 2)
    return power, vlbi
