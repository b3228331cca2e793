"""Offline upchannelizing beamformer CLI.

Analog of reference: pipeline/scripts/lwa352-upchan-bf.py — replays a
triggered-dump file, upchannelizes 32x, points beams at RA/Dec targets
with geometric + calibration weights, reduces over antennas/pols and
writes accumulated beam powers (or voltages) to HDF5.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io.hdf5 import (AccumBeamHDF5Writer, BeamHDF5Writer,
                       FullObservationHDF5Writer)
from ..io.source import TriggerFileSource
from ..models import offline


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Offline upchannelize + beamform",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--datain", required=True,
                   help="triggered-dump .tbf file to replay")
    p.add_argument("--output", default="output.h5")
    p.add_argument("--ra-array", default="0.0",
                   help="comma-separated beam RAs (deg)")
    p.add_argument("--dec-array", default="37.0",
                   help="comma-separated beam Decs (deg)")
    p.add_argument("--nupchan", type=int, default=32)
    p.add_argument("--gulp", type=int, default=480)
    p.add_argument("--cal-file", default=None,
                   help=".npy complex cal gains [nchan_fine, ninput]")
    p.add_argument("--enz-file", default=None,
                   help=".npy [nstand, 3] antenna ENZ positions (m); "
                        "default: a pseudo-random compact layout")
    p.add_argument("--accumulate", action="store_true", default=True)
    p.add_argument("--voltages", dest="accumulate", action="store_false")
    p.add_argument("--full-obs", action="store_true",
                   help="write into a preallocated whole-observation "
                        "file (HDF5FullSaveBlock analog; --output is "
                        "then the path PREFIX, RA/Dec are appended)")
    p.add_argument("--obs-nsamples", type=int, default=0,
                   help="total time samples to preallocate with "
                        "--full-obs (default: this run's length)")
    args = p.parse_args(argv)

    src = TriggerFileSource(args.datain)
    hdr, data = src.read()
    nstand = hdr["nstand"]
    npol = hdr.get("npol", 2)
    packed = data.reshape(hdr["ntime"], hdr["nchan"], nstand, npol)
    ra = [float(x) for x in args.ra_array.split(",")]
    dec = [float(x) for x in args.dec_array.split(",")]
    if args.enz_file:
        enz = np.load(args.enz_file)
    else:
        enz = np.random.RandomState(0).standard_normal([nstand, 3]) * 100
    cal = np.load(args.cal_file) if args.cal_file else None
    cfg = offline.OfflineBeamConfig(
        nbeam=len(ra), ra_deg=ra, dec_deg=dec, enz_positions=enz,
        nupchan=args.nupchan, cal_gains=cal)
    sfreq = hdr.get("sfreq", 0.0)
    chan_bw = hdr.get("bw_hz", 1.0) / max(hdr["nchan"], 1)
    t_unix = hdr.get("sync_time", 0.0)
    freqs, outs = offline.upchan_beamform_run(
        packed, cfg, sfreq, chan_bw, t_unix=t_unix,
        gulp_ntime=args.gulp, accumulate=args.accumulate)
    # each output row accumulates one gulp of coarse spectra; the coarse
    # spectrum period is 1/chan_bw, so the real row cadence is
    # gulp/chan_bw seconds — NOT 1 s (timestamps and tInt-style attrs
    # must reflect the actual accumulation span)
    tstep_s = args.gulp / chan_bw if chan_bw > 0 else 1.0
    if args.full_obs:
        if len(ra) > 1:
            raise SystemExit(
                "--full-obs writes the reference's single-beam "
                "observation file (HDF5FullSaveBlock assumes nbeam=1); "
                "pass one RA/Dec, or drop --full-obs for the per-beam "
                "dynamic writer")
        fstep = chan_bw / args.nupchan
        w = FullObservationHDF5Writer(
            args.output.removesuffix(".h5").removesuffix(".hdf5"),
            ra=ra[0], dec=dec[0], tstart_unix=t_unix, tstep_s=tstep_s,
            total_nsamples=args.obs_nsamples or len(outs),
            sfreq_hz=float(freqs[0]), fstep_hz=fstep,
            total_nfreq=len(freqs))
        for i, powers in enumerate(outs):
            # beam 0 intensity row per accumulated spectrum
            w.write(powers[:1].astype(np.float32), t_unix + i * tstep_s,
                    float(freqs[0]))
        w.close()
        print(f"wrote {w.filename} ({len(outs)} rows, "
              f"{len(freqs)} fine channels)")
        return 0
    if args.accumulate:
        w = AccumBeamHDF5Writer(args.output, nbeam=len(ra), freqs_hz=freqs)
        for i, powers in enumerate(outs):
            w.append(powers.astype(np.float32), t_unix + i * tstep_s)
        w.close()
    else:
        w = BeamHDF5Writer(args.output, nbeam=len(ra), freqs_hz=freqs)
        for beams in outs:
            w.append(beams.transpose(0, 1, 2))
        w.close()
    print(f"wrote {args.output} ({len(outs)} gulps, {len(ra)} beams, "
          f"{len(freqs)} fine channels)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
