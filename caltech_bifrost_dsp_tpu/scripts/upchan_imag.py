"""Offline upchannelizing imaging-correlator CLI.

Analog of reference: pipeline/scripts/lwa352-upchan-imag.py — replays a
triggered-dump file, upchannelizes, selects a fine-channel range,
integrates visibilities and writes them to HDF5.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io.hdf5 import VisibilityHDF5Writer
from ..io.source import TriggerFileSource
from ..models import offline


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Offline upchannelize + correlate",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--datain", required=True)
    p.add_argument("--output", default="corr_out.h5")
    p.add_argument("--nupchan", type=int, default=2)
    p.add_argument("--gulp", type=int, default=480)
    p.add_argument("--start-freq", type=int, default=0)
    p.add_argument("--end-freq", type=int, default=192)
    p.add_argument("--nframe-per-integration", type=int, default=120000)
    args = p.parse_args(argv)

    src = TriggerFileSource(args.datain)
    hdr, data = src.read()
    nstand = hdr["nstand"]
    npol = hdr.get("npol", 2)
    packed = data.reshape(hdr["ntime"], hdr["nchan"], nstand, npol)
    out = offline.upchan_imaging_run(
        packed, nupchan=args.nupchan,
        chan_range=(args.start_freq, args.end_freq),
        nframe_per_integration=args.nframe_per_integration,
        gulp_ntime=args.gulp)
    chan_bw = hdr.get("bw_hz", 1.0) / max(hdr["nchan"], 1)
    fine_bw = chan_bw / args.nupchan
    freqs = (hdr.get("sfreq", 0.0)
             + np.arange(args.start_freq, args.end_freq) * fine_bw)
    w = VisibilityHDF5Writer(args.output, freqs_hz=freqs,
                             ninput=nstand * npol)
    for i, vis in enumerate(out):
        w.append(vis.astype(np.complex64), float(i))
    w.close()
    print(f"wrote {args.output} ({len(out)} integrations, "
          f"{args.end_freq - args.start_freq} fine channels)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
