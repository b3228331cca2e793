"""Arm the correlator across pipelines (CLI).

Analog of reference: pipeline-control/scripts/lwa352_arm_correlator.py —
configures output destination/throttle and performs the two-phase arm.
"""

from __future__ import annotations

import argparse
import sys

from ..control.client import (CorrControlClient, CorrelatorControl,
                              PipelineControl)
from ..control.store import connect


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Arm the TPU X-engine correlator",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--etcdhost", type=str, default=None)
    p.add_argument("--hosts", type=str, default="localhost",
                   help="comma-separated pipeline hosts")
    p.add_argument("--pipelines", type=int, default=1,
                   help="pipelines per host")
    p.add_argument("-d", "--delay", type=float, default=5.0,
                   help="seconds in the future to start")
    p.add_argument("-a", "--acc_len", type=int, default=None)
    p.add_argument("--dest_ip", type=str, default=None)
    p.add_argument("--dest_port", type=int, default=10001)
    p.add_argument("--max_mbps", type=int, default=1500)
    args = p.parse_args(argv)

    store = connect(args.etcdhost)
    cli = CorrControlClient(store=store)
    pls = [PipelineControl(cli, h, i)
           for h in args.hosts.split(",")
           for i in range(args.pipelines)]
    corr = CorrelatorControl(cli, pls)
    if args.dest_ip:
        for pl in pls:
            pl.corr_output_full.set_destination(args.dest_ip,
                                                args.dest_port)
            pl.corr_output_full.set_max_mbps(args.max_mbps)
    start = corr.arm_and_wait(delay_s=args.delay, acc_len=args.acc_len)
    print("armed at spectra", start)
    return 0


if __name__ == "__main__":
    sys.exit(main())
