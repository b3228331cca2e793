"""Live text dashboard over the monitor keys.

Analog of reference: pipeline-control/scripts/etcd_monitor.py (curses
dashboard over /mon/corr); here a simple refresh loop over
``render_text`` so it works in any terminal and in CI logs.
"""

from __future__ import annotations

import argparse
import sys
import time

from ..control.monitor import render_text
from ..control.store import connect


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TPU X-engine monitor")
    p.add_argument("--etcdhost", type=str, default=None)
    p.add_argument("--interval", type=float, default=2.0)
    p.add_argument("--once", action="store_true")
    args = p.parse_args(argv)
    store = connect(args.etcdhost)
    while True:
        txt = render_text(store)
        if not args.once:
            sys.stdout.write("\x1b[2J\x1b[H")
        print(time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()))
        print(txt or "(no monitor keys yet)")
        if args.once:
            return 0
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
