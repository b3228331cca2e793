#!/bin/bash
# Install the TPU X-engine framework on a host (the reference `deploy`
# script analog).  Run from the repo root.
#
# Roles:
#   - TPU hosts: full install + native engine + systemd units
#   - control hosts: python package only (control/monitoring clients)
set -euo pipefail

ROLE="${1:-tpu}"            # tpu | control
PREFIX="${PREFIX:-$HOME/.local}"
LOG=~/deploy_cbd_tpu_$(date --iso-8601=seconds).log

echo "installing role=$ROLE prefix=$PREFIX" | tee -a "$LOG"

python -m pip install -e . 2>&1 | tee -a "$LOG"

if [[ "$ROLE" == "tpu" ]]; then
    make -C native 2>&1 | tee -a "$LOG"
    mkdir -p "$HOME/.config/systemd/user"
    cp deploy/cbd-tpu-pipeline@.service \
       deploy/cbd-tpu-xeng-manager.service \
       "$HOME/.config/systemd/user/" 2>&1 | tee -a "$LOG"
    systemctl --user daemon-reload || true
    echo "enable with: systemctl --user enable --now" \
         "cbd-tpu-xeng-manager cbd-tpu-pipeline@0" | tee -a "$LOG"
fi

echo "done" | tee -a "$LOG"
