#!/usr/bin/env bash
# One-command MUSDB18 SDR-parity playbook — see scripts/parity_musdb.py.
#   scripts/parity_musdb.sh --musdb /path/to/musdb18hq [--pth svs_unet.pth]
#   scripts/parity_musdb.sh --synthetic --epochs 20   # CI-proven dry run
exec python "$(dirname "$0")/parity_musdb.py" "$@"
