#!/usr/bin/env bash
# Dataset-prep driver (reference v2s.sh:1-15): convert MUSDB18-HQ
# train/valid/test splits to spectrograms.  Point MUSDB_ROOT at a directory
# containing train/ valid/ test/ song folders with mixture.wav + vocals.wav.
set -euo pipefail

MUSDB_ROOT="${MUSDB_ROOT:-$HOME/musdb18hq}"
TAR="${TAR:-unet_spectrograms}"

for split in train valid test; do
    if [ -d "$MUSDB_ROOT/$split" ]; then
        python data.py \
            --src "$MUSDB_ROOT/$split" \
            --tar "$TAR/$split" \
            --direction to_spec
    else
        echo "skip: $MUSDB_ROOT/$split not found"
    fi
done
