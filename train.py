#!/usr/bin/env python
"""Thin shim: `python train.py ...` works exactly like the reference script
of the same name; the implementation lives in svs_tpu.cli.train_cli."""
from svs_tpu.cli.train_cli import main

if __name__ == "__main__":
    raise SystemExit(main())
