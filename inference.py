#!/usr/bin/env python
"""Thin shim: `python inference.py ...` works exactly like the reference script
of the same name; the implementation lives in svs_tpu.cli.infer_cli."""
from svs_tpu.cli.infer_cli import main

if __name__ == "__main__":
    raise SystemExit(main())
