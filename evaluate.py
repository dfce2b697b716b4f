#!/usr/bin/env python
"""Thin shim: `python evaluate.py ...` works exactly like the reference script
of the same name; the implementation lives in svs_tpu.cli.eval_cli."""
from svs_tpu.cli.eval_cli import main

if __name__ == "__main__":
    raise SystemExit(main())
