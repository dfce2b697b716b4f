"""``serve`` CLI — HTTP separation service."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Serve vocal separation over "
                                            "HTTP (POST /separate).")
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8571)
    p.add_argument("--preset", type=str, default="default")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from svs_tpu.cli.infer_cli import load_model
    from svs_tpu.serve.server import serve
    from svs_tpu.utils.config import get_config

    params, bn_state = load_model(args.model_path)
    httpd = serve(params, bn_state, get_config(args.preset),
                  host=args.host, port=args.port)
    print(f"serving on http://{args.host}:{args.port} "
          "(POST /separate, GET /healthz)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.service.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
