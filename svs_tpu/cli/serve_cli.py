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
    p.add_argument("--dtype", type=str, default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="conv compute dtype (bfloat16 halves activation "
                        "traffic; masks agree with f32 to <0.05)")
    p.add_argument("--max_batch", type=int, default=8,
                   help="max requests coalesced into one pipelined "
                        "device call per queue drain")
    p.add_argument("--max_body_mb", type=int, default=256,
                   help="reject request bodies above this size (413)")
    p.add_argument("--max_queue", type=int, default=32,
                   help="max pending requests; beyond this new requests "
                        "fast-fail with 503 + Retry-After")
    p.add_argument("--request_timeout", type=float, default=300.0,
                   help="per-request deadline in seconds (504 on expiry)")
    p.add_argument("--warmup_secs", type=float, default=0.0,
                   help="compile the decode path for a song of this length "
                        "BEFORE binding the port (first requests then hit "
                        "warm executables; size it like a typical song)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import dataclasses

    import svs_tpu
    from svs_tpu.cli.infer_cli import load_model
    from svs_tpu.serve.server import serve
    from svs_tpu.utils.config import get_config

    svs_tpu.enable_compile_cache()

    cfg = get_config(args.preset)
    if args.dtype:
        cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
    params, bn_state = load_model(args.model_path)
    httpd = serve(params, bn_state, cfg,
                  host=args.host, port=args.port,
                  max_body_bytes=args.max_body_mb << 20,
                  max_batch=args.max_batch,
                  max_queue=args.max_queue,
                  request_timeout=args.request_timeout,
                  warmup_secs=args.warmup_secs)
    print(f"serving on http://{args.host}:{args.port} "
          "(POST /separate, GET /healthz)")

    from svs_tpu.serve.server import install_sigterm_drain

    install_sigterm_drain(httpd, drain_timeout=args.request_timeout)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.service.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
