"""HTTP serving daemon for spelling correction.

A stdlib ThreadingHTTPServer over :class:`realise_tpu.serving.Corrector`
(checkpoint + precomputed-table fast path + fused block kernels on TPU) —
the production serving surface the reference never ships. Request threads
do featurization and JSON concurrently; device steps run on a dedicated
worker that coalesces concurrent requests sharing a length bucket into
ONE jitted step (`serving._CrossRequestBatcher`, opportunistic — no wait
timer, unloaded requests still see a batch of one). `--no_cross_batching`
reverts to one serialized device step per request.

Endpoints:
    GET  /healthz           → {"status": "ok", "model_type": ...}
    POST /correct           body {"sentences": ["...", ...]}
                            → {"results": [{"input", "corrected", "edits"}]}

Example:
    python -m realise_tpu.cli.serve --ckpt_dir ckpts --vocab_path vocab.txt \
        --port 8000
    curl -s localhost:8000/correct -d '{"sentences": ["我爱北经。"]}'
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from realise_tpu.cli.common import force_platform, setup_logging, logger


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--vocab_path", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--use_pallas", action="store_true", default=None)
    p.add_argument("--no_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--no_fast_path", action="store_true")
    p.add_argument("--no_cross_batching", action="store_true",
                   help="disable the cross-request device batcher "
                        "(concurrent requests then serialize one device "
                        "step each behind the device lock)")
    p.add_argument("--warmup", choices=("all", "quick", "none"),
                   default="all",
                   help="'all' pre-compiles every (batch, length) bucket "
                        "program before serving (minutes cold — "
                        "batch buckets × length buckets, cached on disk "
                        "for restarts); 'quick' compiles one bucket and "
                        "lets the rest compile on first use (that request "
                        "pays the compile); 'none' skips entirely")
    p.add_argument("--native_featurizer", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic vocabulary (smoke runs)")
    p.add_argument("--platform", default=None)
    return p


def make_handler(corrector):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # route through our logger
            logger.debug("http: " + fmt, *args)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "model_type": corrector.cfg.model_type})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/correct":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError):
                self._send(400, {"error": "malformed request"})
                return
            sentences = (payload.get("sentences")
                         if isinstance(payload, dict) else None)
            if (not isinstance(sentences, list)
                    or not all(isinstance(s, str) for s in sentences)):
                self._send(400, {"error": "body must be "
                                          '{"sentences": ["...", ...]}'})
                return
            try:
                # Corrector serializes the device step internally; the
                # host-side featurization/splicing here runs concurrently.
                results = corrector.correct_with_edits(sentences)
                self._send(200, {"results": results})
            except Exception as e:  # pragma: no cover - defensive
                logger.exception("request failed")
                self._send(500, {"error": str(e)})

    return Handler


def serve(corrector, host: str, port: int) -> ThreadingHTTPServer:
    """Build (but don't start) the server — tests drive it on a thread."""
    return ThreadingHTTPServer((host, port), make_handler(corrector))


def main(argv=None):
    args = build_parser().parse_args(argv)
    setup_logging()
    force_platform(args.platform)

    from realise_tpu.serving import Corrector

    corrector = Corrector(
        args.ckpt_dir, vocab_path=args.vocab_path,
        batch_size=args.batch_size, use_pallas=args.use_pallas,
        fast_path=not args.no_fast_path,
        native_featurizer=args.native_featurizer,
        synthetic_vocab=args.synthetic,
        cross_request_batching=not args.no_cross_batching)
    # Bind before the (minutes-long) warmup: a port conflict should fail
    # fast, and health checks can see the socket while buckets compile.
    server = serve(corrector, args.host, args.port)
    if args.warmup != "none":
        logger.info("warming up (jit compile, %s buckets)...", args.warmup)
        corrector.warmup(all_buckets=args.warmup == "all")
    logger.info("serving %s on http://%s:%d (POST /correct, GET /healthz)",
                corrector.cfg.model_type, args.host, args.port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
