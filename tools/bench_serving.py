"""Serving latency/throughput benchmark over the REAL HTTP surface.

Boots the production stack end-to-end — checkpoint load → Corrector
(precomputed tables, batch+length bucketed jit programs) → the stdlib
ThreadingHTTPServer from realise_tpu.cli.serve — then measures:

* **single-sentence latency** (serial requests): p50 / p90 / p99 ms —
  the number the batch-dim buckets exist for (a 1-sentence request
  computes 1 device row, not batch_size).
* **throughput under concurrent load**: N client threads firing
  batch-size requests; sentences/sec through the device lock.

The reference ships no serving at all (SURVEY.md §1: no serving layer);
these are the numbers that make the additive surface a real one.

Usage:
    python tools/bench_serving.py                 # full-size synthetic ckpt
    python tools/bench_serving.py --smoke         # tiny model on CPU
    python tools/bench_serving.py --ckpt_dir d --vocab_path v.txt

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import statistics
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"[bench_serving] {msg}", file=sys.stderr, flush=True)


def build_synthetic_ckpt(tiny: bool) -> "tuple[str, str]":
    """Init a fresh full-size (or tiny) arch3 model and save it as a real
    checkpoint directory, so the bench exercises the identical load path a
    production deployment uses."""
    import jax

    from realise_tpu.config import config_for
    from realise_tpu.data.features import Featurizer
    from realise_tpu.models.realise import init_realise
    from realise_tpu.text.glyphs import build_glyph_table
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict
    from realise_tpu.training.checkpoint import save_checkpoint

    vocab = build_synthetic_vocab(size=None if tiny else 21128)
    tokenizer = WordPieceTokenizer(vocab_to_dict(vocab))
    if tiny:
        cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                         hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         pho_num_layers=1, out_num_layers=1,
                         max_seq_length=32, max_position_embeddings=64,
                         num_fonts=2)
    else:
        cfg = config_for("bert-pho2-res-arch3", vocab_size=len(tokenizer),
                         dtype="bfloat16")
    glyphs = build_glyph_table(vocab, num_fonts=cfg.num_fonts,
                               use_traditional_font=cfg.use_traditional_font,
                               font_size=cfg.glyph_size)
    feat = Featurizer(tokenizer, cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params, state = init_realise(jax.random.PRNGKey(0), cfg,
                                     glyphs=glyphs,
                                     pho_tables=feat.pho2_tables())
    out = tempfile.mkdtemp(prefix="serving_bench_ckpt_")
    save_checkpoint(out, 0, params, state, cfg=cfg)
    # The Corrector's synthetic_vocab=True path rebuilds the DEFAULT-size
    # synthetic vocab, which differs from the full-size (21128) one built
    # here — persist the actual vocab and hand it over explicitly.
    vocab_path = tokenizer.save_pretrained(out)
    return out, vocab_path


def _post(url: str, sentences) -> dict:
    body = json.dumps({"sentences": sentences}).encode("utf-8")
    req = urllib.request.Request(url + "/correct", data=body,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read().decode("utf-8"))


def _pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default=None,
                    help="existing checkpoint (default: build synthetic)")
    ap.add_argument("--vocab_path", default=None)
    ap.add_argument("--smoke", action="store_true", help="tiny model on CPU")
    ap.add_argument("--batch_size", type=int, default=32,
                    help="sentences per load-test request")
    ap.add_argument("--serve_batch_size", type=int, default=None,
                    help="Corrector device-batch cap (default: 256 full / "
                         "request size smoke) — with cross-request "
                         "batching, concurrent requests coalesce up to "
                         "this many rows per device step")
    ap.add_argument("--no_cross_batching", action="store_true",
                    help="serialize one device step per request (the "
                         "round-5-early behavior, for A/B)")
    ap.add_argument("--latency_requests", type=int, default=200)
    ap.add_argument("--load_threads", type=int, default=8)
    ap.add_argument("--load_requests", type=int, default=20,
                    help="batch requests per client thread")
    ap.add_argument("--single_load_threads", type=int, default=16,
                    help="threads for the concurrent SINGLE-sentence load "
                         "lane (latency-style traffic; 0 disables)")
    ap.add_argument("--single_load_requests", type=int, default=50)
    ap.add_argument("--port", type=int, default=18091)
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"

    from realise_tpu.cli.serve import serve
    from realise_tpu.serving import Corrector
    from realise_tpu.utils.cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ckpt_dir = args.ckpt_dir
    if ckpt_dir is None:
        _log("building synthetic checkpoint")
        ckpt_dir, args.vocab_path = build_synthetic_ckpt(tiny=args.smoke)
    serve_bs = args.serve_batch_size or (args.batch_size if args.smoke
                                         else 256)
    _log(f"loading Corrector (tables + compile), device cap {serve_bs}, "
         f"cross-request batching "
         f"{'OFF' if args.no_cross_batching else 'on'}")
    corrector = Corrector(ckpt_dir, vocab_path=args.vocab_path,
                          batch_size=serve_bs,
                          synthetic_vocab=args.vocab_path is None,
                          cross_request_batching=not args.no_cross_batching)
    corrector.warmup(all_buckets=True)
    server = serve(corrector, "127.0.0.1", args.port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{args.port}"

    rng = random.Random(0)
    chars = "好的是不了人我在有他这中大来上国个到说们为子和你"
    mk = lambda n: "".join(rng.choice(chars) for _ in range(n))

    # --- single-sentence latency, serial ---
    _log(f"single-sentence latency ({args.latency_requests} requests)")
    lat = []
    for _ in range(args.latency_requests):
        s = mk(rng.randint(8, 28))
        t0 = time.perf_counter()
        _post(url, [s])
        lat.append((time.perf_counter() - t0) * 1e3)

    # --- concurrent batch load ---
    _log(f"concurrent load: {args.load_threads} threads × "
         f"{args.load_requests} × {args.batch_size}-sentence requests")
    req_lat, done = [], []
    lock = threading.Lock()

    def client(tid):
        r = random.Random(tid)
        for _ in range(args.load_requests):
            batch = ["".join(r.choice(chars)
                             for _ in range(r.randint(8, 28)))
                     for _ in range(args.batch_size)]
            t0 = time.perf_counter()
            out = _post(url, batch)
            dt = time.perf_counter() - t0
            with lock:
                req_lat.append(dt * 1e3)
                done.append(len(out["results"]))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.load_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    # --- concurrent single-sentence load (latency-style traffic) ---
    s_lat, s_done = [], []
    s_wall = 0.0
    if args.single_load_threads > 0:
        _log(f"concurrent single-sentence load: {args.single_load_threads} "
             f"threads × {args.single_load_requests} requests")

        def single_client(tid):
            r = random.Random(1000 + tid)
            for _ in range(args.single_load_requests):
                s = "".join(r.choice(chars) for _ in range(r.randint(8, 28)))
                t0 = time.perf_counter()
                _post(url, [s])
                dt = time.perf_counter() - t0
                with lock:
                    s_lat.append(dt * 1e3)
                    s_done.append(1)

        t0 = time.perf_counter()
        sthreads = [threading.Thread(target=single_client, args=(i,))
                    for i in range(args.single_load_threads)]
        for th in sthreads:
            th.start()
        for th in sthreads:
            th.join()
        s_wall = time.perf_counter() - t0
    server.shutdown()
    corrector.close()

    result = {
        "metric": "serving HTTP latency/throughput (arch3)",
        "serve_batch_size": serve_bs,
        "cross_request_batching": not args.no_cross_batching,
        "single_p50_ms": round(_pct(lat, 50), 2),
        "single_p90_ms": round(_pct(lat, 90), 2),
        "single_p99_ms": round(_pct(lat, 99), 2),
        "single_mean_ms": round(statistics.mean(lat), 2),
        "load_threads": args.load_threads,
        "load_batch_size": args.batch_size,
        "load_sentences_per_sec": round(sum(done) / wall, 1),
        "load_request_p50_ms": round(_pct(req_lat, 50), 2),
        "load_request_p99_ms": round(_pct(req_lat, 99), 2),
    }
    if s_done:
        result.update({
            "single_load_threads": args.single_load_threads,
            "single_load_requests_per_sec": round(len(s_done) / s_wall, 1),
            "single_load_p50_ms": round(_pct(s_lat, 50), 2),
            "single_load_p99_ms": round(_pct(s_lat, 99), 2),
        })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
