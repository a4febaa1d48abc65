"""Serving surface tests: Corrector core + the HTTP daemon."""

import http.client
import json
import threading

import jax
import pytest


@pytest.fixture(scope="module")
def ckpt_dir(tokenizer, tmp_path_factory):
    from realise_tpu.config import config_for
    from realise_tpu.models.realise import init_realise
    from realise_tpu.training.checkpoint import save_checkpoint

    cfg = config_for(
        "bert-pho2-res-arch3", vocab_size=len(tokenizer), hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=32,
        pho_num_layers=1, out_num_layers=1, max_seq_length=16,
        max_position_embeddings=32, num_fonts=1)
    params, state = init_realise(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path_factory.mktemp("serve_ckpt"))
    save_checkpoint(out, 0, params, state, opt_state=None, cfg=cfg)
    return out


@pytest.fixture(scope="module")
def corrector(ckpt_dir):
    from realise_tpu.serving import Corrector

    c = Corrector(ckpt_dir, synthetic_vocab=True, batch_size=4)
    c.warmup()
    return c


def test_corrector_shapes_and_chunking(corrector):
    sents = ["我爱北京。", "天气很好", "你好吗", "好", "再见了", "谢谢你"]
    out = corrector.correct(sents)  # 6 sentences at batch_size 4 → 2 chunks
    assert len(out) == len(sents)
    assert all(isinstance(s, str) and s for s in out)
    # Correction is length-preserving for plain CJK input.
    assert [len(s) for s in out] == [len(s) for s in sents]


def test_corrector_edits():
    from realise_tpu.serving import Corrector

    assert Corrector.edits("我爱北经。", "我爱北京。") == [(4, "经", "京")]
    assert Corrector.edits("天气", "天气") == []


def test_http_server_roundtrip(corrector):
    import portpicker

    from realise_tpu.cli.serve import serve

    port = portpicker.pick_unused_port()
    server = serve(corrector, "127.0.0.1", port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"
        assert health["model_type"] == "bert-pho2-res-arch3"

        body = json.dumps({"sentences": ["我爱北京。", "你好"]})
        conn.request("POST", "/correct", body=body)
        resp = json.loads(conn.getresponse().read())
        assert len(resp["results"]) == 2
        r = resp["results"][0]
        assert r["input"] == "我爱北京。"
        assert len(r["corrected"]) == 5
        assert {"pos", "wrong", "correct"} >= set(
            k for e in r["edits"] for k in e)

        # malformed body → 400, server stays up
        conn.request("POST", "/correct", body="{}")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        server.shutdown()
        server.server_close()


def test_length_buckets_pick_smallest_fit(corrector):
    assert corrector._bucket_for(["好好"]) == 16  # tiny cfg: max_seq_length 16
    out = corrector.correct(["好", "天气很好我们出去玩吧现在就走"])
    assert len(out) == 2


def test_corrector_batch_padding_stable_shapes(corrector):
    """Requests smaller than batch_size produce the same answers as padded
    full batches (one jit shape per bucket)."""
    single = corrector.correct(["我爱北京。"])
    batch = corrector.correct(["我爱北京。", "你好吗", "天气很好"])
    assert batch[0] == single[0]


def test_show_gate_cli(ckpt_dir, tmp_path):
    """Gate-introspection CLI dumps per-token gate TSV (the reference's
    show_gate.py is import-broken, SURVEY.md §2.3; ours must actually run)."""
    from realise_tpu.cli import show_gate

    out = str(tmp_path / "gate.tsv")
    rc = show_gate.main(["--ckpt_dir", ckpt_dir, "--synthetic",
                         "--platform", "cpu", "--output", out,
                         "--batch_size", "10"])  # 32 % 10 != 0: ragged final batch
    assert rc == 0
    lines = open(out, encoding="utf-8").read().splitlines()
    assert lines[0].split("\t") == ["id", "pos", "char",
                                    "g_sem", "g_pho", "g_res"]
    assert len(lines) > 1
    # gate values are sigmoids in [0, 1]
    for ln in lines[1:6]:
        parts = ln.split("\t")
        for g in parts[3:]:
            assert 0.0 <= float(g) <= 1.0, ln


def test_show_gate_row_count_exact(ckpt_dir, tmp_path):
    """Ragged final batches must not duplicate gate rows: row count equals
    the sum of true sentence lengths (32 synthetic examples at bs=10)."""
    from realise_tpu.cli import show_gate
    from realise_tpu.data.dataset import synthetic_dataset
    from realise_tpu.text.tokenizer import WordPieceTokenizer
    from realise_tpu.text.vocab import build_synthetic_vocab, vocab_to_dict

    tok = WordPieceTokenizer(vocab_to_dict(build_synthetic_vocab()))
    expected = sum(ex["lengths"]
                   for ex in synthetic_dataset(tok, num_examples=32, seed=5))
    out = str(tmp_path / "gate2.tsv")
    rc = show_gate.main(["--ckpt_dir", ckpt_dir, "--synthetic",
                         "--platform", "cpu", "--output", out,
                         "--batch_size", "10"])
    assert rc == 0
    rows = open(out, encoding="utf-8").read().splitlines()[1:]
    assert len(rows) == expected


def test_corrector_preserves_dropped_chars(corrector):
    """Inputs with chars the tokenizer drops (spaces) or non-vocab ASCII
    must come back length-preserved with those chars intact — the serving
    splice maps tokens to source spans instead of rebuilding from token
    widths (which loses the space and shifts everything after it)."""
    src = "我爱 北京。"
    out = corrector.correct([src])[0]
    assert len(out) == len(src)
    assert out[2] == " "
    # Mixed input: length survives; [UNK] source spans (the model saw only
    # the [UNK] embedding there) keep the user's original chars. In-vocab
    # tokens may be rewritten by the (random-weight) model — that's a model
    # output, not a reconstruction bug.
    src2 = "我爱Ω北京"
    out2 = corrector.correct([src2])[0]
    assert len(out2) == len(src2)
    assert out2[2] == "Ω"


def test_cross_request_batcher_matches_serial(ckpt_dir):
    """Concurrent requests through the cross-request batcher produce
    exactly the serial path's corrections, across mixed sizes and length
    buckets (different buckets must not merge into one device group)."""
    import concurrent.futures

    from realise_tpu.serving import Corrector

    serial = Corrector(ckpt_dir, synthetic_vocab=True, batch_size=4)
    batched = Corrector(ckpt_dir, synthetic_vocab=True, batch_size=4,
                        cross_request_batching=True)
    try:
        requests = [
            ["我爱北京。"],
            ["天气很好", "你好吗"],
            ["好"],
            ["再见了", "谢谢你", "我爱北京。"],
            ["这是一个非常长的句子呀"],  # longer → different length bucket
            ["短"],
        ]
        expect = [serial.correct(r) for r in requests]
        with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
            got = list(ex.map(batched.correct, requests))
        assert got == expect
        # And again sequentially (trivial groups of one).
        assert [batched.correct(r) for r in requests] == expect
    finally:
        batched.close()


def test_cross_request_batcher_groups_share_one_step(ckpt_dir):
    """Under concurrency the batcher really does coalesce: stall the
    device step while submissions pile up, then count the steps."""
    import time

    from realise_tpu.serving import Corrector

    c = Corrector(ckpt_dir, synthetic_vocab=True, batch_size=4,
                  cross_request_batching=True)
    try:
        c.warmup()
        calls = []
        inner = c._device_step
        gate = threading.Event()

        def slow_step(arrays):
            calls.append(arrays[next(iter(arrays))].shape[0])
            gate.wait(5.0)
            return inner(arrays)

        c._device_step = slow_step
        threads = [threading.Thread(target=c.correct, args=(["好"],))
                   for _ in range(3)]
        threads[0].start()
        deadline = time.time() + 5.0
        while not calls and time.time() < deadline:
            time.sleep(0.001)  # first request reaches the stalled step
        assert calls, "first request never reached the device step"
        threads[1].start()
        threads[2].start()
        # Both stragglers must be queued before the gate opens.
        deadline = time.time() + 5.0
        while len(c._batcher._pending) < 2 and time.time() < deadline:
            time.sleep(0.001)
        assert len(c._batcher._pending) == 2
        gate.set()
        for t in threads:
            t.join(10.0)
        # 1 solo step + 1 group step of 2 rows (padded to bucket size 2⁺):
        # the group's device rows must cover both stragglers in ONE call.
        assert len(calls) == 2
    finally:
        c._device_step = inner
        c.close()


def test_cross_request_batcher_oversize_direct_call(ckpt_dir):
    """A direct correct_batch() call larger than the device cap rides solo
    at its own row count (no truncation, no empty-group stall)."""
    from realise_tpu.serving import Corrector

    c = Corrector(ckpt_dir, synthetic_vocab=True, batch_size=4,
                  cross_request_batching=True)
    try:
        sents = ["我爱北京。", "天气很好", "你好吗", "好", "再见了", "谢谢你"]
        out = c.correct_batch(sents)  # 6 > batch_size 4
        assert len(out) == 6
        assert [len(s) for s in out] == [len(s) for s in sents]
    finally:
        c.close()


def test_http_server_with_cross_batching(ckpt_dir):
    """The HTTP daemon over a batching Corrector: concurrent POSTs are
    answered correctly (and identically to each other for identical
    bodies) while the batcher coalesces their device work."""
    import concurrent.futures

    import portpicker

    from realise_tpu.cli.serve import serve
    from realise_tpu.serving import Corrector

    c = Corrector(ckpt_dir, synthetic_vocab=True, batch_size=4,
                  cross_request_batching=True)
    port = portpicker.pick_unused_port()
    server = serve(c, "127.0.0.1", port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def post(sentences):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/correct",
                         body=json.dumps({"sentences": sentences}))
            return json.loads(conn.getresponse().read())

        bodies = [["我爱北京。"], ["你好吗"], ["我爱北京。"], ["天气很好", "好"]]
        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
            results = list(ex.map(post, bodies))
        for body, resp in zip(bodies, results):
            assert [r["input"] for r in resp["results"]] == body
            for r in resp["results"]:
                assert len(r["corrected"]) == len(r["input"])
        # identical inputs → identical outputs through the group path
        assert results[0] == results[2]
    finally:
        server.shutdown()
        server.server_close()
        c.close()
