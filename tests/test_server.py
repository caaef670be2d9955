"""HTTP serving layer: dynamic micro-batching + endpoint contracts."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np

from masters_thesis_tpu.server import DynamicBatcher, make_caption_server


class FakeCaptioner:
    """Records every device call so tests can assert coalescing."""

    def __init__(self, width=8, fail=False):
        self.input_width = width
        self.fail = fail
        self.calls = []

    def caption(self, rows, decoder="greedy"):
        if self.fail:
            raise RuntimeError("device on fire")
        self.calls.append((len(rows), decoder))
        return [f"{decoder}:{float(r.sum()):.0f}" for r in rows]


def test_batcher_coalesces_concurrent_requests():
    cap = FakeCaptioner()
    b = DynamicBatcher(cap, max_batch=64, max_wait_s=0.25)
    try:
        rows_a = np.full((2, 8), 1.0, np.float32)
        rows_b = np.full((3, 8), 2.0, np.float32)
        fa = b.submit(rows_a, "greedy")
        fb = b.submit(rows_b, "greedy")
        texts_a, batched_a = fa.result(timeout=5)
        texts_b, batched_b = fb.result(timeout=5)
        assert texts_a == ["greedy:8"] * 2
        assert texts_b == ["greedy:16"] * 3
        # both requests rode ONE device call
        assert batched_a == batched_b == 5
        assert cap.calls == [(5, "greedy")]
        assert b.n_requests == 2 and b.n_batches == 1 and b.n_rows == 5
    finally:
        b.close()


def test_batcher_splits_on_decoder_and_respects_max_batch():
    cap = FakeCaptioner()
    b = DynamicBatcher(cap, max_batch=4, max_wait_s=0.25)
    try:
        f1 = b.submit(np.ones((2, 8), np.float32), "greedy")
        f2 = b.submit(np.ones((2, 8), np.float32), "beam")
        f3 = b.submit(np.ones((3, 8), np.float32), "greedy")
        r1, r2, r3 = (f.result(timeout=5) for f in (f1, f2, f3))
        assert r1[0][0].startswith("greedy") and r2[0][0].startswith("beam")
        # no batch mixed decoders, none exceeded max_batch
        assert all(n <= 4 for n, _ in cap.calls)
        for n, d in cap.calls:
            assert d in ("greedy", "beam")
        assert sum(n for n, _ in cap.calls) == 7
    finally:
        b.close()


def test_batcher_propagates_device_errors():
    b = DynamicBatcher(FakeCaptioner(fail=True), max_wait_s=0.0)
    try:
        f = b.submit(np.ones((1, 8), np.float32), "greedy")
        try:
            f.result(timeout=5)
            raise AssertionError("expected RuntimeError")
        except RuntimeError as e:
            assert "device on fire" in str(e)
    finally:
        b.close()


def _post(url, body, content_type):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": content_type})
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read().decode())


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.status, json.loads(resp.read().decode())


def test_http_server_endpoints():
    cap = FakeCaptioner(width=8)
    server = make_caption_server(cap, port=0, max_batch=16,
                                 max_wait_s=0.005)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        st, health = _get(f"{base}/healthz")
        assert st == 200 and health["status"] == "ok"
        assert health["n_voxels"] == 8

        # npy body, (N, V)
        buf = io.BytesIO()
        np.save(buf, np.full((2, 8), 3.0, np.float32))
        st, out = _post(f"{base}/caption", buf.getvalue(),
                        "application/octet-stream")
        assert st == 200
        assert out["captions"] == ["greedy:24"] * 2
        assert out["decoder"] == "greedy" and out["batched_with"] >= 2

        # JSON body + per-request decoder override; 1-D row auto-expands
        body = json.dumps({"betas": [[1.0] * 8]}).encode()
        st, out = _post(f"{base}/caption?decoder=beam", body,
                        "application/json")
        assert st == 200 and out["captions"] == ["beam:8"]

        # stats reflect the traffic
        st, stats = _get(f"{base}/stats")
        assert st == 200 and stats["requests"] == 2
        assert stats["rows"] == 3 and stats["mean_batch_fill"] >= 1

        # wrong width -> 400 with a clear message
        buf = io.BytesIO()
        np.save(buf, np.ones((1, 5), np.float32))
        try:
            _post(f"{base}/caption", buf.getvalue(),
                  "application/octet-stream")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "betas must be" in json.loads(e.read().decode())["error"]

        # bad decoder -> 400; unknown path -> 404
        try:
            _post(f"{base}/caption?decoder=magic", body, "application/json")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            _get(f"{base}/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.batcher.close()
        server.server_close()


def test_http_concurrent_requests_share_a_device_batch():
    cap = FakeCaptioner(width=4)
    server = make_caption_server(cap, port=0, max_batch=32, max_wait_s=0.3)
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    results = []

    def fire(val):
        body = json.dumps({"betas": [[val] * 4]}).encode()
        results.append(_post(f"{base}/caption", body, "application/json"))

    try:
        threads = [threading.Thread(target=fire, args=(float(i),))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=10)
        assert len(results) == 4
        assert all(st == 200 for st, _ in results)
        # with a 300 ms window all four requests coalesce into few device
        # calls; at least one response proves multi-request batching
        assert max(out["batched_with"] for _, out in results) >= 2
        assert len(cap.calls) < 4
    finally:
        server.shutdown()
        server.batcher.close()
        server.server_close()


def test_server_with_real_captioner():
    """End-to-end: a real (tiny) LcNIC Captioner behind the HTTP layer."""
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.data.synthetic import synthetic_dataset
    from masters_thesis_tpu.models.nic import LcNIC
    from masters_thesis_tpu.ops.group_layout import GroupLayout
    from masters_thesis_tpu.serve import Captioner
    from masters_thesis_tpu.train.state import init_model

    cfg = Config(top_k=40, batch_size=4, max_length=6, units=16,
                 attn_units=8, group_size=4, embedding_text=8)
    split, pairs, tok, store, groups = synthetic_dataset(
        n_keys=8, n_voxels=64, n_groups=3, top_k=cfg.top_k)
    layout = GroupLayout(groups, 64)
    model = LcNIC(layout=layout, units=cfg.units, group_size=cfg.group_size,
                  embedding_text=cfg.embedding_text,
                  attn_units=cfg.attn_units, vocab_size=cfg.vocab_size,
                  max_length=cfg.max_length)
    betas = store.gather_host(np.arange(4, dtype=np.int32))
    tokens = np.zeros((4, cfg.max_length), np.int32)
    params, bstats, _ = init_model(model, cfg, betas, tokens)
    cap = Captioner.from_components(
        model, params, bstats, tok, cfg.units, cfg.max_length, batch_size=4,
        input_width=64)
    expected = cap.caption(betas[:2])

    server = make_caption_server(cap, port=0, max_wait_s=0.0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        np.save(buf, betas[:2])
        st, out = _post(f"http://{host}:{port}/caption", buf.getvalue(),
                        "application/octet-stream")
        assert st == 200
        assert out["captions"] == expected  # HTTP path == library path
    finally:
        server.shutdown()
        server.batcher.close()
        server.server_close()


def test_batcher_close_flushes_parked_request():
    """A decoder-mismatch carryover must still get an answer on shutdown."""
    cap = FakeCaptioner()
    b = DynamicBatcher(cap, max_batch=64, max_wait_s=0.5)
    f1 = b.submit(np.ones((1, 8), np.float32), "greedy")
    f2 = b.submit(np.ones((1, 8), np.float32), "beam")  # parks behind f1
    time.sleep(0.05)  # let the batcher pick both up inside one window
    b.close()
    assert f1.result(timeout=5)[0][0].startswith("greedy")
    assert f2.result(timeout=5)[0][0].startswith("beam")


def test_batcher_survives_concatenate_failure():
    """A width-mismatched coalesced batch must error the waiters, not kill
    the batcher thread (which would deadlock every later request)."""
    cap = FakeCaptioner(width=None)  # no server-side width validation
    b = DynamicBatcher(cap, max_batch=64, max_wait_s=0.2)
    try:
        f1 = b.submit(np.ones((1, 8), np.float32), "greedy")
        f2 = b.submit(np.ones((1, 5), np.float32), "greedy")
        errs = 0
        for f in (f1, f2):
            try:
                f.result(timeout=5)
            except ValueError:
                errs += 1
        assert errs == 2  # np.concatenate mismatch surfaced on both
        # the batcher thread is still alive and serving
        f3 = b.submit(np.ones((2, 8), np.float32), "greedy")
        texts, _ = f3.result(timeout=5)
        assert len(texts) == 2
    finally:
        b.close()


class FakePatchCaptioner(FakeCaptioner):
    """An image-feature service: per-request rows are (patches, channels)."""

    def __init__(self):
        super().__init__(width=8)
        self.input_row_shape = (4, 8)

    def caption(self, rows, decoder="greedy"):
        assert rows.ndim == 3 and rows.shape[1:] == (4, 8), rows.shape
        self.calls.append((len(rows), decoder))
        return [f"{decoder}:{float(r.sum()):.0f}" for r in rows]


def test_http_patch_run_shape_contract():
    """Image-feature runs serve (N, patches, channels) bodies: the width
    guard checks the FULL row shape, a single (patches, channels) body is a
    batch of one, and a flat (N, channels) body is rejected instead of
    being split into bogus single-patch rows."""
    import io

    import numpy as np

    cap = FakePatchCaptioner()
    server = make_caption_server(cap, port=0, max_batch=8, max_wait_s=0.0)
    host, port = server.server_address[:2]
    import threading

    from masters_thesis_tpu.server import serve_forever

    t = threading.Thread(target=serve_forever, args=(server,), daemon=True)
    t.start()
    try:
        def post(arr):
            buf = io.BytesIO()
            np.save(buf, arr)
            return _post(f"http://{host}:{port}/caption", buf.getvalue(),
                         "application/octet-stream")

        st, out = post(np.ones((2, 4, 8), np.float32))
        assert st == 200 and len(out["captions"]) == 2

        st, out = post(np.ones((4, 8), np.float32))  # one image, no batch dim
        assert st == 200 and len(out["captions"]) == 1

        import urllib.error
        import urllib.request

        buf = io.BytesIO()
        np.save(buf, np.ones((2, 8), np.float32))  # flat rows: not valid
        req = urllib.request.Request(
            f"http://{host}:{port}/caption", data=buf.getvalue(),
            method="POST", headers={"Content-Type":
                                    "application/octet-stream"})
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("flat body must be rejected")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        st, health = _get(f"http://{host}:{port}/healthz")
        assert health["input_row_shape"] == [4, 8]
    finally:
        server.shutdown()


def test_pre_transform_captioner_wraps_requests(tmp_path):
    """serve/caption --pre: raw request rows replay the preprocess chain
    before reaching the inner captioner, and the service contract becomes
    the chain's recorded RAW shape."""
    import json as _json

    import numpy as np

    from masters_thesis_tpu.serve import PreTransformCaptioner

    mask = np.asarray([1, 3], np.int64)
    np.save(tmp_path / "vc_mask.npy", mask)
    (tmp_path / "transform.json").write_text(_json.dumps({
        "stages": [{"stage": "vc_mask", "file": "vc_mask.npy"}],
        "input_row_shape": [6], "final_row_shape": [2]}))

    class Inner:
        input_width = 2
        input_row_shape = (2,)

        def caption(self, rows, decoder="greedy"):
            assert rows.shape[1] == 2
            return [f"{r[0]:.0f}-{r[1]:.0f}" for r in rows]

    cap = PreTransformCaptioner(Inner(), str(tmp_path))
    assert cap.input_row_shape == (6,) and cap.input_width == 6
    raw = np.arange(12, dtype=np.float32).reshape(2, 6)
    assert cap.caption(raw) == ["1-3", "7-9"]
