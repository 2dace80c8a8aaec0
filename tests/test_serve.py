"""Serving subsystem: engine correctness, micro-batching, HTTP contract."""

import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.models.regat import apply_regat, init_regat
from tf_vqa_regat_tpu.serve import InferenceEngine, make_server


CFG = Config(
    num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6, imp_pos_emb_dim=16,
    fusion="butd", relation_type="implicit", batch_size=8, adaptive=True,
    num_rois=40, serve_batch_sizes="1,4", serve_max_delay_ms=20.0,
)


@pytest.fixture(scope="module")
def setup():
    ds = synthetic_dataset(num_images=6, num_questions=18, v_dim=16, num_ans=7)
    params = init_regat(jax.random.PRNGKey(0), CFG, ds.ntoken, 16, 7)
    return ds, params


def _direct_answer(ds, params, question_text, image_index):
    """Oracle: pack one example by hand and argmax apply_regat."""
    from tf_vqa_regat_tpu.data.dictionary import encode_question

    R = CFG.resolved_num_rois()
    f, nb, rb = ds.store.image_slice(image_index)
    n = min(len(f), R)
    batch = {
        "features": jnp.zeros((1, R, 16)).at[0, :n].set(f[:n]),
        "norm_bb": jnp.zeros((1, R, 6)).at[0, :n].set(nb[:n]),
        "bb": jnp.zeros((1, R, 4)).at[0, :n].set(rb[:n]),
        "question": jnp.asarray(
            [encode_question(ds.dictionary, question_text, 14)], jnp.int32
        ),
        "num_boxes": jnp.asarray([n], jnp.int32),
        "valid": jnp.ones((1,), bool),
    }
    logits = apply_regat(params, CFG, batch, ds.ntoken, train=False)
    return ds.label2ans[int(jnp.argmax(logits[0]))]


def test_engine_matches_direct_forward(setup):
    ds, params = setup
    eng = InferenceEngine(CFG, ds, params, batch_sizes=(1, 4))
    qs = ["what color is the cat ?", "how many dogs are there ?", "is it raining ?"]
    iids = [int(ds.entries.image_ids[i]) for i in (0, 3, 5)]
    idxs = [int(ds.entries.image_index[i]) for i in (0, 3, 5)]
    got = eng.infer(qs, iids)
    for g, q, ix in zip(got, qs, idxs):
        assert g["answer"] == _direct_answer(ds, params, q, ix)
        assert 0.0 <= g["confidence"] <= 1.0


def test_engine_mutan_matches_direct_forward(setup):
    """Serving a MuTAN checkpoint: the engine's eval forward takes the
    reassociated Tucker path (models/mutan.py rank-sum fold — eval always
    qualifies) and mutan scores answers directly (no classifier); its
    answers must match the hand-packed apply_regat oracle."""
    ds, _ = setup
    cfg = CFG.replace(fusion="mutan", mutan_rank=3, mutan_gamma=2)
    params = init_regat(jax.random.PRNGKey(3), cfg, ds.ntoken, 16, 7)
    eng = InferenceEngine(cfg, ds, params, batch_sizes=(1,))
    qs = ["what color is the cat ?", "is it raining ?"]
    iids = [int(ds.entries.image_ids[i]) for i in (1, 4)]
    idxs = [int(ds.entries.image_index[i]) for i in (1, 4)]
    got = eng.infer(qs, iids)
    from tf_vqa_regat_tpu.data.dictionary import encode_question

    R = cfg.resolved_num_rois()
    for g, q, ix in zip(got, qs, idxs):
        f, nb, rb = ds.store.image_slice(ix)
        n = min(len(f), R)
        batch = {
            "features": jnp.zeros((1, R, 16)).at[0, :n].set(f[:n]),
            "norm_bb": jnp.zeros((1, R, 6)).at[0, :n].set(nb[:n]),
            "bb": jnp.zeros((1, R, 4)).at[0, :n].set(rb[:n]),
            "question": jnp.asarray(
                [encode_question(ds.dictionary, q, 14)], jnp.int32
            ),
            "num_boxes": jnp.asarray([n], jnp.int32),
            "valid": jnp.ones((1,), bool),
        }
        logits = apply_regat(params, cfg, batch, ds.ntoken, train=False)
        assert g["answer"] == ds.label2ans[int(jnp.argmax(logits[0]))]


def test_engine_unknown_image(setup):
    ds, params = setup
    eng = InferenceEngine(CFG, ds, params, batch_sizes=(1,))
    (res,) = eng.infer(["what ?"], [999999])
    assert "error" in res


def test_http_server_contract(setup):
    """End-to-end HTTP: healthz, single + client-batch predict, bad input,
    and concurrent requests through the micro-batcher."""
    ds, params = setup
    server, batcher = make_server(CFG, ds, params, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def post(payload):
        req = urllib.request.Request(
            base + "/predict", json.dumps(payload).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["batch_sizes"] == [1, 4]

        iid = int(ds.entries.image_ids[0])
        one = post({"question": "what color is the sky ?", "image_id": iid})
        assert set(one) == {"answer", "confidence"}
        idx0 = int(ds.entries.image_index[0])
        assert one["answer"] == _direct_answer(
            ds, params, "what color is the sky ?", idx0
        )

        many = post(
            [{"question": "how many ?", "image_id": iid} for _ in range(3)]
        )
        assert len(many) == 3 and len({m["answer"] for m in many}) == 1

        # malformed
        req = urllib.request.Request(
            base + "/predict", b"{\"nope\": 1}",
            {"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # malformed item mid-list: the WHOLE request validates before the
        # first submit — already-enqueued items otherwise ran abandoned
        # inference that delayed concurrent micro-batches (round-3 review
        # finding)
        n_submits = []
        orig_submit = batcher.submit

        def counting_submit(*a, **k):
            n_submits.append(1)
            return orig_submit(*a, **k)

        batcher.submit = counting_submit
        try:
            post([{"question": "q ?", "image_id": iid}, {"question": "q ?"}])
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        assert not n_submits, "items were enqueued before validation failed"
        batcher.submit = orig_submit

        # oversized client batch: rejected up front (400), never enqueued —
        # one huge request must not starve concurrent ones (advisor finding)
        from tf_vqa_regat_tpu.serve import MAX_CLIENT_BATCH

        try:
            post(
                [{"question": "q ?", "image_id": iid}]
                * (MAX_CLIENT_BATCH + 1)
            )
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "batch too large" in json.loads(e.read())["error"]

        # concurrency through the micro-batcher: all answers must be
        # correct AND identical for identical requests
        with ThreadPoolExecutor(6) as ex:
            futs = [
                ex.submit(post, {"question": "is it a dog ?", "image_id": iid})
                for _ in range(6)
            ]
            res = [f.result() for f in futs]
        assert len({r["answer"] for r in res}) == 1
        assert res[0]["answer"] == _direct_answer(ds, params, "is it a dog ?", idx0)
    finally:
        server.shutdown()
        batcher.close()


def test_capacity_guard_and_int8_serving(setup):
    """Round-2 verdict #7 / round-4 item 5 (serve capacity story): a split
    too big even for the SHARDED store must fail loudly at engine
    construction with the --feature_dtype int8 remedy and both the
    replicated and per-shard numbers in the message, and the int8 engine
    itself must serve correctly (per-row dequantized gather)."""
    from tf_vqa_regat_tpu.data.device_store import estimate_nbytes
    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes

    ds, params = setup
    e_f32 = estimate_nbytes(ds, False, "float32")
    e_sh = estimate_sharded_nbytes(ds, False, "float32", 8)
    # budget below even the per-shard f32 slice: no store mode fits at f32
    budget_gb = (e_sh * 0.5) / 1e9
    cfg_tight = CFG.replace(device_store_budget_gb=budget_gb)
    with pytest.raises(ValueError, match=r"int8.*GB/shard"):
        InferenceEngine(cfg_tight, ds, params, batch_sizes=(1,))

    # replicated-int8-refusing budget still serves via int8 (which fits
    # replicated here): correctness of the dequantized gather
    e_int8 = estimate_nbytes(ds, False, "int8")
    assert e_int8 < e_f32
    eng = InferenceEngine(
        CFG.replace(
            feature_dtype="int8", device_store_budget_gb=(e_int8 * 1.5) / 1e9
        ),
        ds, params, batch_sizes=(1, 4),
    )
    assert eng.store_mode == "replicated"
    qs = ["what color is the cat ?", "how many dogs ?"]
    iids = [int(ds.entries.image_ids[i]) for i in (0, 4)]
    got = eng.infer(qs, iids)
    assert len(got) == 2
    for r in got:
        assert r["answer"] in ds.label2ans
        assert 0.0 < r["confidence"] < 1.0
    # int8 is input rounding only: the same requests through an f32 engine
    # agree on the argmax answer for this well-separated fixture
    eng32 = InferenceEngine(CFG, ds, params, batch_sizes=(1, 4))
    got32 = eng32.infer(qs, iids)
    assert [r["answer"] for r in got] == [r["answer"] for r in got32]


def test_serve_sharded_fallback_matches_replicated(setup):
    """A split too big to replicate but fitting per-shard falls back to the
    SHARDED store (round-4 verdict item 5): tables partitioned over the
    data axis, requests served by the masked local gather + psum
    (build_sharded_image_gather). Serving is a pure layout change: every
    answer and confidence must match the replicated engine bit-for-bit
    within float tolerance."""
    from tf_vqa_regat_tpu.data.device_store import estimate_nbytes
    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes

    ds, params = setup
    e_rep = estimate_nbytes(ds, False, "float32")
    e_sh = estimate_sharded_nbytes(ds, False, "float32", 8)
    assert e_sh < e_rep
    cfg_mid = CFG.replace(device_store_budget_gb=((e_rep + e_sh) / 2) / 1e9)
    eng_sh = InferenceEngine(cfg_mid, ds, params, batch_sizes=(1, 4))
    assert eng_sh.store_mode == "sharded"
    eng_rep = InferenceEngine(CFG, ds, params, batch_sizes=(1, 4))
    assert eng_rep.store_mode == "replicated"

    qs = [
        "what color is the cat ?",
        "how many dogs are there ?",
        "is it raining ?",
        "what ?",
    ]
    iids = [int(ds.entries.image_ids[i]) for i in (0, 3, 5, 7)] + [999999]
    qs = qs + ["unknown image"]
    got_sh = eng_sh.infer(qs, iids)
    got_rep = eng_rep.infer(qs, iids)
    assert len(got_sh) == len(got_rep) == 5
    for a, b in zip(got_sh, got_rep):
        if "error" in b:
            assert "error" in a
            continue
        assert a["answer"] == b["answer"]
        np.testing.assert_allclose(a["confidence"], b["confidence"], rtol=1e-5)


def test_serve_sharded_semantic_adjacency_matches_replicated():
    """Sharded serving of a semantic-relation model: the per-shard
    adjacency table (local image-slot order) must reach the model through
    the psum gather exactly as the replicated gather_adj path does."""
    from tf_vqa_regat_tpu.data.device_store import estimate_nbytes
    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes

    ds = synthetic_dataset(
        num_images=6, num_questions=18, v_dim=16, num_ans=7, semantic=True
    )
    cfg = CFG.replace(relation_type="semantic")
    params = init_regat(jax.random.PRNGKey(3), cfg, ds.ntoken, 16, 7)
    e_rep = estimate_nbytes(ds, True, "float32")
    e_sh = estimate_sharded_nbytes(ds, True, "float32", 8)
    assert e_sh < e_rep
    eng_sh = InferenceEngine(
        cfg.replace(device_store_budget_gb=((e_rep + e_sh) / 2) / 1e9),
        ds, params, batch_sizes=(1,),
    )
    assert eng_sh.store_mode == "sharded"
    eng_rep = InferenceEngine(cfg, ds, params, batch_sizes=(1,))

    qs = ["what color is the cat ?", "how many dogs ?"]
    iids = [int(ds.entries.image_ids[i]) for i in (0, 4)]
    got_sh = eng_sh.infer(qs, iids)
    got_rep = eng_rep.infer(qs, iids)
    for a, b in zip(got_sh, got_rep):
        assert a["answer"] == b["answer"]
        np.testing.assert_allclose(a["confidence"], b["confidence"], rtol=1e-5)


def test_serve_semantic_adjacency_matches_eval_forward():
    """Serving a semantic-relation model: the serve step must thread the
    precomputed adjacency table through the same edge-label path as eval
    (serve_step's arrays['adj'] branch — previously untested)."""
    ds = synthetic_dataset(
        num_images=6, num_questions=18, v_dim=16, num_ans=7, semantic=True
    )
    cfg = CFG.replace(relation_type="semantic")
    params = init_regat(jax.random.PRNGKey(3), cfg, ds.ntoken, 16, 7)
    eng = InferenceEngine(cfg, ds, params, batch_sizes=(1,))

    # oracle: eval-mode forward with the adjacency packed by hand
    from tf_vqa_regat_tpu.data.dictionary import encode_question

    R = cfg.resolved_num_rois()
    i = 2
    img_idx = int(ds.entries.image_index[i])
    f, nb, rb = ds.store.image_slice(img_idx)
    n = min(len(f), R)
    adj = np.zeros((1, R, R), np.int32)
    k = min(ds.store.semantic_adj.shape[1], R)
    adj[0, :k, :k] = ds.store.semantic_adj[img_idx][:k, :k]
    q_text = "what color is the cat ?"
    batch = {
        "features": jnp.zeros((1, R, 16)).at[0, :n].set(f[:n]),
        "norm_bb": jnp.zeros((1, R, 6)).at[0, :n].set(nb[:n]),
        "bb": jnp.zeros((1, R, 4)).at[0, :n].set(rb[:n]),
        "question": jnp.asarray(
            [encode_question(ds.dictionary, q_text, 14)], jnp.int32
        ),
        "num_boxes": jnp.asarray([n], jnp.int32),
        "valid": jnp.ones((1,), bool),
        "adj_label": jnp.asarray(adj),
    }
    logits = apply_regat(params, cfg, batch, ds.ntoken, train=False)
    want = ds.label2ans[int(jnp.argmax(logits[0]))]

    got = eng.infer([q_text], [int(ds.entries.image_ids[i])])
    assert got[0]["answer"] == want


def test_post_scalar_json_body_returns_400(setup):
    """A scalar JSON body (valid JSON, not an object/array) must get the
    documented 400, not crash the handler at len(items) (round-3 review
    finding)."""
    ds, params = setup
    server, batcher = make_server(CFG, ds, params, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        for body in (b"5", b"true", b'"abc"', b"null"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", body,
                {"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, f"expected 400 for body {body!r}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, body
                assert "object or array" in json.loads(e.read())["error"]
    finally:
        server.shutdown()
        batcher.close()


def test_microbatcher_close_drains_presentinel_requests():
    """submit() documents that a request enqueued before close()'s sentinel
    is still served. The worker loop must therefore drain the queue up to
    the sentinel even after _stop is set — previously it re-checked _stop
    after each batch and abandoned queued pre-sentinel requests, parking
    their Futures until the handler's 60 s timeout (round-3 review
    finding)."""
    import time

    from tf_vqa_regat_tpu.serve import MicroBatcher

    class SlowEngine:
        batch_sizes = (1,)  # one request per infer -> the queue backs up

        def infer(self, qs, iids):
            time.sleep(0.15)
            return [{"answer": "a", "confidence": 0.5} for _ in qs]

    b = MicroBatcher(SlowEngine(), max_delay_ms=1.0)
    f0 = b.submit("q", 0)
    time.sleep(0.05)  # worker is inside infer() serving f0
    f1 = b.submit("q", 1)
    f2 = b.submit("q", 2)
    closer = threading.Thread(target=b.close)
    closer.start()  # sets _stop and enqueues the sentinel AFTER f1/f2
    assert f0.result(timeout=5)["answer"] == "a"
    assert f1.result(timeout=5)["answer"] == "a"
    assert f2.result(timeout=5)["answer"] == "a"
    closer.join(timeout=5)
    # post-close submits still fail fast
    f3 = b.submit("q", 3)
    with pytest.raises(RuntimeError, match="shutting down"):
        f3.result(timeout=1)
