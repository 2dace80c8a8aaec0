"""Production serving: `--mode serve` — HTTP answer service over a checkpoint.

Net-new capability (the reference has no serving path; its only entrypoints
are train/eval, reference main.py:99-157). TPU-first design:

- **No recompiles at serve time**: requests are micro-batched to a small set
  of pre-compiled batch sizes (`--serve_batch_sizes`, default 1,8,32); every
  program is compiled AND warmed at startup, so request latency is pure
  dispatch + device time.
- **Features stay in HBM**: the split's region-feature tables are uploaded
  once (DeviceStore); a request ships only its [14] token ids and an image
  index — the ~800 KB of region features per example never cross the
  host->device boundary at serve time (gather_image_features).
- **Capacity fallback**: a split too big to replicate at the configured
  --feature_dtype serves from the data-axis-SHARDED store instead — each
  request's images are fetched by a masked local gather + one ICI psum
  (sharded_store.build_sharded_image_gather), trading a few-MB all-reduce
  per batch for unbounded split size. Only when even the per-shard slice
  exceeds --device_store_budget_gb does construction fail (with both
  numbers in the message).
- **Micro-batching**: concurrent requests are coalesced for up to
  `--serve_max_delay_ms` into one forward pass at the smallest compiled
  batch size that fits (classic serving latency/throughput trade).

API (JSON over HTTP, stdlib ThreadingHTTPServer — no extra dependencies):
  GET  /healthz   -> {"status": "ok", "batch_sizes": [...], ...}
  POST /predict   {"question": str, "image_id": int}
                  -> 200 {"answer": str, "confidence": float} (sigmoid prob)
                  -> 404 {"error": ...} for an unknown image_id
  POST /predict   [{...}, {...}]  -> 200 [{...}, {...}]       (client batch;
                  per-item failures appear as {"error": ...} entries)
  Malformed input -> 400; engine failure / shutdown race -> 500.
"""

from __future__ import annotations

import json
import queue
import threading
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.data.device_store import DeviceStore, gather_image_features
from tf_vqa_regat_tpu.data.dictionary import encode_question
from tf_vqa_regat_tpu.data.features import VQADataset
from tf_vqa_regat_tpu.models.regat import apply_regat, resolve_impl
from tf_vqa_regat_tpu.parallel.distributed import put_global_tree
from tf_vqa_regat_tpu.parallel.mesh import make_mesh, replicated

# Largest client batch one POST may carry (see do_POST).
MAX_CLIENT_BATCH = 512


class InferenceEngine:
    """Pre-compiled fixed-batch-size inference over device-resident features.

    The serve step takes (params, arrays, question [B,14], img [B], valid [B])
    and returns (argmax label [B], sigmoid confidence [B]) — the same model
    path as eval (apply_regat train=False), minus targets.
    """

    def __init__(
        self,
        cfg: Config,
        ds: VQADataset,
        params: Any,
        batch_sizes: Tuple[int, ...] = (1, 8, 32),
    ):
        self.cfg = cfg
        self.ds = ds
        self.mesh = make_mesh(cfg.dp_size, cfg.tp_size)
        impl = resolve_impl(cfg)
        rep = replicated(self.mesh)
        include_adj = cfg.relation_type in ("semantic", "spatial")
        # Capacity policy (round-4 verdict item 5): prefer the REPLICATED
        # store (latency path — features resident in every local device's
        # HBM, zero cross-chip traffic per request). A split too big to
        # replicate falls back to the SHARDED store: tables partitioned over
        # the data axis, each request's images fetched by a masked local
        # gather + one ICI psum (build_sharded_image_gather) — a few-MB
        # all-reduce per request batch instead of an impossible upload. Only
        # if even the per-shard slice exceeds the budget do we fail, with
        # both numbers in the message.
        from tf_vqa_regat_tpu.data.device_store import estimate_nbytes
        from tf_vqa_regat_tpu.data.sharded_store import (
            ShardedDeviceStore,
            build_sharded_image_gather,
            estimate_sharded_nbytes,
        )
        from tf_vqa_regat_tpu.parallel.mesh import DATA_AXIS

        need = estimate_nbytes(ds, include_adj, cfg.feature_dtype)
        budget = int(cfg.device_store_budget_gb * 1e9)
        dp = self.mesh.shape[DATA_AXIS]
        self.store_mode = "replicated"
        if need > budget:
            # sharded mode keeps only SEMANTIC adjacency resident (spatial
            # builds in-jit from boxes — same convention as
            # resolve_data_mode, train/loop.py)
            sharded_adj = cfg.relation_type == "semantic"
            need_sharded = estimate_sharded_nbytes(
                ds, sharded_adj, cfg.feature_dtype, dp
            )
            if need_sharded > budget:
                if cfg.feature_dtype != "int8":
                    remedy = (
                        f"Use --feature_dtype int8 (replicated "
                        f"~{estimate_nbytes(ds, include_adj, 'int8')/1e9:.1f}"
                        f" GB, sharded ~{estimate_sharded_nbytes(ds, sharded_adj, 'int8', dp)/1e9:.1f}"
                        f" GB/shard), raise --device_store_budget_gb,"
                    )
                else:  # already the smallest dtype — only the budget helps
                    remedy = "Raise --device_store_budget_gb"
                raise ValueError(
                    f"serve: split {ds.name!r} at --feature_dtype "
                    f"{cfg.feature_dtype} needs ~{need/1e9:.1f} GB replicated "
                    f"and ~{need_sharded/1e9:.1f} GB/shard sharded over "
                    f"dp={dp}, but the device budget is "
                    f"{cfg.device_store_budget_gb:.1f} GB "
                    f"(--device_store_budget_gb). {remedy} serve on more "
                    f"chips, or serve a smaller split."
                )
            self.store_mode = "sharded"
        if self.store_mode == "sharded":
            self.store = ShardedDeviceStore(
                ds, self.mesh, cfg.relation_type == "semantic",
                cfg.feature_dtype, cfg.packed_cache,
            )
            img_meta = self.store.image_meta_arrays()
            gather_images = build_sharded_image_gather(
                self.mesh, cfg.resolved_num_rois()
            )
            arrays_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(DATA_AXIS)
            )
        else:
            self.store = DeviceStore(
                ds, rep, include_adj, cfg.feature_dtype, cfg.packed_cache
            )
            img_meta = gather_images = None
            arrays_sharding = rep
        self.params = put_global_tree(params, rep)
        # image_id -> image index over the loaded split
        self.img_index = {
            int(i): int(x)
            for i, x in zip(ds.entries.image_ids, ds.entries.image_index)
        }
        self.max_q_len = ds.entries.q_tokens.shape[1]
        R = cfg.resolved_num_rois()
        num_rois = R

        def serve_step(params, arrays, question, img, valid):
            if img_meta is not None:  # sharded tables: global-id lookup
                n_box = jnp.where(
                    valid, jnp.minimum(img_meta["img_len"][img], num_rois), 0
                )
                features, norm_bb, bb, adj = gather_images(
                    arrays, img_meta, img, n_box
                )
            else:
                n_box = jnp.where(
                    valid, jnp.minimum(arrays["img_len"][img], num_rois), 0
                )
                features, norm_bb, bb = gather_image_features(
                    arrays, img, n_box, num_rois
                )
                adj = None
                if "adj" in arrays:
                    from tf_vqa_regat_tpu.data.device_store import gather_adj

                    adj = gather_adj(arrays, img, num_rois, valid)
            batch = {
                "features": features,
                "norm_bb": norm_bb,
                "bb": bb,
                "question": question,
                "num_boxes": n_box,
                "valid": valid,
            }
            if adj is not None:
                batch["adj_label"] = adj
            logits = apply_regat(
                params, cfg, batch, ds.ntoken, train=False, impl=impl
            )
            best = jnp.argmax(logits, axis=-1)
            conf = jax.nn.sigmoid(
                jnp.take_along_axis(logits, best[:, None], axis=-1)[:, 0]
            )
            return best.astype(jnp.int32), conf.astype(jnp.float32)

        # The batch dim is NOT sharded in either store mode, so batch-1
        # works on any mesh; only the table sharding differs (replicated =
        # latency path, sharded = capacity path).
        self.batch_sizes = tuple(sorted(set(batch_sizes)))
        self._step = jax.jit(
            serve_step,
            in_shardings=(None, arrays_sharding, rep, rep, rep),
            out_shardings=rep,
        )
        # Compile + warm every batch size now — first request pays nothing.
        for B in self.batch_sizes:
            q = jnp.zeros((B, self.max_q_len), jnp.int32)
            i = jnp.zeros((B,), jnp.int32)
            v = jnp.zeros((B,), bool)
            jax.block_until_ready(self._step(self.params, self.store.arrays, q, i, v))

    def _encode(self, text: str) -> List[int]:
        """Tokenize against the MODEL's vocab snapshot: the TF-IDF init may
        have extended the shared dictionary after the model was built
        (SURVEY §3.5), so remap any post-snapshot token id to the OOV row
        (ntoken-1, the reference's word2idx.get default) and the current
        padding id to the snapshot padding id."""
        d = self.ds.dictionary
        snap = self.ds.ntoken
        toks = encode_question(d, text, self.max_q_len)
        return [
            self.ds.padding_idx
            if t == d.padding_idx
            else (t if t < snap else snap - 1)
            for t in toks
        ]

    def infer(
        self, questions: List[str], image_ids: List[int]
    ) -> List[Dict[str, Any]]:
        """Tokenize, pad to the smallest compiled batch size, run, decode."""
        n = len(questions)
        out: List[Dict[str, Any]] = []
        lo = 0
        while lo < n:
            # smallest compiled size that fits the REMAINING items, so an
            # oversized client batch's tail runs the small program (a 1-item
            # tail after a 32-chunk pads to 1, not 32)
            left = n - lo
            B = next(
                (b for b in self.batch_sizes if b >= left), self.batch_sizes[-1]
            )
            chunk_q = questions[lo : lo + B]
            chunk_i = image_ids[lo : lo + B]
            m = len(chunk_q)
            lo += m
            toks = np.full((B, self.max_q_len), self.ds.padding_idx, np.int32)
            img = np.zeros((B,), np.int32)
            valid = np.zeros((B,), bool)
            errs: List[Optional[str]] = [None] * m
            for j, (text, iid) in enumerate(zip(chunk_q, chunk_i)):
                idx = self.img_index.get(int(iid))
                if idx is None:
                    errs[j] = f"unknown image_id {iid}"
                    continue
                toks[j] = self._encode(text)
                img[j] = idx
                valid[j] = True
            best, conf = self._step(
                self.params, self.store.arrays, jnp.asarray(toks),
                jnp.asarray(img), jnp.asarray(valid),
            )
            # ONE fetch for both outputs: each device_get is a full tunnel
            # round trip (~27 ms) — fetching them separately doubled the
            # batch-1 request latency (PERF_NOTES serve row).
            best, conf = jax.device_get((best, conf))
            for j in range(m):
                if errs[j] is not None:
                    out.append({"error": errs[j]})
                else:
                    out.append(
                        {
                            "answer": self.ds.label2ans[int(best[j])],
                            "confidence": float(conf[j]),
                        }
                    )
        return out


class MicroBatcher:
    """Coalesce concurrent requests into one forward pass.

    Requests queue; a worker drains up to the largest compiled batch size,
    waiting at most `max_delay_ms` for stragglers once the first request of
    a batch arrives. Callers get a Future resolved with their single result.
    """

    def __init__(self, engine: InferenceEngine, max_delay_ms: float = 5.0):
        self.engine = engine
        self.max_delay = max_delay_ms / 1000.0
        self.max_batch = max(engine.batch_sizes)
        self._q: "queue.Queue" = queue.Queue()
        self._stop = False
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, question: str, image_id: int) -> Future:
        fut: Future = Future()
        # The lock makes (check _stop, enqueue) atomic against close()'s
        # (set _stop, enqueue sentinel): a submit that wins the lock enqueues
        # BEFORE the sentinel, so the worker still serves it; one that loses
        # fails fast instead of parking the Future until the handler's 60 s
        # timeout (an unlocked check was TOCTOU-racy).
        with self._submit_lock:
            if self._stop:
                fut.set_exception(RuntimeError("server is shutting down"))
                return fut
            self._q.put((question, image_id, fut))
        return fut

    def close(self):
        with self._submit_lock:
            self._stop = True
            self._q.put(None)
        self._worker.join(timeout=5)

    def _run(self):
        # Loop until the SENTINEL, not on _stop: submit() guarantees a
        # request enqueued before close()'s sentinel is still served, so the
        # worker must drain the queue up to the sentinel even after _stop is
        # already set (checking _stop here abandoned pre-sentinel requests
        # whose Futures then hit the handler's 60 s timeout).
        sentinel = False
        while not sentinel:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            # wait up to max_delay for more, up to the compiled max
            import time as _time

            deadline = _time.monotonic() + self.max_delay
            while len(batch) < self.max_batch:
                budget = deadline - _time.monotonic()
                if budget <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=budget)
                except queue.Empty:
                    break
                if nxt is None:
                    sentinel = True  # serve the batch in hand, then exit
                    break
                batch.append(nxt)
            try:
                results = self.engine.infer(
                    [b[0] for b in batch], [b[1] for b in batch]
                )
                for (_, _, fut), res in zip(batch, results):
                    fut.set_result(res)
            except Exception as e:  # pragma: no cover — surfaced to callers
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)


def make_server(
    cfg: Config, ds: VQADataset, params: Any, port: int = 0
) -> Tuple[ThreadingHTTPServer, MicroBatcher]:
    """Build (not start) the HTTP server; port 0 = ephemeral (tests)."""
    engine = InferenceEngine(
        cfg, ds, params,
        batch_sizes=tuple(
            int(x) for x in cfg.serve_batch_sizes.split(",") if x.strip()
        ),
    )
    batcher = MicroBatcher(engine, cfg.serve_max_delay_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(
                    200,
                    {
                        "status": "ok",
                        "model": f"{cfg.relation_type}-{cfg.fusion}",
                        "split": ds.name,
                        "store": engine.store_mode,
                        "batch_sizes": list(engine.batch_sizes),
                        "num_answers": ds.num_ans,
                    },
                )
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                return self._json(404, {"error": "not found"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
            except Exception:
                return self._json(400, {"error": "invalid JSON"})
            if not isinstance(req, (dict, list)):
                # a scalar body (5, true, "abc") is valid JSON but not a
                # request; without this it crashed the handler at len(items)
                return self._json(
                    400, {"error": "expected a JSON object or array"}
                )
            single = isinstance(req, dict)
            items = [req] if single else req
            # Cap the client batch: every item funnels through the single
            # MicroBatcher worker in max_batch chunks, so one huge request
            # would starve concurrent requests past the 60 s Future timeout
            # into 500s (round-2 advisor finding). 512 items is ~16 chunks
            # at the default sizes — well inside the timeout.
            if not single and len(items) > MAX_CLIENT_BATCH:
                return self._json(
                    400,
                    {
                        "error": f"batch too large ({len(items)} items; "
                        f"max {MAX_CLIENT_BATCH}) — split the request"
                    },
                )
            # validate the WHOLE request before the first submit: a
            # malformed item mid-list otherwise 400s the client while the
            # already-enqueued items still run abandoned inference on the
            # device, delaying concurrent micro-batches (review finding)
            try:
                parsed = [
                    (str(it["question"]), int(it["image_id"])) for it in items
                ]
            except (KeyError, TypeError, ValueError):
                return self._json(
                    400, {"error": "each item needs question + image_id"}
                )
            futs = [batcher.submit(q, i) for q, i in parsed]
            try:
                results = [f.result(timeout=60) for f in futs]
            except Exception as e:  # engine failure / batcher shutdown
                return self._json(500, {"error": f"inference failed: {e}"})
            if single:
                # per-item failures (e.g. unknown image_id) are 404 on the
                # single-request form; the batch form stays 200 with
                # per-item {"error": ...} entries
                code = 404 if "error" in results[0] else 200
                return self._json(code, results[0])
            self._json(200, results)

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    return server, batcher


def run_server(cfg: Config, ds: VQADataset, params: Any, logger) -> None:
    server, batcher = make_server(cfg, ds, params, cfg.serve_port)
    logger.write(
        f"serving {cfg.relation_type}-{cfg.fusion} on "
        f"http://127.0.0.1:{server.server_address[1]} "
        f"(batch sizes {cfg.serve_batch_sizes}, split {ds.name})"
    )
    try:
        server.serve_forever()
    finally:
        batcher.close()
        # release the bound socket: an embedding process (tests, notebooks)
        # re-binding the same --serve_port otherwise hits EADDRINUSE
        # (review finding)
        server.server_close()
