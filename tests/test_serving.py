"""Serving layer: engine packing, HTTP endpoints, request coalescing.

Runs a tiny model on the CPU backend with an in-process HTTP server on an
ephemeral port; clients are stdlib urllib. The reference has no serving
story at all (predict is offline CSV, scripts/predict.py) — these tests
pin the new capability's contract.
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import Config, resolve
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.serving.service import (
    RecommenderHTTPServer,
    ServingEngine,
)
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

MAX_ID = 60


def _engine(batch_size=4):
    cfg = Config()
    cfg.data.max_sequence_length = 16
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, MAX_ID)
    model = build_model(cfg)
    batch = {
        "lengths": np.array([3], dtype=np.int32),
        "ids": np.zeros((1, 16), dtype=np.int32),
        "ratings": np.zeros((1, 16), dtype=np.int32),
        "timestamps": np.zeros((1, 16), dtype=np.int32),
        "target_id": np.zeros(1, dtype=np.int32),
        "target_rating": np.zeros(1, dtype=np.int32),
        "target_timestamp": np.zeros(1, dtype=np.int32),
    }
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        seq,
        method=model.init_all,
    )
    all_ids = np.arange(1, MAX_ID + 1, dtype=np.int32)
    return ServingEngine(
        model, params, cfg, all_ids, MAX_ID, batch_size=batch_size
    )


@pytest.fixture(scope="module")
def engine():
    return _engine()


@pytest.fixture(scope="module")
def server(engine):
    srv = RecommenderHTTPServer(engine, "127.0.0.1", 0).start()
    yield srv
    srv.stop()


def _post(server, path, payload):
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_engine_retrieve_filters_history(engine):
    seqs = [[1, 2, 3], [4, 5, 6, 7]]
    ids, scores = engine.retrieve(seqs, k=10)
    assert len(ids) == 2 and len(ids[0]) == 10
    assert all(1 <= i <= MAX_ID for row in ids for i in row)
    for seq, row in zip(seqs, ids):
        assert not set(seq) & set(row)  # past ids filtered from top-k
    for row in scores:
        assert all(row[i] >= row[i + 1] for i in range(len(row) - 1))


def test_engine_truncates_long_sequences(engine):
    long = list(range(1, MAX_ID)) * 2  # far beyond max_len=16
    ids, _ = engine.retrieve([long], k=5)
    assert len(ids[0]) == 5


def test_engine_rejects_bad_requests(engine):
    with pytest.raises(ValueError):
        engine.retrieve([])
    with pytest.raises(ValueError):
        engine.retrieve([[]])
    with pytest.raises(ValueError):
        engine.retrieve([[1, 2]] * 99)  # > batch_size
    with pytest.raises(ValueError):
        engine.retrieve([[1, 2]], timestamps=[[5]])  # ragged ts
    with pytest.raises(ValueError):
        engine.generate([[1, 2]], mode="nope")
    with pytest.raises(ValueError):
        engine.generate([[1, 2]], steps=999)


def test_engine_generate_modes(engine):
    seqs = [[1, 2, 3], [9, 10]]
    greedy = engine.generate(seqs, steps=3, mode="greedy")
    assert np.asarray(greedy).shape == (2, 3)
    # deterministic: same request twice -> same ids
    assert greedy == engine.generate(seqs, steps=3, mode="greedy")
    # beam width 1 == greedy
    assert greedy == engine.generate(seqs, steps=3, mode="beam", num_beams=1)
    sampled = engine.generate(seqs, steps=3, mode="sample", seed=7)
    assert np.asarray(sampled).shape == (2, 3)
    assert all(1 <= i <= MAX_ID for row in sampled for i in row)


def test_http_healthz(server):
    with urllib.request.urlopen(
        f"http://{server.host}:{server.port}/healthz"
    ) as resp:
        body = json.loads(resp.read())
    assert resp.status == 200 and body["status"] == "ok"
    assert body["catalog_size"] == MAX_ID


def test_http_retrieve_matches_engine(server, engine):
    payload = {"sequences": [[1, 2, 3], [4, 5]], "k": 5}
    status, body = _post(server, "/v1/retrieve", payload)
    assert status == 200
    want_ids, want_scores = engine.retrieve([[1, 2, 3], [4, 5]], k=5)
    assert body["ids"] == want_ids
    np.testing.assert_allclose(body["scores"], want_scores, rtol=1e-6)


def test_http_generate(server):
    status, body = _post(
        server, "/v1/generate",
        {"sequences": [[1, 2, 3]], "steps": 2, "mode": "greedy"},
    )
    assert status == 200
    assert np.asarray(body["ids"]).shape == (1, 2)


def test_http_errors(server):
    status, body = _post(server, "/v1/retrieve", {"sequences": []})
    assert status == 400 and "error" in body
    status, body = _post(
        server, "/v1/generate", {"sequences": [[1]], "mode": "bogus"}
    )
    assert status == 400 and "error" in body
    status, _ = _post(server, "/v1/nope", {})
    assert status == 404


def test_http_single_row_coalescing(server, engine):
    """Concurrent single-row requests share device calls and all succeed."""
    results = [None] * 6
    want, _ = engine.retrieve([[1, 2, 3]], k=4)

    def one(i):
        status, body = _post(
            server, "/v1/retrieve", {"sequences": [[1, 2, 3]], "k": 4}
        )
        results[i] = (status, body)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for status, body in results:
        assert status == 200
        assert body["ids"] == [want[0]]


def test_engine_quantized_retrieval_and_generate():
    """index.quantize=int8: retrieve pre-ranks on int8 rows + exact
    re-score; generate stays on the exact rows carried in the
    QuantizedCatalog. Results match the exact engine bit-for-bit at
    full over-fetch on this tiny catalog."""
    exact = _engine()
    quant = _engine()
    quant.cfg.model.index.quantize = "int8"
    quant.cfg.model.index.rescore_over_fetch = 8
    # rebuild the jitted programs under the quantized config
    quant.__init__(
        quant.model, quant.params, quant.cfg, quant.all_item_ids,
        quant.max_item_id, batch_size=4,
    )
    seqs = [[1, 2, 3], [7, 5], [4], [9, 9, 9, 9]]
    ids_a, scores_a = exact.retrieve(seqs)
    ids_b, scores_b = quant.retrieve(seqs)
    assert ids_a == ids_b
    np.testing.assert_allclose(np.asarray(scores_a), np.asarray(scores_b), rtol=1e-5)
    gen_a = exact.generate(seqs, steps=2, mode="greedy")
    gen_b = quant.generate(seqs, steps=2, mode="greedy")
    assert gen_a == gen_b


def test_engine_sharded_index_matches_replicated():
    """A sharded-table engine (index.sharded via the trainer mesh) serves
    the same top-k as the replicated engine for identical weights."""
    from mygenerativerecommenders_tpu.parallel.mesh import make_mesh

    cfg = Config()
    cfg.data.max_sequence_length = 16
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    cfg.model.embedding.kind = "sharded_a2a"
    cfg.model.embedding.num_shards = 2
    resolve(cfg, MAX_ID)
    mesh = make_mesh(data=4, model=2)
    model = build_model(cfg)
    batch = {
        "lengths": np.array([3], dtype=np.int32),
        "ids": np.zeros((1, 16), dtype=np.int32),
        "ratings": np.zeros((1, 16), dtype=np.int32),
        "timestamps": np.zeros((1, 16), dtype=np.int32),
        "target_id": np.zeros(1, dtype=np.int32),
        "target_rating": np.zeros(1, dtype=np.int32),
        "target_timestamp": np.zeros(1, dtype=np.int32),
    }
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    with jax.sharding.set_mesh(mesh):
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            seq, method=model.init_all,
        )
        all_ids = np.arange(1, MAX_ID + 1, dtype=np.int32)
        sharded = ServingEngine(
            model, params, cfg, all_ids, MAX_ID, batch_size=4, mesh=mesh
        )
        import copy

        cfg_rep = copy.deepcopy(cfg)
        cfg_rep.model.index.sharded = "false"
        replicated = ServingEngine(
            model, params, cfg_rep, all_ids, MAX_ID, batch_size=4
        )
        seqs = [[3, 9, 27], [5]]
        ids_s, scores_s = sharded.retrieve(seqs, k=5)
        ids_r, scores_r = replicated.retrieve(seqs, k=5)
    assert ids_s == ids_r
    np.testing.assert_allclose(scores_s, scores_r, rtol=1e-5)
