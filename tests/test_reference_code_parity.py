"""Parity against the reference's ACTUAL code (not a mirror).

The reference's torch model files import cleanly without Lightning/Hydra,
so this test instantiates the real `HSTU` encoder from
/root/reference/src (sequential_encoders/hstu.py:521-672), copies its
state_dict into our flax encoder through the cli/convert_ckpt weight map,
and runs both on the same ragged inputs. Passing means the convert-ckpt
path and the encoder math are verified against the genuine article —
metric parity then reduces to data/eval-protocol parity (covered by the
dataset and metric golden tests).
"""

import os
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

_REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference checkout not available"
)
if os.path.isdir(_REF) and _REF not in sys.path:
    sys.path.insert(0, _REF)


def test_encoder_matches_real_reference_hstu(rng):
    from generative_recommenders_pl.models.sequential_encoders.hstu import (
        HSTU as RefHSTU,
    )

    from mygenerativerecommenders_tpu.cli.convert_ckpt import (
        torch_state_dict_to_params,
    )
    from mygenerativerecommenders_tpu.models.hstu import HSTU as OurHSTU

    d, n_hist, n_out, blocks = 16, 24, 6, 2
    n = n_hist + n_out
    torch.manual_seed(0)
    ref = RefHSTU(
        max_sequence_len=n_hist,
        max_output_len=n_out,
        embedding_dim=d,
        item_embedding_dim=d,
        num_blocks=blocks,
        num_heads=1,
        linear_dim=d,
        attention_dim=d,
        normalization="rel_bias",
        linear_config="uvqk",
        linear_activation="silu",
        linear_dropout_rate=0.0,
        attn_dropout_rate=0.0,
        enable_relative_attention_bias=True,
    ).eval()

    ours = OurHSTU(
        max_sequence_len=n_hist,
        max_output_len=n_out,
        embedding_dim=d,
        num_blocks=blocks,
        num_heads=1,
        linear_dim=d,
        attention_dim=d,
        use_pallas=False,
    )

    # shared ragged inputs: embeddings zeroed at invalid positions
    b = 4
    lengths = rng.integers(2, n_hist, size=b).astype(np.int64)
    ts = np.zeros((b, n), dtype=np.int64)
    emb = rng.normal(size=(b, n, d)).astype(np.float32)
    valid = np.zeros((b, n, 1), dtype=np.float32)
    for i, ln in enumerate(lengths):
        ts[i, :ln] = np.sort(rng.integers(10**5, 10**6, size=ln))
        valid[i, :ln] = 1.0
    emb = emb * valid

    with torch.no_grad():
        ref_out, _ = ref(
            past_lengths=torch.tensor(lengths),
            user_embeddings=torch.tensor(emb),
            valid_mask=torch.tensor(valid),
            past_payloads={"timestamps": torch.tensor(ts)},
        )

    # weights: real reference state_dict -> our params via the convert map
    state = {f"sequence_encoder.{k}": v for k, v in ref.state_dict().items()}
    import jax.numpy as jnp

    init_params = ours.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(emb),
        jnp.asarray(valid),
        {"timestamps": jnp.asarray(ts.astype(np.int32))},
    )
    # the convert map addresses encoder leaves as "encoder/block_i/...";
    # wrap the standalone module's params accordingly
    mapped_inner = torch_state_dict_to_params(
        state, {"encoder": init_params["params"]}
    )["encoder"]
    mapped = {"params": mapped_inner}
    # every encoder leaf must have come from the reference state_dict
    # (guard against silently keeping initialization)
    flat_init = jax.tree_util.tree_leaves(init_params)
    flat_mapped = jax.tree_util.tree_leaves(mapped)
    changed = sum(
        float(np.abs(np.asarray(a) - np.asarray(m)).max()) > 0
        for a, m in zip(flat_init, flat_mapped)
    )
    assert changed >= 4 * blocks  # uvqk, o/kernel(+bias), pos_w, ts_w per block

    our_out = ours.apply(
        mapped,
        jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(emb),
        jnp.asarray(valid),
        {"timestamps": jnp.asarray(ts.astype(np.int32))},
        deterministic=True,
    )
    ref_np = ref_out.numpy()
    our_np = np.asarray(our_out)
    # compare on valid positions (the reference leaves padded rows at the
    # raw jagged-roundtrip values; ours zeroes them)
    mask = valid.astype(bool)[..., 0]
    np.testing.assert_allclose(
        our_np[mask], ref_np[mask], rtol=2e-4, atol=2e-5
    )


def test_loss_matches_real_reference_sampled_softmax(rng):
    """Our dense+weights sampled-softmax == the reference's jagged loss
    (losses/autoregressive_losses.py:249-306), fed identical fixed
    negatives through a deterministic stub sampler."""
    import jax.numpy as jnp

    from generative_recommenders_pl.models.losses.autoregressive_losses import (
        SampledSoftmaxLoss as RefLoss,
    )
    from generative_recommenders_pl.models.negatives_samples.negative_sampler import (
        NegativesSampler as RefSamplerBase,
    )
    from generative_recommenders_pl.models.similarity.dot_product import (
        DotProductSimilarity as RefDot,
    )

    from mygenerativerecommenders_tpu.models.losses import sampled_softmax_loss
    from mygenerativerecommenders_tpu.models.postprocessors import l2_normalize

    n_jagged, d, r, t = 37, 12, 8, 0.05
    out_emb = rng.normal(size=(n_jagged, d)).astype(np.float32)
    sup_emb = rng.normal(size=(n_jagged, d)).astype(np.float32)
    sup_ids = rng.integers(1, 50, size=n_jagged).astype(np.int64)
    weights = (rng.random(n_jagged) < 0.8).astype(np.float32)
    neg_ids = rng.integers(1, 50, size=(n_jagged, r)).astype(np.int64)
    neg_ids[0, :3] = sup_ids[0]  # force accidental hits
    neg_emb_raw = rng.normal(size=(n_jagged, r, d)).astype(np.float32)

    class StubSampler(RefSamplerBase):
        def debug_str(self):
            return "stub"

        def process_batch(self, ids, presences, embeddings):
            pass

        def forward(self, positive_ids, num_to_sample):
            return (
                torch.tensor(neg_ids),
                self.normalize_embeddings(torch.tensor(neg_emb_raw)),
            )

    ref_loss = RefLoss(num_to_sample=r, softmax_temperature=t)
    sampler = StubSampler(l2_norm=True, l2_norm_eps=1e-6)
    with torch.no_grad():
        ref_val = ref_loss.jagged_forward(
            output_embeddings=torch.tensor(out_emb),
            supervision_ids=torch.tensor(sup_ids),
            supervision_embeddings=torch.tensor(sup_emb),
            supervision_weights=torch.tensor(weights),
            negatives_sampler=sampler,
            similarity=RefDot(),
        ).item()

    # ours, dense form over [1, N'] with the same fixed negatives
    pos_n = l2_normalize(jnp.asarray(sup_emb))[None]
    neg_n = l2_normalize(jnp.asarray(neg_emb_raw))[None]
    q = jnp.asarray(out_emb)[None]
    pos_logits = (q * pos_n).sum(-1) / t
    neg_logits = jnp.einsum("btd,btrd->btr", q, neg_n) / t
    hits = jnp.asarray(sup_ids)[None, :, None] == jnp.asarray(neg_ids)[None]
    ours = float(
        sampled_softmax_loss(
            pos_logits, neg_logits, hits, jnp.asarray(weights)[None]
        )
    )
    np.testing.assert_allclose(ours, ref_val, rtol=1e-5)


def test_preprocessor_matches_real_reference(rng):
    """Positional preprocessor vs the real reference module
    (preprocessors/learnable_positional_embedding.py:42-58)."""
    import jax.numpy as jnp

    from generative_recommenders_pl.models.preprocessors.learnable_positional_embedding import (  # noqa: E501
        LearnablePositionalEmbeddingInputFeaturesPreprocessor as RefPre,
    )

    from mygenerativerecommenders_tpu.models.preprocessors import (
        LearnablePositionalEmbeddingPreprocessor,
    )

    b, n, d = 3, 20, 16
    torch.manual_seed(0)
    ref = RefPre(max_sequence_len=n, embedding_dim=d, dropout_rate=0.0).eval()

    lengths = rng.integers(2, n, size=b).astype(np.int64)
    ids = np.zeros((b, n), dtype=np.int64)
    for i, ln in enumerate(lengths):
        ids[i, :ln] = rng.integers(1, 99, size=ln)
    emb = rng.normal(size=(b, n, d)).astype(np.float32)

    with torch.no_grad():
        _, ref_user, ref_valid, _ = ref(
            past_lengths=torch.tensor(lengths),
            past_ids=torch.tensor(ids),
            past_embeddings=torch.tensor(emb),
            past_payloads={},
        )

    ours = LearnablePositionalEmbeddingPreprocessor(
        max_sequence_len=n, embedding_dim=d, dropout_rate=0.0
    )
    params = ours.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(emb),
        {},
    )
    # copy the reference's position table in
    pos_w = ref._pos_emb.weight.detach().numpy()
    params = {
        "params": {
            **params["params"],
            "pos_emb": jnp.asarray(pos_w),
        }
    }
    _, our_user, our_valid, _, _ = ours.apply(
        params,
        jnp.asarray(lengths.astype(np.int32)),
        jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(emb),
        {},
        deterministic=True,
    )
    np.testing.assert_allclose(
        np.asarray(our_user), ref_user.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(our_valid)[..., 0], ref_valid.numpy()[..., 0]
    )


def test_topk_matches_real_reference_candidate_index(rng):
    """Filtered brute-force top-k vs the reference's CandidateIndex
    over-fetch + mask path (indexing/candidate_index.py:107-164)."""
    from generative_recommenders_pl.models.indexing.candidate_index import (
        CandidateIndex,
    )
    from generative_recommenders_pl.models.indexing.top_k import (
        MIPSBruteForceTopK,
    )

    from mygenerativerecommenders_tpu.ops.topk import mips_top_k

    x, d, b, k, n0 = 60, 8, 5, 7, 6
    cat_ids = np.arange(1, x + 1, dtype=np.int64)
    cat_emb = rng.normal(size=(x, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)
    invalid = rng.choice(cat_ids, size=(b, n0), replace=True).astype(np.int64)
    invalid[:, 0] = 0  # padding slots must be ignored

    index = CandidateIndex(
        k=k,
        ids=torch.tensor(cat_ids),
        top_k_module=MIPSBruteForceTopK(),
        embeddings=torch.tensor(cat_emb)[None, :, :],
    )
    with torch.no_grad():
        ref_ids, ref_scores = index.get_top_k_outputs(
            query_embeddings=torch.tensor(queries),
            k=k,
            invalid_ids=torch.tensor(invalid),
        )

    our_ids, our_scores = mips_top_k(
        queries, cat_emb, cat_ids.astype(np.int32), k=k,
        invalid_ids=invalid.astype(np.int32), max_item_id=x,
    )
    np.testing.assert_array_equal(np.asarray(our_ids), ref_ids.numpy())
    np.testing.assert_allclose(
        np.asarray(our_scores), ref_scores.numpy(), rtol=1e-5
    )


def test_bce_loss_reference_is_unrunnable_and_ours_follows_its_equations(rng):
    """The real BCELoss (autoregressive_losses.py:41-113) CRASHES with
    DotProductSimilarity: it indexes `similarity(...)[0]`, which assumes
    the tuple return of dot_product.py's batch-1 branch, but its positive
    logits call lands in the [N',1,D] bmm branch that returns a raw
    tensor — `[0].squeeze(1)` then IndexErrors. No reference config uses
    BCE, so this is a latent reference bug; we assert the crash (so a
    reference fix would surface here) and check our implementation
    against the loss's written equations instead."""
    import jax.numpy as jnp

    from generative_recommenders_pl.models.losses.autoregressive_losses import (
        BCELoss as RefBCE,
    )
    from generative_recommenders_pl.models.negatives_samples.negative_sampler import (
        NegativesSampler as RefSamplerBase,
    )
    from generative_recommenders_pl.models.similarity.dot_product import (
        DotProductSimilarity as RefDot,
    )

    from mygenerativerecommenders_tpu.models.losses import bce_loss
    from mygenerativerecommenders_tpu.models.postprocessors import l2_normalize

    n_jagged, d, t = 29, 10, 0.05
    out_emb = rng.normal(size=(n_jagged, d)).astype(np.float32)
    sup_emb = rng.normal(size=(n_jagged, d)).astype(np.float32)
    sup_ids = rng.integers(1, 40, size=n_jagged).astype(np.int64)
    weights = (rng.random(n_jagged) < 0.8).astype(np.float32)
    neg_ids = rng.integers(1, 40, size=(n_jagged, 1)).astype(np.int64)
    neg_ids[2, 0] = sup_ids[2]  # force an accidental hit
    neg_emb_raw = rng.normal(size=(n_jagged, 1, d)).astype(np.float32)

    class StubSampler(RefSamplerBase):
        def debug_str(self):
            return "stub"

        def process_batch(self, ids, presences, embeddings):
            pass

        def forward(self, positive_ids, num_to_sample):
            return (
                torch.tensor(neg_ids),
                self.normalize_embeddings(torch.tensor(neg_emb_raw)),
            )

    with torch.no_grad(), pytest.raises(IndexError):
        RefBCE(temperature=t).jagged_forward(
            output_embeddings=torch.tensor(out_emb),
            supervision_ids=torch.tensor(sup_ids),
            supervision_embeddings=torch.tensor(sup_emb),
            supervision_weights=torch.tensor(weights),
            negatives_sampler=StubSampler(l2_norm=True, l2_norm_eps=1e-6),
            similarity=RefDot(),
        )

    # ours vs the written equations (mean of pos/neg BCE, hit rows dropped
    # from numerator and denominator)
    pos_n = l2_normalize(jnp.asarray(sup_emb))
    neg_n = l2_normalize(jnp.asarray(neg_emb_raw))
    q = jnp.asarray(out_emb)
    pos_logits = (q * pos_n).sum(-1) / t
    neg_logits = jnp.einsum("td,trd->tr", q, neg_n)[..., 0] / t
    hits_np = np.asarray(sup_ids) == np.asarray(neg_ids)[:, 0]
    ours = float(
        bce_loss(
            pos_logits[None], neg_logits[None], jnp.asarray(hits_np)[None],
            jnp.asarray(weights)[None],
        )
    )
    import torch.nn.functional as F

    lw = torch.tensor(weights) * torch.tensor((~hits_np).astype(np.float32))
    expected = (
        (
            F.binary_cross_entropy_with_logits(
                torch.tensor(np.asarray(pos_logits)),
                torch.ones(n_jagged), reduction="none",
            )
            + F.binary_cross_entropy_with_logits(
                torch.tensor(np.asarray(neg_logits)),
                torch.zeros(n_jagged), reduction="none",
            )
        )
        * lw * 0.5
    ).sum() / lw.sum()
    np.testing.assert_allclose(ours, float(expected), rtol=1e-5)


def test_ce_rating_loss_matches_real_reference(rng):
    """Multiclass rating CE vs the real CERatingLoss
    (autoregressive_losses.py:164-246)."""
    import jax.numpy as jnp

    from generative_recommenders_pl.models.losses.autoregressive_losses import (
        CERatingLoss as RefCE,
    )
    from generative_recommenders_pl.models.negatives_samples.negative_sampler import (
        LocalNegativesSampler as RefLocal,
    )
    from generative_recommenders_pl.models.similarity.dot_product import (
        DotProductSimilarity as RefDot,
    )

    from mygenerativerecommenders_tpu.models.losses import ce_rating_loss
    from mygenerativerecommenders_tpu.models.postprocessors import l2_normalize

    n_jagged, d, num_ratings, t = 23, 10, 6, 0.05
    out_emb = rng.normal(size=(n_jagged, d)).astype(np.float32)
    rating_emb = rng.normal(size=(num_ratings, d)).astype(np.float32)
    ratings = rng.integers(0, num_ratings, size=n_jagged).astype(np.int64)
    weights = (rng.random(n_jagged) < 0.8).astype(np.float32)

    # only normalize_embeddings is used from the sampler here
    class NormOnly(RefLocal):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self._l2_norm, self._l2_norm_eps = True, 1e-6

    with torch.no_grad():
        ref_val = RefCE(temperature=t).jagged_forward(
            output_embeddings=torch.tensor(out_emb),
            supervision_embeddings=torch.tensor(rating_emb),
            supervision_weights=torch.tensor(weights),
            supervision_ratings=torch.tensor(ratings),
            negatives_sampler=NormOnly(),
            similarity=RefDot(),
        ).item()

    rat_n = l2_normalize(jnp.asarray(rating_emb))
    logits = (jnp.asarray(out_emb) @ rat_n.T / t)[None]  # [1, N', R]
    ours = float(
        ce_rating_loss(
            logits, jnp.asarray(ratings)[None], jnp.asarray(weights)[None]
        )
    )
    np.testing.assert_allclose(ours, ref_val, rtol=1e-5)


def test_decode_cache_matches_real_reference(rng):
    """Incremental decode vs the reference's delta_x_offsets/HSTUCacheState
    cached attention (hstu.py:131, 266-423) — VERDICT r3 item 4.

    The reference's cache machinery assumes a FIXED jagged layout between
    calls (index_copy_ into the cached jagged v and the padded q/k
    buffers), so the driver here prefills with full-length rows
    (past_lengths = N for every row: x_offsets stay [0, N, 2N, ...] and
    jagged == flattened-dense). Positions beyond the frontier hold
    garbage but are causally masked for every live query; the new token
    at position p is index_copy'd over its garbage q/k/v before its
    attention row is computed, exactly the delta-path semantics. Three
    tokens are decoded one at a time (heads=2, dqk=8 != dv=12) through
    the GENUINE reference preprocessor/encoder/postprocessor with the
    fork's item+year embedding table, and each step's postprocessed
    row must match our prefill + decode_step with converted weights.

    Timestamp convention: query row i reads ext[i+1] (the NEXT token's
    timestamp, hstu.py:112-123); at decode time the next token is
    unknown, so the new token's own timestamp is used — mirrored on the
    reference side by also writing it at position p+1 (the same
    convention features.py:55-57 uses when it scatters the target
    timestamp at position `length` during training).
    """
    import jax.numpy as jnp

    import generative_recommenders_pl.models.embeddings.embeddings as ref_emb_mod
    from generative_recommenders_pl.models.postprocessors.postprocessors import (
        L2NormEmbeddingPostprocessor as RefPost,
    )
    from generative_recommenders_pl.models.preprocessors.learnable_positional_embedding import (  # noqa: E501
        LearnablePositionalEmbeddingInputFeaturesPreprocessor as RefPre,
    )
    from generative_recommenders_pl.models.sequential_encoders.hstu import (
        HSTU as RefHSTU,
    )

    from mygenerativerecommenders_tpu.cli.convert_ckpt import (
        torch_state_dict_to_params,
    )
    from mygenerativerecommenders_tpu.configs import Config, resolve
    from mygenerativerecommenders_tpu.models.decode import decode_step, prefill
    from mygenerativerecommenders_tpu.models.model import build_model
    from mygenerativerecommenders_tpu.utils.features import (
        seq_features_from_batch,
    )

    vocab = 100
    year_map = {i: (i % 50) + 1 for i in range(1, vocab + 1)}
    # the reference's module-level item->year dict (embeddings.py:12-18);
    # reco_dataset and LocalEmbeddingModule share this object
    ref_emb_mod.item2year.clear()
    ref_emb_mod.item2year.update(year_map)

    d, h, dqk, dv, blocks = 16, 2, 8, 12, 2
    n_hist, n_out, steps = 24, 6, 3
    n = n_hist + n_out
    b = 3

    torch.manual_seed(0)
    ref_embeddings = ref_emb_mod.LocalEmbeddingModule(
        num_items=vocab, item_embedding_dim=d
    )
    ref_pre = RefPre(max_sequence_len=n, embedding_dim=d, dropout_rate=0.0).eval()
    ref_enc = RefHSTU(
        max_sequence_len=n_hist,
        max_output_len=n_out,
        embedding_dim=d,
        item_embedding_dim=d,
        num_blocks=blocks,
        num_heads=h,
        attention_dim=dqk,
        linear_dim=dv,
        normalization="rel_bias",
        linear_config="uvqk",
        linear_activation="silu",
        linear_dropout_rate=0.0,
        attn_dropout_rate=0.0,
        enable_relative_attention_bias=True,
    ).eval()
    ref_post = RefPost(embedding_dim=d, eps=1e-6)

    # shared inputs
    lengths = rng.integers(4, n_hist - 2, size=b).astype(np.int64)
    ids = np.zeros((b, n_hist), dtype=np.int64)
    ts = np.zeros((b, n_hist), dtype=np.int64)
    for i, ln in enumerate(lengths):
        ids[i, :ln] = rng.integers(1, vocab + 1, size=ln)
        ts[i, :ln] = np.sort(rng.integers(10**5, 10**6, size=ln))
    new_ids = rng.integers(1, vocab + 1, size=(steps, b)).astype(np.int64)
    new_ts = (ts.max(axis=1)[None, :] + 100 * (1 + np.arange(steps))[:, None]).astype(
        np.int64
    )

    # ---- ours: converted weights, prefill + decode_step ----
    cfg = Config()
    cfg.data.max_sequence_length = n_hist
    cfg.model.gr_output_length = n_out - 1
    cfg.model.item_embedding_dim = d
    cfg.model.encoder.num_blocks = blocks
    cfg.model.encoder.num_heads = h
    cfg.model.encoder.attention_dim = dqk
    cfg.model.encoder.linear_dim = dv
    cfg.model.encoder.use_pallas = "false"
    cfg.model.embedding.kind = "item_year"
    resolve(cfg, vocab)
    year_of_item = [year_map.get(i, 0) for i in range(vocab + 1)]
    model = build_model(cfg, year_of_item=year_of_item)

    batch = {
        "lengths": lengths.astype(np.int32),
        "ids": ids.astype(np.int32),
        "ratings": np.ones((b, n_hist), dtype=np.int32),
        "timestamps": ts.astype(np.int32),
        "target_id": new_ids[0].astype(np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": new_ts[0].astype(np.int32),
    }
    seq, _, _ = seq_features_from_batch(batch, n_out)
    init_params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, seq
    )
    state = {}
    for prefix, module in (
        ("embeddings", ref_embeddings),
        ("preprocessor", ref_pre),
        ("sequence_encoder", ref_enc),
    ):
        for k, v in module.state_dict().items():
            state[f"{prefix}.{k}"] = v
    params = torch_state_dict_to_params(state, init_params["params"])
    params = {"params": params}

    _, cache = prefill(model, params, seq)

    # ---- reference: full-length-layout prefill, then 3 delta calls ----
    full_lengths = torch.full((b,), n, dtype=torch.int64)
    ids_buf = torch.zeros((b, n), dtype=torch.int64)
    ids_buf[:, :n_hist] = torch.tensor(ids)
    ts_buf = torch.zeros((b, n), dtype=torch.int64)
    ts_buf[:, :n_hist] = torch.tensor(ts)
    # prefill timestamp layout == ours (target ts scattered at `length`)
    ts_buf[torch.arange(b), torch.tensor(lengths)] = torch.tensor(new_ts[0])

    with torch.no_grad():
        emb_buf = ref_embeddings.get_item_embeddings(ids_buf)
        _, x_dense, _, _ = ref_pre(
            past_lengths=full_lengths,
            past_ids=ids_buf,
            past_embeddings=emb_buf,
            past_payloads={},
        )
        _, ref_cache = ref_enc(
            past_lengths=full_lengths,
            user_embeddings=x_dense,
            valid_mask=None,
            past_payloads={"timestamps": ts_buf},
            return_cache_states=True,
        )

        pos_w = ref_pre._pos_emb.weight
        for t in range(steps):
            p = torch.tensor(lengths) + t  # [b] new-token positions
            g = torch.tensor(new_ids[t])
            nts = torch.tensor(new_ts[t])
            ids_buf[torch.arange(b), p] = g
            ts_buf[torch.arange(b), p] = nts
            # the "next token" slot mirrors our own-timestamp convention
            ts_buf[torch.arange(b), torch.clamp(p + 1, max=n - 1)] = nts
            new_x = ref_embeddings.get_item_embeddings(g) * (d**0.5) + pos_w[p]
            x_dense[torch.arange(b), p] = new_x
            flat = (torch.arange(b) * n + p).to(torch.int64)
            y, ref_cache = ref_enc(
                past_lengths=full_lengths,
                user_embeddings=x_dense,
                valid_mask=None,
                past_payloads={"timestamps": ts_buf},
                delta_x_offsets=(flat, p),
                cache=ref_cache,
                return_cache_states=True,
            )
            ref_out = ref_post(y[torch.arange(b), p]).numpy()

            ours_out, cache = decode_step(
                model,
                params,
                cache,
                jnp.asarray(new_ids[t], dtype=jnp.int32),
                jnp.asarray(new_ts[t], dtype=jnp.int32),
            )
            np.testing.assert_allclose(
                np.asarray(ours_out), ref_out, rtol=2e-4, atol=2e-5,
                err_msg=f"decode step {t}",
            )


def test_muon_update_matches_real_reference(rng):
    """Step the GENUINE reference Muon (optimizers/muon.py:42-86) and our
    optax port on identical params/grads for 4 steps and compare the
    parameter trajectories — VERDICT r3 item 8. Tall + wide params
    exercise the NS-5 transpose branch; both sides run NS-5 in bfloat16,
    so the tolerance is bf16-appropriate. (No 1-D params: the reference
    asserts ndim >= 2 — the split rule routes those to AdamW — while our
    port passes them through as SGD-momentum.)"""
    import jax.numpy as jnp
    import optax

    from generative_recommenders_pl.models.optimizers.muon import Muon as RefMuon

    from mygenerativerecommenders_tpu.train.optimizers import muon

    shapes = [(8, 12), (16, 4)]
    params0 = [rng.normal(size=s).astype(np.float32) for s in shapes]
    grads = [
        [rng.normal(size=s).astype(np.float32) for s in shapes]
        for _ in range(4)
    ]

    t_params = [torch.nn.Parameter(torch.tensor(p)) for p in params0]
    ref_opt = RefMuon(t_params, lr=0.02, weight_decay=0.01, momentum=0.95)
    for g in grads:
        for p, gi in zip(t_params, g):
            p.grad = torch.tensor(gi)
        ref_opt.step()

    tx = muon(
        learning_rate=0.02, momentum=0.95, nesterov=True, ns_steps=5,
        weight_decay=0.01,
    )
    jp = [jnp.asarray(p) for p in params0]
    state = tx.init(jp)
    for g in grads:
        updates, state = tx.update([jnp.asarray(x) for x in g], state, jp)
        jp = optax.apply_updates(jp, updates)

    for ours, ref, s in zip(jp, t_params, shapes):
        np.testing.assert_allclose(
            np.asarray(ours), ref.detach().numpy(), rtol=3e-2, atol=3e-3,
            err_msg=f"muon param {s}",
        )


@pytest.mark.parametrize(
    "norm_ref,norm_ours,shape,unconstrained",
    [
        ("Auto", "auto", (8, 12), True),
        ("Auto", "auto", (9,), True),
        ("Spectral", "spectral", (16, 4), False),
        ("ColNorm", "col", (8, 12), True),
        ("RowNorm", "row", (8, 12), True),
        ("Sign", "sign", (6, 10), True),
        ("BiasRMS", "bias_rms", (11,), False),
    ],
)
def test_scion_update_matches_real_reference(
    rng, norm_ref, norm_ours, shape, unconstrained
):
    """Step the GENUINE reference Scion (optimizers/scion.py:215-269) and
    our optax port on identical params/grads for 4 steps, across the norm
    LMO family and both constrained modes — VERDICT r3 item 8."""
    import jax.numpy as jnp
    import optax

    from generative_recommenders_pl.models.optimizers.scion import Scion as RefScion

    from mygenerativerecommenders_tpu.train.optimizers import scion

    params0 = rng.normal(size=shape).astype(np.float32)
    grads = [rng.normal(size=shape).astype(np.float32) for _ in range(4)]

    t_param = torch.nn.Parameter(torch.tensor(params0))
    ref_opt = RefScion(
        [t_param], lr=0.05, momentum=0.1, norm=norm_ref, scale=1.5,
        unconstrained=unconstrained,
    )
    for g in grads:
        t_param.grad = torch.tensor(g)
        ref_opt.step()

    tx = scion(
        learning_rate=0.05, momentum=0.1, norm=norm_ours, scale=1.5,
        unconstrained=unconstrained, ns_steps=5,
    )
    jp = [jnp.asarray(params0)]
    state = tx.init(jp)
    for g in grads:
        updates, state = tx.update([jnp.asarray(g)], state, jp)
        jp = optax.apply_updates(jp, updates)

    # NS-5 runs in bf16 on both sides and its quintic has slope ~3.4 at
    # zero, amplifying input rounding by up to ~3.4^5 on small singular
    # directions — per-update diffs of a few percent are inherent and
    # accumulate additively across steps (measured max 2.5e-2 over 4
    # steps of cumulative-update magnitude ~0.3). The non-NS norms are
    # exact fp32 arithmetic and must match tightly.
    tol = (
        dict(rtol=3e-2, atol=4e-2)
        if norm_ref in ("Auto", "Spectral") and len(shape) >= 2
        else dict(rtol=1e-5, atol=1e-6)
    )
    np.testing.assert_allclose(
        np.asarray(jp[0]), t_param.detach().numpy(), **tol
    )
