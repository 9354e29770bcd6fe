"""Full-model forward parity vs an independent PyTorch mirror.

Builds the flax model (embed -> positional preproc -> 2 HSTU blocks ->
L2 postproc), copies its exact weights into a torch implementation
written directly from the reference equations (hstu.py:134-205, 266-423;
learnable_positional_embedding.py:42-58; postprocessors.py:34-55), and
compares outputs on a ragged batch. This is the cross-framework
equivalent of running the reference with converted weights — if this
matches, metric parity reduces to data/eval-protocol parity (covered by
the dataset and metric golden tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import Config, resolve
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_mirror_forward(params, batch, cfg, n_total):
    """Reference-equation torch forward with the flax weights."""
    p = params["params"]
    d = cfg.model.item_embedding_dim
    ids = torch.tensor(np.asarray(batch["ids"]), dtype=torch.long)
    b, l = ids.shape
    pad = n_total - l
    ids = torch.cat([ids, torch.zeros((b, pad), dtype=torch.long)], dim=1)
    ts = torch.tensor(np.asarray(batch["timestamps"]), dtype=torch.long)
    ts = torch.cat([ts, torch.zeros((b, pad), dtype=torch.long)], dim=1)
    lengths = torch.tensor(np.asarray(batch["lengths"]), dtype=torch.long)
    tgt_ts = torch.tensor(np.asarray(batch["target_timestamp"]), dtype=torch.long)
    ts.scatter_(1, lengths.view(-1, 1), tgt_ts.view(-1, 1))

    item_table = torch.tensor(np.asarray(p["embeddings"]["item_emb"]))
    emb = item_table[ids]  # [B, N, D]

    pos_emb = torch.tensor(np.asarray(p["preprocessor"]["pos_emb"]))
    x = emb * (d**0.5) + pos_emb[None, : ids.shape[1], :]
    valid = (ids != 0).float().unsqueeze(-1)
    x = x * valid

    n = ids.shape[1]
    tril = torch.tril(torch.ones(n, n))
    ext = torch.cat([ts, ts[:, -1:]], dim=1)
    delta = ext[:, 1:, None] - ext[:, None, :-1]
    bucket = (
        (torch.log(delta.abs().clamp(min=1).float()) / 0.301).long().clamp(0, 128)
    )
    i = torch.arange(n).view(-1, 1)
    j = torch.arange(n).view(1, -1)
    pos_gather = (j - i + n - 1).clamp(0, 2 * n - 2)

    for blk_name in ("block_0", "block_1"):
        blk = p["encoder"][blk_name]
        x = x * valid
        nx = F.layer_norm(x, (d,), eps=1e-6)
        uvqk = torch.tensor(np.asarray(blk["uvqk"]))
        proj = F.silu(nx @ uvqk)
        u, v, q, k = proj.split([d, d, d, d], dim=-1)
        pos_w = torch.tensor(np.asarray(blk["rel_bias_pos_w"]))
        ts_w = torch.tensor(np.asarray(blk["rel_bias_ts_w"]))
        bias = pos_w[pos_gather][None] + ts_w[bucket]
        attn = F.silu(torch.einsum("bnd,bmd->bnm", q, k) + bias) / n
        attn = attn * tril
        av = torch.einsum("bnm,bmd->bnd", attn, v)
        o_w = torch.tensor(np.asarray(blk["o"]["kernel"]))
        o_b = torch.tensor(np.asarray(blk["o"]["bias"]))
        x = (u * F.layer_norm(av, (d,), eps=1e-6)) @ o_w + o_b + x
    x = x * valid
    return (x / x.norm(dim=-1, keepdim=True).clamp(min=1e-6)).numpy()


def test_full_forward_matches_torch_mirror(rng):
    cfg = Config()
    cfg.data.max_sequence_length = 24
    cfg.model.item_embedding_dim = 16
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, 120)
    model = build_model(cfg)

    b, l = 4, 24
    lengths = rng.integers(2, l - 1, size=b).astype(np.int32)
    ids = np.zeros((b, l), dtype=np.int32)
    ts = np.zeros((b, l), dtype=np.int32)
    for i, n in enumerate(lengths):
        ids[i, :n] = rng.integers(1, 120, size=n)
        ts[i, :n] = np.sort(rng.integers(10**5, 10**6, size=n))
    batch = {
        "lengths": lengths,
        "ids": ids,
        "ratings": np.ones((b, l), dtype=np.int32),
        "timestamps": ts,
        "target_id": rng.integers(1, 120, size=b).astype(np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": (ts.max(axis=1) + 50).astype(np.int32),
    }
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, seq
    )
    ours, _ = model.apply(params, seq, deterministic=True)
    ours = np.asarray(ours)

    n_total = cfg.data.max_sequence_length + cfg.model.gr_output_length + 1
    theirs = _torch_mirror_forward(params, batch, cfg, n_total)

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
