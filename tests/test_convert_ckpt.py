"""Checkpoint converter: reference-named torch state_dict -> flax params.

Builds a fake reference checkpoint with the exact module names the
reference emits (scripts/convert_ckpt.py's target namespace), converts,
and checks every mapped tensor landed (with the torch->flax transpose
for Linear kernels)."""

import numpy as np
import pytest

from mygenerativerecommenders_tpu.cli.convert_ckpt import torch_state_dict_to_params
from mygenerativerecommenders_tpu.configs import Config, resolve
from mygenerativerecommenders_tpu.models.model import build_model
from mygenerativerecommenders_tpu.utils.features import seq_features_from_batch

torch = pytest.importorskip("torch")


def test_convert_maps_all_hstu_params(rng):
    import jax

    cfg = Config()
    cfg.data.max_sequence_length = 16
    cfg.model.item_embedding_dim = 8
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, 50)
    model = build_model(cfg)
    b, l = 2, 16
    batch = {
        "lengths": np.ones(b, dtype=np.int32),
        "ids": np.ones((b, l), dtype=np.int32),
        "ratings": np.ones((b, l), dtype=np.int32),
        "timestamps": np.ones((b, l), dtype=np.int32),
        "target_id": np.ones(b, dtype=np.int32),
        "target_rating": np.ones(b, dtype=np.int32),
        "target_timestamp": np.ones(b, dtype=np.int32),
    }
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, seq
    )

    d = cfg.model.item_embedding_dim
    n_total = cfg.data.max_sequence_length + cfg.model.gr_output_length + 1
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    state = {"embeddings._item_emb.weight": t(51, d),
             "preprocessor._pos_emb.weight": t(n_total, d)}
    for i in range(2):
        base = f"sequence_encoder._hstu._attention_layers.{i}"
        state[f"{base}._uvqk"] = t(d, 4 * d)
        state[f"{base}._o.weight"] = t(d, d)
        state[f"{base}._o.bias"] = t(d)
        state[f"{base}._rel_attn_bias._pos_w"] = t(2 * n_total - 1)
        state[f"{base}._rel_attn_bias._ts_w"] = t(129)

    mapped = torch_state_dict_to_params(state, params["params"])

    np.testing.assert_array_equal(
        mapped["embeddings"]["item_emb"], state["embeddings._item_emb.weight"].numpy()
    )
    np.testing.assert_array_equal(
        mapped["preprocessor"]["pos_emb"], state["preprocessor._pos_emb.weight"].numpy()
    )
    blk = mapped["encoder"]["block_1"]
    base = "sequence_encoder._hstu._attention_layers.1"
    np.testing.assert_array_equal(blk["uvqk"], state[f"{base}._uvqk"].numpy())
    # torch Linear [out, in] -> flax kernel [in, out]
    np.testing.assert_array_equal(
        blk["o"]["kernel"], state[f"{base}._o.weight"].numpy().T
    )
    np.testing.assert_array_equal(blk["o"]["bias"], state[f"{base}._o.bias"].numpy())
    np.testing.assert_array_equal(
        blk["rel_bias_pos_w"], state[f"{base}._rel_attn_bias._pos_w"].numpy()
    )
    np.testing.assert_array_equal(
        blk["rel_bias_ts_w"], state[f"{base}._rel_attn_bias._ts_w"].numpy()
    )


def test_convert_shape_mismatch_raises(rng):
    import jax

    cfg = Config()
    cfg.data.max_sequence_length = 16
    cfg.model.item_embedding_dim = 8
    cfg.model.encoder.use_pallas = "false"
    resolve(cfg, 50)
    model = build_model(cfg)
    batch = {
        "lengths": np.ones(1, dtype=np.int32),
        "ids": np.ones((1, 16), dtype=np.int32),
        "ratings": np.ones((1, 16), dtype=np.int32),
        "timestamps": np.ones((1, 16), dtype=np.int32),
        "target_id": np.ones(1, dtype=np.int32),
        "target_rating": np.ones(1, dtype=np.int32),
        "target_timestamp": np.ones(1, dtype=np.int32),
    }
    seq, _, _ = seq_features_from_batch(batch, cfg.model.gr_output_length + 1)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, seq
    )
    state = {"embeddings._item_emb.weight": torch.randn(7, 3)}  # wrong shape
    with pytest.raises(ValueError, match="Shape mismatch"):
        torch_state_dict_to_params(state, params["params"])
