"""Every registered preset resolves and builds its model.

The analog of the reference's Hydra config-tree being exercised by its
experiment overlays (configs/experiment/*.yaml) — a preset that drifts
out of sync with the component configs should fail here, not at 40s of
train-step compile time.
"""

import numpy as np
import pytest

from mygenerativerecommenders_tpu.configs import max_seq_len, resolve
from mygenerativerecommenders_tpu.configs.presets import _REGISTRY, get_preset
from mygenerativerecommenders_tpu.models.model import build_model


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_preset_resolves_and_builds(name):
    cfg = get_preset(name)
    resolve(cfg, cfg.data.expected_max_item_id)
    model = build_model(cfg)
    assert model is not None
    assert max_seq_len(cfg) == (
        cfg.data.max_sequence_length + cfg.model.gr_output_length + 1
    )
    # dims resolved: 0-defaults filled from item_embedding_dim
    if cfg.model.encoder.kind == "hstu":
        assert cfg.model.encoder.attention_dim > 0
        assert cfg.model.encoder.linear_dim > 0


def test_long_preset_shape():
    cfg = get_preset("ml-20m-hstu-long")
    assert cfg.data.max_sequence_length == 1024
    assert cfg.model.encoder.num_blocks == 8
    assert cfg.model.encoder.num_heads == 2
