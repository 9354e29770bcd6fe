from mygenerativerecommenders_tpu.ops.sequence import (
    lengths_to_mask,
    get_current_embeddings,
    scatter_at_lengths,
    mask_dense_by_aux_mask,
    compact_by_mask,
)

__all__ = [
    "lengths_to_mask",
    "get_current_embeddings",
    "scatter_at_lengths",
    "mask_dense_by_aux_mask",
    "compact_by_mask",
]
