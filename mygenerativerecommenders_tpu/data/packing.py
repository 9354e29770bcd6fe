"""Sequence packing: fixed-shape [P, L] batches with multiple sequences
laid end-to-end per row.

The TPU-idiomatic analog of the reference's jagged [sum(N_i), D] layout
(sequential_encoders/hstu.py:439-480): instead of one sequence per
padded row (where a 20-token history still pays a 128-row attention
tile), each row packs several SEGMENTS — one training example each:
its history followed by the target as the final token — so padding
shrinks to the per-row endcap. Attention goes block-diagonal via a
`seg_ids` payload (ops/hstu_attention.py), positional embeddings read a
`positions` payload (within-segment offsets), and supervision weights
zero at segment boundaries (train/task_retrieval.py packed path). One
compiled XLA program covers every batch (unlike length bucketing's
program-per-capacity), which also keeps the multi-step scan stacking
uniform.

Loss semantics: the set of supervised (position, target) pairs is
IDENTICAL to the unpacked path for the same examples — packing changes
only which rows share a matmul. With loss.shared_negatives the loss is
numerically equal batch-for-batch (tests/test_packing.py); with
per-position negative draws the RNG stream differs (same distribution).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from mygenerativerecommenders_tpu.data.dataset import SequenceDataset


def pack_rows(seg_lens: np.ndarray, capacity: int) -> np.ndarray:
    """Next-fit packing: row index per segment, in stream order.

    Next-fit (close a row when the next segment does not fit) keeps the
    example stream order — so a shuffled epoch stays shuffled — at an
    expected endcap waste of about half a mean segment per row. Returns
    [S] int64 row ids (non-decreasing)."""
    rows = np.zeros(len(seg_lens), dtype=np.int64)
    row, used = 0, 0
    for i, l in enumerate(seg_lens):
        if used + l > capacity:
            row += 1
            used = 0
        rows[i] = row
        used += l
    return rows


def pack_rows_best_fit(seg_lens: np.ndarray, capacity: int) -> np.ndarray:
    """Best-fit packing: each segment goes to the open row with the
    SMALLEST remaining capacity that still fits (bisect over sorted
    remainders, O(S log R)) — measured ~95%+ utilization vs next-fit's
    ~75-85% on uniform ml-1m-like length mixes. Rows are not
    stream-ordered; the emitter sorts per-batch entries by row (stable,
    preserving arrival order within a row). Returns [S] int64 row ids."""
    import bisect

    rem: list = []  # sorted (remaining_capacity, row_id)
    rows = np.empty(len(seg_lens), dtype=np.int64)
    n_rows = 0
    for i, l in enumerate(seg_lens):
        li = int(l)
        j = bisect.bisect_left(rem, (li, -1))
        if j == len(rem):
            r = n_rows
            n_rows += 1
            rest = capacity - li
        else:
            rrem, r = rem.pop(j)
            rest = rrem - li
        rows[i] = r
        if rest > 0:
            bisect.insort(rem, (rest, r))
    return rows


class PackedBatchLoader:
    """Packs a SequenceDataset's examples into fixed-shape batches.

    Emits dict batches with keys: ids / ratings / timestamps / positions
    / seg_ids [P, L] int32 (seg_ids -1 at padding, positions restart at 0
    per segment; the target is each segment's LAST token), lengths [P]
    (total packed tokens per row, for the attention kernels' tile
    skipping), and num_segments [P] (for throughput accounting).

    CAPACITY CLASSES (`capacities`, ascending): each example is assigned
    to the smallest capacity >= its segment length and packed with its
    class — "packing inside buckets". Short segments then ride rows
    whose width keeps the O(row_len)- and O(row_len^2)-shaped costs
    (bias-table gradients, dzh) small, while rare long segments get the
    wide rows they need. One compiled program per class (row count per
    class scales as ~tokens_per_batch / capacity, so batches carry
    roughly constant work). A single capacity degenerates to plain
    packing.

    Multi-host: like BatchLoader's bucketed mode, the packing is computed
    on the GLOBAL shuffled stream (same permutation on every process, no
    coordination) into global batches of rows_per_batch * process_count
    rows; each process takes its strided rows. Shapes are static and the
    class partition is global, so batch counts and shapes agree across
    processes by construction.
    """

    def __init__(
        self,
        dataset: SequenceDataset,
        rows_per_batch: int,
        row_capacity: int,
        shuffle: bool = False,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        capacities=None,  # ascending list; None -> [row_capacity]
        row_multiple: int = 1,  # per-batch row counts rounded up to this
        segments_per_batch=None,  # target EXAMPLES per batch (any class)
        include_target: bool = True,  # False = EVAL packing (see below)
    ):
        """include_target=False packs HISTORY-ONLY segments (no inline
        target token) for the eval/predict path and additionally emits
        per-SEGMENT fields sized [S_cap] (a static per-capacity-class
        bound computed from the epoch-0 plan; eval never shuffles, so
        every epoch reuses that plan):

          seg_last_flat    [S_cap] flat (row*cap + col) index of each
                           segment's LAST token (the retrieval query)
          seg_target       [S_cap] held-out target id (0 = padding slot)
          seg_weight       [S_cap] 1.0 for real segments, 0 = pad slot
          seg_invalid_ids  [S_cap, cap] the segment's own ids, 0-padded
                           (the per-query top-k filter list — packed
                           rows must NOT filter by their neighbors' ids)
        """
        self.dataset = dataset
        self.rows_per_batch = rows_per_batch
        self.row_capacity = row_capacity
        self.capacities = sorted(capacities) if capacities else [row_capacity]
        m = max(1, row_multiple)
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.include_target = include_target
        self.epoch = 0

        ds = dataset
        u, l_hist = ds.ids.shape
        # both modes reserve one slot past the history: train puts the
        # TARGET there; eval puts an inert id-0 token carrying the target
        # TIMESTAMP (the attention's next-item timestamp for the query
        # position — the packed analog of the unpacked eval path's
        # target-timestamp scatter; an id-0 token has a zero embedding
        # and sits after the query causally, so it contributes nothing)
        self.seg_lens = ds.lengths.astype(np.int64) + 1
        if int(self.seg_lens.max(initial=0)) > self.capacities[-1]:
            raise ValueError(
                f"pack row_capacity {self.capacities[-1]} < longest segment "
                f"{int(self.seg_lens.max())} (history + target)"
            )
        self._class_of = np.searchsorted(
            np.asarray(self.capacities), self.seg_lens
        )
        # per-class rows per batch. With `segments_per_batch`, EVERY class
        # emits batches of about that many examples (the training-
        # semantics-preserving choice: batch composition matches the
        # unpacked batch_size, and wide classes get enough rows to
        # amortize the per-call row-width-shaped fixed costs — the
        # bias-gradient machinery is O(row_len^2) but batch-independent).
        # Otherwise fall back to constant tokens per batch.
        self.rows_of = {}
        for ci, cap in enumerate(self.capacities):
            if segments_per_batch:
                sel = self._class_of == ci
                mean_seg = (
                    float(self.seg_lens[sel].mean()) if sel.any() else cap
                )
                rows = int(np.ceil(segments_per_batch * mean_seg / cap))
            else:
                rows = int(round(rows_per_batch * self.capacities[-1] / cap))
            self.rows_of[cap] = -(-max(1, rows) // m) * m
        if not segments_per_batch:
            self.rows_of[self.capacities[-1]] = -(-rows_per_batch // m) * m
        # [U, L+1] token tables with the target as the final segment token
        # (the packed analog of scatter_at_lengths on device)
        def ext(hist: np.ndarray, target: np.ndarray) -> np.ndarray:
            out = np.zeros((u, l_hist + 1), dtype=np.int32)
            out[:, :l_hist] = hist
            out[np.arange(u), ds.lengths] = target
            return out

        if include_target:
            self._ids_ext = ext(ds.ids, ds.target_id)
            self._ratings_ext = ext(ds.ratings, ds.target_rating)
        else:
            pad1 = lambda t: np.pad(t.astype(np.int32), ((0, 0), (0, 1)))
            self._ids_ext = pad1(ds.ids)
            self._ratings_ext = pad1(ds.ratings)
        self._ts_ext = ext(ds.timestamps, ds.target_timestamp)
        self._plans: Dict[int, List[np.ndarray]] = {}
        if not include_target:
            # static per-class segment-slot bound from the (deterministic)
            # plan: eval iterates the same plan every epoch
            self.seg_cap = {}
            for cap, bp in self._plan(0):
                counts = np.bincount(
                    bp[:, 1] % max(1, process_count),
                    minlength=max(1, process_count),
                )
                self.seg_cap[cap] = max(
                    self.seg_cap.get(cap, 1), int(counts.max(initial=1))
                )
            # seg arrays shard over the mesh data axis like rows do
            for cap in self.seg_cap:
                self.seg_cap[cap] = -(-self.seg_cap[cap] // m) * m

    def _plan(self, epoch: int) -> List[tuple]:
        """Per-epoch packing plan: list of (capacity, rows, [S, 2] array
        of (example idx, global row within batch)) per batch."""
        if epoch in self._plans:
            return self._plans[epoch]
        rng = np.random.default_rng(self.seed + epoch) if self.shuffle else None
        order = np.arange(len(self.dataset))
        if rng is not None:
            rng.shuffle(order)
        batches = []
        for ci, cap in enumerate(self.capacities):
            members = order[self._class_of[order] == ci]
            if len(members) == 0:
                continue
            rows = pack_rows_best_fit(self.seg_lens[members], cap)
            gp = self.rows_of[cap] * self.process_count
            n_batches = int(rows.max() // gp + 1)
            for b in range(n_batches):
                sel = (rows >= b * gp) & (rows < (b + 1) * gp)
                batches.append(
                    (cap, np.stack([members[sel], rows[sel] - b * gp], axis=1))
                )
        if rng is not None and len(self.capacities) > 1:
            # shuffle CLASS order, keep same-shape batches adjacent (the
            # multi-step stacker needs same-shape runs); examples within
            # a class are already shuffled via `order`
            cap_rank = {c: i for i, c in enumerate(rng.permutation(self.capacities))}
            batches.sort(key=lambda t: cap_rank[t[0]])
        self._plans = {epoch: batches}  # keep one epoch only
        return batches

    def __len__(self) -> int:
        return len(self._plan(self.epoch))

    def _emit(self, cap: int, plan: np.ndarray) -> Dict[str, np.ndarray]:
        p, l_cap = self.rows_of[cap], cap
        pc, pi = self.process_count, self.process_index
        examples, grow = plan[:, 0], plan[:, 1]
        if pc > 1:
            mine = (grow % pc) == pi
            examples, grow = examples[mine], grow[mine] // pc
        if len(examples) == 0:  # tail batch with no rows for this process
            empty = {
                "ids": np.zeros((p, l_cap), dtype=np.int32),
                "ratings": np.zeros((p, l_cap), dtype=np.int32),
                "timestamps": np.zeros((p, l_cap), dtype=np.int32),
                "positions": np.zeros((p, l_cap), dtype=np.int32),
                "seg_ids": np.full((p, l_cap), -1, dtype=np.int32),
                "lengths": np.zeros(p, dtype=np.int32),
                "num_segments": np.zeros(p, dtype=np.int32),
            }
            if not self.include_target:
                s_cap = self.seg_cap[cap]
                empty.update(
                    seg_last_flat=np.zeros(s_cap, dtype=np.int32),
                    seg_target=np.zeros(s_cap, dtype=np.int32),
                    seg_weight=np.zeros(s_cap, dtype=np.float32),
                    seg_example=np.full(s_cap, -1, dtype=np.int32),
                    seg_invalid_ids=np.zeros((s_cap, l_cap), dtype=np.int32),
                )
            return empty
        # best-fit rows are not stream-ordered: group entries by row
        # (stable — arrival order within a row is preserved) so the
        # cumulative-offset logic below sees contiguous row runs
        order = np.argsort(grow, kind="stable")
        examples, grow = examples[order], grow[order]
        seg_lens = self.seg_lens[examples]
        total = int(seg_lens.sum())
        # per-token (row, col, example, within-segment position, segment)
        tok_ex = np.repeat(examples, seg_lens)
        tok_row = np.repeat(grow, seg_lens)
        starts = np.concatenate([[0], np.cumsum(seg_lens)[:-1]])
        tok_pos = np.arange(total, dtype=np.int64) - np.repeat(starts, seg_lens)
        # offset of each segment within its row = cumulative tokens of
        # earlier segments in the same (non-decreasing) row stream
        row_change = np.concatenate([[True], grow[1:] != grow[:-1]])
        row_start_tok = np.where(row_change, starts, 0)
        np.maximum.accumulate(row_start_tok, out=row_start_tok)
        offsets = starts - row_start_tok
        tok_col = tok_pos + np.repeat(offsets, seg_lens)
        seg_in_row = np.arange(len(examples)) - np.maximum.accumulate(
            np.where(row_change, np.arange(len(examples)), 0)
        )
        flat = tok_row * l_cap + tok_col

        def scatter(table: np.ndarray, fill: int = 0) -> np.ndarray:
            out = np.full(p * l_cap, fill, dtype=np.int32)
            out[flat] = table
            return out.reshape(p, l_cap)

        batch = {
            "ids": scatter(self._ids_ext[tok_ex, tok_pos]),
            "ratings": scatter(self._ratings_ext[tok_ex, tok_pos]),
            "timestamps": scatter(self._ts_ext[tok_ex, tok_pos]),
            "positions": scatter(tok_pos.astype(np.int32)),
            "seg_ids": scatter(np.repeat(seg_in_row, seg_lens).astype(np.int32), -1),
            "lengths": np.zeros(p, dtype=np.int32),
            "num_segments": np.zeros(p, dtype=np.int32),
        }
        np.add.at(batch["lengths"], tok_row, 1)
        np.add.at(batch["num_segments"], grow, 1)
        if not self.include_target:
            s_cap = self.seg_cap[cap]
            n_seg = len(examples)
            assert n_seg <= s_cap, (n_seg, s_cap)
            seg_last_flat = np.zeros(s_cap, dtype=np.int32)
            # the query = each segment's last HISTORY token (the final
            # slot is the inert target-timestamp carrier). Row indices
            # are GLOBAL under multi-host eval: the stitched [p*pc, L]
            # batch places process pi's rows at [pi*p, (pi+1)*p)
            # (make_array_from_process_local_data with a data-outermost
            # mesh — the same contiguous-shards layout _local_rows
            # assumes), while this process's flat gather must address
            # the jit-global encoded array.
            seg_last_flat[:n_seg] = (
                (pi * p + grow) * l_cap + offsets + np.maximum(seg_lens - 2, 0)
            ).astype(np.int32)
            seg_target = np.zeros(s_cap, dtype=np.int32)
            seg_target[:n_seg] = self.dataset.target_id[examples]
            seg_weight = np.zeros(s_cap, dtype=np.float32)
            seg_weight[:n_seg] = 1.0
            # dataset example index per segment (predict re-orders its
            # output back to dataset order; -1 = padding slot)
            seg_example = np.full(s_cap, -1, dtype=np.int32)
            seg_example[:n_seg] = examples.astype(np.int32)
            seg_invalid = np.zeros(s_cap * l_cap, dtype=np.int32)
            tok_seg = np.repeat(np.arange(n_seg, dtype=np.int64), seg_lens)
            seg_invalid[tok_seg * l_cap + tok_pos] = self._ids_ext[
                tok_ex, tok_pos
            ]
            batch.update(
                seg_last_flat=seg_last_flat,
                seg_target=seg_target,
                seg_weight=seg_weight,
                seg_example=seg_example,
                seg_invalid_ids=seg_invalid.reshape(s_cap, l_cap),
            )
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        plan = self._plan(self.epoch)
        self.epoch += 1
        for cap, batch_plan in plan:
            yield self._emit(cap, batch_plan)
