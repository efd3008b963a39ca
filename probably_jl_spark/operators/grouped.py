"""Grouped sketches built as streaming partition-local partials
(north_rule skew handling).

Per-group sketches (e.g. distinct conv_ids per tool, turn-length digest
per role) never materialize a group's rows. Stage 1 is a ``mapInPandas``
pass identical in shape to the global build (build.py): each input
partition keeps a ``{group-key -> sketch}`` dict, updates it per Arrow
batch with vectorized kernels, and emits one small *state* row per
(partition, key). Stage 2 shuffles only those serialized states (KBs per
group) and merges them per key — correct because every sketch merge is
commutative + associative (SURVEY.md §4.2).

Why this shape at 100 TB (VERDICT r01 "What's wrong #2"): the previous
``groupBy(key).applyInPandas`` loaded an entire group into one pandas
frame — a billion-row hot key was a straight executor OOM. Here a hot key
costs one sketch per partition, and rows never shuffle at all.

Skew/fan-in controls:

* ``max_states_per_partition`` bounds stage-1 memory on high-cardinality
  keys (per-user sketches): when the dict exceeds the cap, partials are
  flushed mid-partition and rebuilt — merges make that lossless.
* ``salt_buckets=S > 1`` bounds stage-2 fan-in on huge clusters: states
  first merge on ``(key, partition_id mod S)``, then the S survivors merge
  per key — two state shuffles, never row shuffles. (Row-level salting is
  obsolete in this design; ``salt_cols`` is accepted for API compatibility
  and ignored.)

Merges apply in ascending partition-id order, so grouped states are
deterministic across identical runs even for merge-order-sensitive kinds
(t-digest/KLL) — the checkpoint resume law (plans/checkpoint.py) depends
on this.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from .build import batch_arrays, plan_columns
from .specs import SketchSpec, merge_blobs

_SALT_COL = "__salt"
_ORD_COL = "__ord"  # min partition id feeding a state row: merge sort key
_NROWS_COL = "n_rows"


def _grouped_schema(
    df: DataFrame, group_cols: list[str], specs: list[SketchSpec], with_ord: bool = False
) -> StructType:
    fields = [df.schema[c] for c in group_cols]
    fields = [StructField(f.name, f.dataType) for f in fields]
    if with_ord:
        fields.append(StructField(_ORD_COL, LongType()))
    fields.append(StructField(_NROWS_COL, LongType()))
    fields += [StructField(s.state_col, BinaryType()) for s in specs]
    return StructType(fields)


def _partial_builder(specs: list[SketchSpec], group_cols: list[str], col_map: dict, cap: int):
    """mapInPandas fn: streaming per-partition {key -> sketch} partials,
    flushed when the dict exceeds `cap` keys (bounded memory)."""

    def rows_frame(states: dict, ord_key: int) -> pd.DataFrame:
        keys = list(states.keys())
        data = {c: [k[i] for k in keys] for i, c in enumerate(group_cols)}
        data[_ORD_COL] = [ord_key] * len(keys)
        data[_NROWS_COL] = [states[k][0] for k in keys]
        for s in specs:
            data[s.state_col] = [states[k][1][s.name].to_bytes() for k in keys]
        return pd.DataFrame(data)

    def fn(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        flush = 0  # ord = pid<<20 | flush: mid-partition flushes keep a
        # total deterministic merge order even for the same (key, pid)
        states: dict[tuple, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            arrays = batch_arrays(pdf, specs, col_map)
            groups = pdf.groupby(list(group_cols), dropna=False, sort=False).indices
            for key, idx in groups.items():
                kt = key if isinstance(key, tuple) else (key,)
                # normalize float-NaN key components to None: pandas hands
                # back a fresh NaN object per batch and (nan,) tuples never
                # compare equal, so without this every batch would open a
                # new dict entry for the NaN group and the per-key merge
                # order would ride on shuffle row order (ADVICE r2).
                # np.floating covers FloatType columns: np.float32 is NOT a
                # Python-float subclass (code-review r3)
                kt = tuple(
                    None if (isinstance(x, (float, np.floating)) and x != x) else x
                    for x in kt
                )
                ent = states.get(kt)
                if ent is None:
                    ent = states[kt] = [0, {s.name: s.new() for s in specs}]
                ent[0] += len(idx)
                for s in specs:
                    h, v, c = arrays[s.name]
                    s.update(
                        ent[1][s.name],
                        None if h is None else h[idx],
                        None if v is None else v[idx],
                        None if c is None else c[idx],
                    )
            if len(states) > cap:
                yield rows_frame(states, (pid << 20) | flush)
                flush += 1
                states = {}
        if states:
            yield rows_frame(states, (pid << 20) | flush)

    return fn


def _absorb_max(acc: np.ndarray, packed: np.ndarray) -> np.ndarray:
    """Merge a sorted unique-by-key packed batch into the sorted
    accumulator, register-max on key collisions — the searchsorted O(n)
    merge (same shape as sketches/mg.py _absorb, max instead of add)."""
    if acc.size == 0:
        return packed
    ak = acc >> np.int64(6)
    bk = packed >> np.int64(6)
    pos = np.searchsorted(ak, bk)
    safe = np.minimum(pos, ak.size - 1)
    match = ak[safe] == bk
    hit = pos[match]
    if hit.size:
        # equal key => comparing packed values compares rho directly
        # (setitem form: acc[hit] fancy-indexes a COPY, so out= would be lost)
        acc[hit] = np.maximum(acc[hit], packed[match])
    new = ~match
    if new.any():
        acc = np.insert(acc, pos[new], packed[new])
    return acc


_MASK24 = np.int64((1 << 24) - 1)


def _group_codes(pdf: pd.DataFrame, group_cols: list[str], keys_index):
    """(per-row global group codes, updated persistent key index). Batch
    keys factorize C-level; new keys join the index through one hash-join
    ``get_indexer`` probe — no per-row Python."""
    if len(group_cols) == 1:
        bl_codes, bl_uniques = pdf[group_cols[0]].factorize(use_na_sentinel=False)
        bl_uniques = pd.Index(bl_uniques)
    else:
        mi = pd.MultiIndex.from_frame(pdf[list(group_cols)])
        bl_codes, bl_uniques = mi.factorize(use_na_sentinel=False)
    if keys_index is None:
        return np.asarray(bl_codes, dtype=np.int64), bl_uniques
    lut = keys_index.get_indexer(bl_uniques)
    new = lut < 0
    if new.any():
        lut[new] = len(keys_index) + np.arange(int(new.sum()), dtype=np.int64)
        keys_index = keys_index.append(bl_uniques[new])
    return lut[bl_codes], keys_index


class _HllKernel:
    """Per-kind hooks for the shared vectorized grouped builders
    (`_vec_partial_builder` / `_vec_merge_builder`). The HLL accumulator
    is one sorted int64 array of ``(group_code << 24) | (register_idx
    << 6) | rho`` (idx needs <= 18 bits at p <= 18, rho <= 61 needs 6),
    merged with register-max dedup — 8 B per nonzero (group, register),
    so with sparse HLL states (sketches/hll.py) both accumulator and
    shuffled partials stay proportional to what the groups saw."""

    def __init__(self, specs: list[SketchSpec]):
        self.ps = {s.name: s.new().p for s in specs}

    @staticmethod
    def init_acc():
        return np.empty(0, dtype=np.int64)

    def row_payloads(self, spec, h: np.ndarray) -> np.ndarray:
        """Group-independent per-row payload (register_idx << 6 | rho):
        computed per batch, combined with group codes later — the direct
        route defers group-code assignment to amortize the key index."""
        from ..sketches.hashing import trailing_zeros64

        p = self.ps[spec.name]
        guard = np.uint64(1 << (64 - p))
        rho = trailing_zeros64(h | guard).astype(np.int64) + np.int64(1)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        return (idx << np.int64(6)) | rho

    def absorb_payloads(self, acc, spec, g: np.ndarray, pay: np.ndarray):
        from ..sketches.hll import _dedup_max_rho

        packed = (g << np.int64(24)) | pay
        packed.sort()
        return _absorb_max(acc, _dedup_max_rho(packed))

    def absorb_rows(self, acc, spec, g: np.ndarray, h: np.ndarray):
        return self.absorb_payloads(acc, spec, g, self.row_payloads(spec, h))

    def absorb_states(self, acc, spec, g: np.ndarray, blobs):
        from ..sketches.hll import _dedup_max_rho, packed_entries_many_from_bytes

        counts, ent = packed_entries_many_from_bytes(list(blobs))
        if not ent.size:
            return acc
        packed = (np.repeat(g, counts) << np.int64(24)) | ent.astype(np.int64)
        packed.sort()
        return _absorb_max(acc, _dedup_max_rho(packed))

    def emit_blobs(self, acc, spec, n: int) -> list:
        from ..sketches.hll import packed_entries_many_to_bytes

        bounds = np.searchsorted(acc >> np.int64(24), np.arange(n + 1))
        return packed_entries_many_to_bytes(
            self.ps[spec.name], (acc & _MASK24).astype(np.uint32), bounds
        )

    def emit_buf(self, acc, spec, n: int):
        from ..sketches.hll import packed_entries_many_to_buf

        bounds = np.searchsorted(acc >> np.int64(24), np.arange(n + 1))
        return packed_entries_many_to_buf(
            self.ps[spec.name], (acc & _MASK24).astype(np.uint32), bounds
        )


class _KmvKernel:
    """KMV hooks for the shared vectorized grouped builders: the
    accumulator is a (group_code int64, hash uint64) array pair in
    (group, hash) order, capped at the k smallest distinct hashes per
    group each fold (`_kmv_combine`) — unlike HLL's 24-bit payload the
    64-bit hash cannot share an int64 with the group code, so this kind
    lexsorts the pair instead of sorting one packed array."""

    def __init__(self, specs: list[SketchSpec]):
        self.ks = {s.name: s.new().k for s in specs}

    @staticmethod
    def init_acc():
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))

    def row_payloads(self, spec, h: np.ndarray) -> np.ndarray:
        return h

    def absorb_payloads(self, acc, spec, g: np.ndarray, pay: np.ndarray):
        return _kmv_combine(acc[0], acc[1], g, pay, self.ks[spec.name])

    def absorb_rows(self, acc, spec, g: np.ndarray, h: np.ndarray):
        return _kmv_combine(acc[0], acc[1], g, h, self.ks[spec.name])

    def absorb_states(self, acc, spec, g: np.ndarray, blobs):
        from ..sketches.kmv import mins_many_from_bytes

        counts, hh = mins_many_from_bytes(list(blobs))
        if not hh.size:
            return acc
        gg = np.repeat(g, counts)
        return _kmv_combine(acc[0], acc[1], gg, hh, self.ks[spec.name])

    def emit_blobs(self, acc, spec, n: int) -> list:
        from ..sketches.kmv import mins_many_to_bytes

        g_acc, h_acc = acc
        bounds = np.searchsorted(g_acc, np.arange(n + 1))
        return mins_many_to_bytes(self.ks[spec.name], h_acc, bounds)

    def emit_buf(self, acc, spec, n: int):
        from ..sketches.kmv import mins_many_to_buf

        g_acc, h_acc = acc
        bounds = np.searchsorted(g_acc, np.arange(n + 1))
        return mins_many_to_buf(self.ks[spec.name], h_acc, bounds)


def _kmv_combine(
    g_acc: np.ndarray, h_acc: np.ndarray, g: np.ndarray, h: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Fold (group, hash) pairs into the per-group k-min accumulator:
    lexsort by (group, hash), drop duplicate pairs, keep the k smallest
    hashes per group. Pure set function of the pairs seen — KMV's
    byte-exact commutative merge — so any batch slicing or merge order
    yields identical accumulators."""
    gg = np.concatenate([g_acc, g])
    hh = np.concatenate([h_acc, h])
    if gg.size == 0:
        return gg, hh
    order = np.lexsort((hh, gg))
    gg, hh = gg[order], hh[order]
    keep = np.empty(gg.size, dtype=bool)
    keep[0] = True
    keep[1:] = (gg[1:] != gg[:-1]) | (hh[1:] != hh[:-1])
    gg, hh = gg[keep], hh[keep]
    # rank within group = position minus the group's first position
    rank = np.arange(gg.size) - np.searchsorted(gg, gg)
    sel = rank < k
    return gg[sel], hh[sel]


_VEC_KERNELS = {"hll": _HllKernel, "kmv": _KmvKernel}


def _emit_state_rows(
    specs: list[SketchSpec],
    group_cols: list[str],
    kernel,
    keys_index,
    n_rows: np.ndarray,
    accs: dict,
    ord_key: int | None,
) -> pd.DataFrame:
    """One output row per group code from the kernel accumulators.
    Blob wrapping is vectorized too (`packed_entries_many_to_bytes` /
    `mins_many_to_bytes`: one flat buffer + C-level bytes slicing, ~0.5
    us/group vs ~5.6 scalar); the only remaining per-group work is
    proportional to OUTPUT rows, never input rows."""
    n = len(keys_index)
    if len(group_cols) == 1:
        out = pd.DataFrame({group_cols[0]: keys_index})
    else:
        out = keys_index.to_frame(index=False)
        out.columns = list(group_cols)
    if ord_key is not None:
        out[_ORD_COL] = ord_key
    out[_NROWS_COL] = n_rows[:n]
    for s in specs:
        out[s.state_col] = kernel.emit_blobs(accs[s.name], s, n)
    return out


def _vec_partial_builder(
    specs: list[SketchSpec], group_cols: list[str], col_map: dict, cap: int, kernel
):
    """Vectorized partial builder shared by the single-kind fast routes
    (kernels: `_HllKernel`, `_KmvKernel`): no per-group Python in the
    batch loop. Each batch factorizes its group keys (C-level), maps them
    to stable first-seen codes through a persistent
    ``pd.Index.get_indexer`` (hash join, C-level), and folds (code, hash)
    rows into the kernel's accumulator with one sort + one merge per
    batch regardless of group count. State emit and state decode are
    vectorized too (many-blob wire helpers in sketches/hll.py, kmv.py),
    so no stage of the route loops Python per group beyond a C-level
    bytes slice. Partials are byte-identical to the generic dict
    builder's — same flush points, same canonical wire — gated by
    test_grouped_hll_fast_path_byte_identical and its KMV twin.

    Why: the generic dict-of-sketches loop costs ~5-10 us of Python per
    (group, batch); at the north_star's distinct-tools-per-conv_id shape
    (~1e6 live groups per partition) that dominates the build."""

    def fn(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        flush = 0
        keys_index = None
        n_rows = np.empty(0, dtype=np.int64)
        accs = {s.name: kernel.init_acc() for s in specs}
        for pdf in batches:
            if not len(pdf):
                continue
            arrays = batch_arrays(pdf, specs, col_map)
            g, keys_index = _group_codes(pdf, group_cols, keys_index)
            if len(keys_index) > n_rows.size:
                n_rows = np.concatenate(
                    [n_rows, np.zeros(len(keys_index) - n_rows.size, dtype=np.int64)]
                )
            n_rows += np.bincount(g, minlength=n_rows.size)
            for s in specs:
                accs[s.name] = kernel.absorb_rows(accs[s.name], s, g, arrays[s.name][0])
            if len(keys_index) > cap:
                yield _emit_state_rows(
                    specs, group_cols, kernel, keys_index, n_rows, accs, (pid << 20) | flush
                )
                flush += 1
                keys_index = None
                n_rows = np.empty(0, dtype=np.int64)
                accs = {s.name: kernel.init_acc() for s in specs}
        if keys_index is not None and len(keys_index):
            yield _emit_state_rows(
                specs, group_cols, kernel, keys_index, n_rows, accs, (pid << 20) | flush
            )

    return fn


def _vec_merge_builder(specs: list[SketchSpec], group_cols: list[str], kernel):
    """Vectorized per-partition merge of state rows — replaces the
    per-key ``applyInPandas`` merge for single-kind HLL/KMV spec lists.
    Partials are hash-repartitioned on the group columns, so each group's
    rows land in exactly one partition; within the partition every blob
    decodes into the kernel accumulator and ALL groups merge in one pass.
    Safe precisely because these states are pure set functions with
    byte-exact commutative merges — row order within the partition cannot
    matter (order-sensitive kinds like t-digest must keep the ordered
    applyInPandas path). Blob decode is one vectorized parse over the
    joined STATE-row buffer per batch (many-blob wire helpers, ~0.5-2
    us/state row vs ~10 scalar), and state rows number one per group per
    upstream partition, not input rows."""

    def fn(batches):
        keys_index = None
        n_rows = np.empty(0, dtype=np.int64)
        accs = {s.name: kernel.init_acc() for s in specs}
        pend_uniq: list = []
        pend: list = []  # (codes, n_rows int64 array, {spec: blob sequence})
        pend_n = 0

        def consolidate():
            nonlocal keys_index, n_rows, pend_uniq, pend, pend_n
            if not pend_uniq:
                return
            parts = ([] if keys_index is None else [keys_index]) + pend_uniq
            combined = parts[0].append(parts[1:]) if len(parts) > 1 else parts[0]
            codes, keys_index = combined.factorize(use_na_sentinel=False)
            codes = np.asarray(codes, dtype=np.int64)
            offs = np.zeros(len(parts) + 1, dtype=np.int64)
            np.cumsum([len(u) for u in parts], out=offs[1:])
            base = 0 if len(parts) > len(pend_uniq) else -1  # skip keys_index slot
            if len(keys_index) > n_rows.size:
                n_rows = np.concatenate(
                    [n_rows, np.zeros(len(keys_index) - n_rows.size, dtype=np.int64)]
                )
            for i, (bl, nr, blobs) in enumerate(pend):
                g = codes[offs[base + i + 1] : offs[base + i + 2]][bl]
                # np.add.at keeps the row counts exact int64 (bincount
                # weights would round past 2^53 — a stated design case
                # for hot keys)
                np.add.at(n_rows, g, nr)
                for s in specs:
                    accs[s.name] = kernel.absorb_states(accs[s.name], s, g, blobs[s.name])
            pend_uniq, pend, pend_n = [], [], 0

        # same deferred-consolidation shape as _vec_direct_builder (one
        # factorize per ~_FOLD_ROWS state rows instead of an Index
        # rebuild per batch); state-blob references pin at most a
        # _FOLD_ROWS-row window of input batches.
        for pdf in batches:
            if not len(pdf):
                continue
            if len(group_cols) == 1:
                bl_codes, bl_uniques = pdf[group_cols[0]].factorize(use_na_sentinel=False)
                bl_uniques = pd.Index(bl_uniques)
            else:
                mi = pd.MultiIndex.from_frame(pdf[list(group_cols)])
                bl_codes, bl_uniques = mi.factorize(use_na_sentinel=False)
            pend_uniq.append(bl_uniques)
            pend.append(
                (
                    np.asarray(bl_codes, dtype=np.int64),
                    pdf[_NROWS_COL].to_numpy(dtype=np.int64),
                    {s.name: pdf[s.state_col] for s in specs},
                )
            )
            pend_n += len(pdf)
            if pend_n >= _FOLD_ROWS:
                consolidate()
        consolidate()
        if keys_index is not None and len(keys_index):
            yield _emit_state_rows(specs, group_cols, kernel, keys_index, n_rows, accs, None)

    return fn


_FOLD_ROWS = 1 << 22  # pending rows per deferred consolidation (~4M, ~16 B/row held)


def _vec_direct_builder(specs: list[SketchSpec], group_cols: list[str], col_map: dict, kernel):
    """Post-shuffle single-pass build for the vectorized kinds: raw
    (group, hash) rows arrive hash-partitioned on the group columns, so
    every group is complete within the partition and the kernel emits
    FINAL states directly — no partial-state emit, no state exchange, no
    blob decode. Used when map-side pre-aggregation cannot pay (see
    ``grouped_sketch``): at ~1 row per (group, partition) the partial
    route wraps and re-parses one blob per INPUT row.

    Group codes are assigned in DEFERRED blocks of ``_FOLD_ROWS`` rows
    rather than per batch: each batch only factorizes its own keys
    (C-level) and stashes (uniques, codes, payloads); a consolidation
    then maps all stashed uniques through ONE factorize over
    ``keys_index.append(stashed)`` and folds the payloads into the
    kernel accumulator with one sort. The per-batch alternative
    (``Index.append`` + ``get_indexer``) rebuilt the key hash table and
    its is_unique check every 64k rows — O(live groups) per batch, the
    dominant cost of the 20M-group bench build (profiled ~2.2s of a
    4.2s partition). First-seen code order is preserved (keys_index
    leads the factorize input, so existing codes keep their values),
    making emitted states and row order identical to the incremental
    path; memory holds ~16 bytes/pending row, bounded by
    ``_FOLD_ROWS``."""

    def fn(batches):
        keys_index = None
        n_rows = np.empty(0, dtype=np.int64)
        accs = {s.name: kernel.init_acc() for s in specs}
        pend_uniq: list = []
        pend_codes: list = []
        pend_pay: dict[str, list] = {s.name: [] for s in specs}
        pend_n = 0

        def consolidate():
            nonlocal keys_index, n_rows, pend_uniq, pend_codes, pend_n
            if not pend_uniq:
                return
            parts = ([] if keys_index is None else [keys_index]) + pend_uniq
            combined = parts[0].append(parts[1:]) if len(parts) > 1 else parts[0]
            codes, keys_index = combined.factorize(use_na_sentinel=False)
            codes = np.asarray(codes, dtype=np.int64)
            offs = np.zeros(len(parts) + 1, dtype=np.int64)
            np.cumsum([len(u) for u in parts], out=offs[1:])
            base = 0 if len(parts) > len(pend_uniq) else -1  # skip keys_index slot
            g_all = np.concatenate(
                [
                    codes[offs[base + i + 1] : offs[base + i + 2]][bl]
                    for i, bl in enumerate(pend_codes)
                ]
            )
            if len(keys_index) > n_rows.size:
                n_rows = np.concatenate(
                    [n_rows, np.zeros(len(keys_index) - n_rows.size, dtype=np.int64)]
                )
            n_rows += np.bincount(g_all, minlength=n_rows.size)
            for s in specs:
                accs[s.name] = kernel.absorb_payloads(
                    accs[s.name], s, g_all, np.concatenate(pend_pay[s.name])
                )
                pend_pay[s.name].clear()
            pend_uniq, pend_codes, pend_n = [], [], 0

        for pdf in batches:
            if not len(pdf):
                continue
            arrays = batch_arrays(pdf, specs, col_map)
            if len(group_cols) == 1:
                bl_codes, bl_uniques = pdf[group_cols[0]].factorize(use_na_sentinel=False)
                bl_uniques = pd.Index(bl_uniques)
            else:
                mi = pd.MultiIndex.from_frame(pdf[list(group_cols)])
                bl_codes, bl_uniques = mi.factorize(use_na_sentinel=False)
            pend_uniq.append(bl_uniques)
            pend_codes.append(np.asarray(bl_codes, dtype=np.int64))
            for s in specs:
                pend_pay[s.name].append(kernel.row_payloads(s, arrays[s.name][0]))
            pend_n += len(pdf)
            if pend_n >= _FOLD_ROWS:
                consolidate()
        consolidate()
        if keys_index is not None and len(keys_index):
            yield _emit_state_rows(specs, group_cols, kernel, keys_index, n_rows, accs, None)

    return fn


# pa.BinaryArray offsets are int32: cap the state bytes per emitted batch
_EMIT_BYTES = 1 << 29


def _vec_direct_builder_arrow(
    specs: list[SketchSpec], group_cols: list[str], col_map: dict, kernel
):
    """``mapInArrow`` twin of ``_vec_direct_builder`` for single-column
    hashable group keys: the same deferred-consolidation build, but group
    keys stay Arrow-native end to end. Input batches never convert to
    pandas (2.4M string->PyObject conversions per bench partition),
    per-batch factorization is ``Array.dictionary_encode`` (C++), the
    consolidation re-encodes ``concat_arrays(keys, stashed-uniques)``
    (prior keys lead, so existing codes keep their values), and the
    output RecordBatch is assembled zero-copy: the group column IS the
    final dictionary, and the state column wraps the kernels'
    ``emit_buf`` flat (buf, offs) pair into a BinaryArray — no per-group
    Python bytes objects on either side. States are byte-identical to
    the pandas route (pure set functions; gated by the direct-route
    tests). Null group keys collect into a separate bucket emitted as
    the LAST row (pandas factorize would slot NaN at first appearance —
    row order is the only difference). Float group keys take the pandas
    route instead: Arrow hashes NaN/-0.0 bitwise, pandas by value."""
    gcol = group_cols[0]

    def fn(batches):
        import pyarrow as pa

        keys_arr = None
        n_rows = np.empty(0, dtype=np.int64)
        accs = {s.name: kernel.init_acc() for s in specs}
        null_pay: dict[str, list] = {s.name: [] for s in specs}
        null_n = 0
        pend_uniq: list = []
        pend_codes: list = []
        pend_pay: dict[str, list] = {s.name: [] for s in specs}
        pend_n = 0
        out_fields = None

        def consolidate():
            nonlocal keys_arr, n_rows, pend_uniq, pend_codes, pend_n
            if not pend_uniq:
                return
            parts = ([] if keys_arr is None else [keys_arr]) + pend_uniq
            enc = pa.concat_arrays(parts).dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            keys_arr = enc.dictionary
            offs = np.zeros(len(parts) + 1, dtype=np.int64)
            np.cumsum([len(u) for u in parts], out=offs[1:])
            base = 0 if len(parts) > len(pend_uniq) else -1  # skip keys_arr slot
            g_all = np.concatenate(
                [
                    codes[offs[base + i + 1] : offs[base + i + 2]][bl]
                    for i, bl in enumerate(pend_codes)
                ]
            )
            if len(keys_arr) > n_rows.size:
                n_rows = np.concatenate(
                    [n_rows, np.zeros(len(keys_arr) - n_rows.size, dtype=np.int64)]
                )
            n_rows += np.bincount(g_all, minlength=n_rows.size)
            for s in specs:
                accs[s.name] = kernel.absorb_payloads(
                    accs[s.name], s, g_all, np.concatenate(pend_pay[s.name])
                )
                pend_pay[s.name].clear()
            pend_uniq, pend_codes, pend_n = [], [], 0

        for rb in batches:
            if rb.num_rows == 0:
                continue
            if out_fields is None:
                out_fields = {f.name: f.type for f in rb.schema}
            garr = rb.column(rb.schema.get_field_index(gcol))
            hs = {}
            for s in specs:
                harr = rb.column(rb.schema.get_field_index(col_map[s.name]["h"]))
                if harr.null_count:
                    harr = harr.fill_null(0)
                hs[s.name] = harr.to_numpy(zero_copy_only=False).view(np.uint64)
            enc = garr.dictionary_encode()
            bl_codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            if garr.null_count:
                nulls = bl_codes < 0
                null_n += int(nulls.sum())
                for s in specs:
                    null_pay[s.name].append(
                        kernel.row_payloads(s, hs[s.name][nulls])
                    )
                keep = ~nulls
                bl_codes = bl_codes[keep]
                for s in specs:
                    hs[s.name] = hs[s.name][keep]
                if not bl_codes.size:
                    continue
            pend_uniq.append(enc.dictionary)
            pend_codes.append(bl_codes)
            for s in specs:
                pend_pay[s.name].append(kernel.row_payloads(s, hs[s.name]))
            pend_n += len(bl_codes)
            if pend_n >= _FOLD_ROWS:
                consolidate()
        consolidate()
        n = 0 if keys_arr is None else len(keys_arr)
        if n == 0 and null_n == 0:
            return
        key_out = keys_arr if keys_arr is not None else pa.array([], type=out_fields[gcol])
        nr = n_rows[:n]
        if null_n:
            # null group emitted last: absorb its payloads under code n
            key_out = pa.concat_arrays(
                [key_out, pa.array([None], type=key_out.type)]
            )
            nr = np.concatenate([nr, [null_n]])
            for s in specs:
                gg = np.full(
                    sum(p.size for p in null_pay[s.name]), n, dtype=np.int64
                )
                accs[s.name] = kernel.absorb_payloads(
                    accs[s.name], s, gg, np.concatenate(null_pay[s.name])
                )
            n += 1
        bufs = {s.name: kernel.emit_buf(accs[s.name], s, n) for s in specs}
        start = 0
        while start < n:
            stop = n
            for s in specs:  # keep each chunk's state bytes under int32 offsets
                offs = bufs[s.name][1]
                stop = min(
                    stop, int(np.searchsorted(offs, offs[start] + _EMIT_BYTES)) - 1
                )
            stop = max(stop, start + 1)
            arrays = [key_out.slice(start, stop - start)]
            names = [gcol]
            arrays.append(pa.array(nr[start:stop], type=pa.int64()))
            names.append(_NROWS_COL)
            for s in specs:
                buf, offs = bufs[s.name]
                rel = (offs[start : stop + 1] - offs[start]).astype(np.int32)
                chunk = buf[offs[start] : offs[stop]]
                arrays.append(
                    pa.Array.from_buffers(
                        pa.binary(),
                        stop - start,
                        [None, pa.py_buffer(rel), pa.py_buffer(np.ascontiguousarray(chunk))],
                    )
                )
                names.append(s.state_col)
            yield pa.RecordBatch.from_arrays(arrays, names=names)
            start = stop

    return fn


def _preagg_dedup_ratio(prepared: DataFrame, group_cols: list[str], sample_rows: int) -> float:
    """Distinct-group fraction of a bounded row sample — the decision
    input for the vectorized route: map-side partials shrink the state
    exchange by roughly this factor's inverse, so a ratio near 1 means
    pre-aggregation only adds work. ``limit`` reads just enough leading
    partitions to fill the sample (one tiny job, no full scan), which is
    exactly the within-partition locality the partial builder would see."""
    row = (
        prepared.select(*group_cols)
        .limit(sample_rows)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(*[F.col(c) for c in group_cols]).alias("d"),
        )
        .collect()[0]
    )
    return row["d"] / max(row["n"], 1)


def _merge_groups(specs: list[SketchSpec], group_cols: list[str], with_ord: bool):
    """applyInPandas fn over state rows: deterministic (partition-ordered)
    per-key merge. Emits `_ORD_COL` = min input ord when feeding another
    merge level."""

    def fn(keys: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_ORD_COL, kind="stable")
        row = {c: k for c, k in zip(group_cols, keys)}
        if with_ord:
            row[_ORD_COL] = int(pdf[_ORD_COL].min())
        row[_NROWS_COL] = int(pdf[_NROWS_COL].sum())
        for s in specs:
            acc = None
            for blob in pdf[s.state_col]:
                acc = merge_blobs(acc, blob)
            row[s.state_col] = acc
        return pd.DataFrame([row])

    return fn


def _auto_salt_buckets(n_partitions: int, target_fan_in: int = 256) -> int:
    """Default merge fan-in bound (VERDICT r02 #4): with S salt buckets a
    key's final merge reads S rows and each level-1 merge reads
    ~n_partitions/S — S = nparts/256 caps both near `target_fan_in`, so a
    100k-partition scan never funnels 100k state rows of one key into a
    single applyInPandas group. <= target partitions need no extra level."""
    return max(1, n_partitions // target_fan_in)


def _pre_merge_states(
    df: DataFrame,
    group_cols: list[str],
    specs: list[SketchSpec],
    salt_buckets: int | None,
    max_states_per_partition: int,
) -> DataFrame:
    """Stage 1 (+ optional salted level-1 merge): the state rows feeding
    the final per-key merge. Exposed for fan-in tests."""
    spec_cols, col_map = plan_columns(specs)
    prepared = df.select(*[F.col(c) for c in group_cols], *spec_cols)
    if salt_buckets is None:
        try:
            # plan -> RDD conversion is metadata-only for batch plans
            # (verified safe on foreachBatch callback threads too); the
            # fallback covers plans that cannot convert (e.g. an
            # un-materialized streaming source)
            salt_buckets = _auto_salt_buckets(prepared.rdd.getNumPartitions())
        except Exception:
            salt_buckets = 1

    partials = prepared.mapInPandas(
        _partial_builder(specs, group_cols, col_map, max_states_per_partition),
        schema=_grouped_schema(prepared, group_cols, specs, with_ord=True),
    )
    if salt_buckets > 1:
        level1 = partials.withColumn(
            _SALT_COL, F.pmod(F.shiftright(F.col(_ORD_COL), 20), F.lit(salt_buckets))
        )
        mid_cols = group_cols + [_SALT_COL]
        mid_schema = _grouped_schema(level1, mid_cols, specs, with_ord=True)
        partials = (
            level1.groupBy(*mid_cols)
            .applyInPandas(_merge_groups(specs, mid_cols, with_ord=True), schema=mid_schema)
            .drop(_SALT_COL)
        )
    return partials


def grouped_sketch(
    df: DataFrame,
    group_cols: list[str],
    specs: list[SketchSpec],
    salt_buckets: int | None = None,
    salt_cols: list[str] | None = None,  # obsolete, ignored (see module doc)
    salt_seed: int = 0xBEEF,
    max_states_per_partition: int = 1 << 16,
    pre_partial: bool | None = None,
) -> DataFrame:
    """Per-group sketch states: returns one row per group with
    ``group_cols + [n_rows] + state_<name> binary`` columns.

    Rows never shuffle: partition-local partial states are built in one
    streaming pass, then only states move. ``salt_buckets=S`` adds a
    pre-merge level on (key, partition mod S) to bound per-key fan-in on
    very wide scans; the default (None) derives S from the scan's
    partition count so fan-in stays ~256 at any width.

    All-HLL spec lists take a fully vectorized route instead: the packed
    partial builder, one hash repartition on the group columns, and a
    partition-wide register-max merge (`_vec_merge_builder`) — no per-key
    ``applyInPandas`` and no salt level (the vectorized merge has no
    per-key fan-in limit, so ``salt_buckets`` is moot there). Same bytes
    out; the dispatch exists because a billion-group build (north_star:
    distinct tools per conv_id) is output-bound, not group-loop-bound,
    on this path.

    ``pre_partial`` picks the vectorized route's stage-1 shape (r6,
    guide §2.3 "aggregate before you shuffle" — which cuts BOTH ways):

    * ``True``: map-side partial states (the r5 plan) — right when each
      scan partition repeats its group keys, so partials shrink the
      exchange (low-cardinality keys, clustered layouts).
    * ``False``: shuffle the raw (group, hash) projection once and build
      FINAL states in a single post-shuffle pass. At group cardinality
      near the row count (the 20M-conv bench shape, rows scattered by a
      round-robin write) the partial route wraps, exchanges, and
      re-parses ~one state blob per INPUT row — measured 69s vs 31s.
    * ``None`` (default): decide from a bounded distinct-ratio sample of
      the scan (``_preagg_dedup_ratio``; > 0.5 distinct per sampled row
      =>> direct). One tiny ``limit`` job; never a full scan.

    Both shapes emit byte-identical states — HLL/KMV states are pure set
    functions of the hashes seen (gated by
    test_grouped_direct_route_byte_identical)."""
    kinds = {s.kind for s in specs}
    if len(kinds) == 1 and next(iter(kinds)) in _VEC_KERNELS:
        kernel = _VEC_KERNELS[next(iter(kinds))](specs)
        spec_cols, col_map = plan_columns(specs)
        prepared = df.select(*[F.col(c) for c in group_cols], *spec_cols)
        if pre_partial is None:
            pre_partial = _preagg_dedup_ratio(prepared, group_cols, 200_000) <= 0.5
        if not pre_partial:
            out_schema = _grouped_schema(prepared, group_cols, specs, with_ord=False)
            shuffled = prepared.repartition(*group_cols)
            from pyspark.sql.types import DoubleType, FloatType

            if len(group_cols) == 1 and not isinstance(
                prepared.schema[group_cols[0]].dataType, (DoubleType, FloatType)
            ):
                # Arrow-native build: keys never convert to PyObjects and
                # the output assembles zero-copy (see builder docstring).
                # Float keys stay on the pandas route — Arrow factorizes
                # NaN/-0.0 bitwise, pandas by value.
                return shuffled.mapInArrow(
                    _vec_direct_builder_arrow(specs, group_cols, col_map, kernel),
                    schema=out_schema,
                )
            return shuffled.mapInPandas(
                _vec_direct_builder(specs, group_cols, col_map, kernel),
                schema=out_schema,
            )
        partials = prepared.mapInPandas(
            _vec_partial_builder(specs, group_cols, col_map, max_states_per_partition, kernel),
            schema=_grouped_schema(prepared, group_cols, specs, with_ord=True),
        )
        out_schema = StructType([f for f in partials.schema.fields if f.name != _ORD_COL])
        return (
            partials.repartition(*group_cols)
            .drop(_ORD_COL)
            .mapInPandas(_vec_merge_builder(specs, group_cols, kernel), schema=out_schema)
        )
    partials = _pre_merge_states(df, group_cols, specs, salt_buckets, max_states_per_partition)
    out_schema = StructType(
        [f for f in partials.schema.fields if f.name != _ORD_COL]
    )
    return partials.groupBy(*group_cols).applyInPandas(
        _merge_groups(specs, group_cols, with_ord=False), schema=out_schema
    )
