"""Deduplication stages — exact and near-duplicate detection at corpus scale.

Shuffle strategy (SURVEY.md §4 / ray guide "Aggregation at scale"):

* **exact**: content-hash per batch (vectorized), then ONE hash-partitioned
  ``groupby(hash)`` over (hash, min_id, count) partials — data rows never
  shuffle, only 16-byte digests.
* **MinHash-LSH**: shingle → k-permutation MinHash signature per batch
  (actor holds the permutation table) → explode to (band, band_hash, doc_id)
  rows → ``groupby(band, band_hash)`` → candidate pairs within buckets →
  exact-signature Jaccard verification.  Bucket sizes are bounded by
  capping pairs per bucket (skew guard for degenerate buckets).
* **SimHash**: 64-bit signature per doc; bucket by 4×16-bit bands (any pair
  with Hamming distance ≤ 3 shares ≥1 band); verify Hamming in-bucket.
* **n-gram Jaccard**: exact verification kernel used by both LSH paths, and
  usable brute-force within small groups.
* **embedding cosine**: see :mod:`xema_ray.stages.similarity` near-dup path.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa


# Byte companion to the measured-auto ROW gates (`auto_driver_limit`):
# a driver fold additionally requires the folded rows to fit this many
# bytes (MinHash band rows carry ~1 KB signatures, so a row count under
# the limit can still be a multi-GB driver concat — r5 stress).
AUTO_DRIVER_BYTES = 512 << 20

# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------

_HEX_LUT = np.zeros(256, dtype=np.uint8)
for _c in b"0123456789":
    _HEX_LUT[_c] = _c - ord("0")
for _c in b"abcdef":
    _HEX_LUT[_c] = _c - ord("a") + 10
for _c in b"ABCDEF":
    _HEX_LUT[_c] = _c - ord("A") + 10


def _fixed_width_view(col, width: int = None):
    """Zero-copy ``S<width>`` numpy view of an Arrow string/binary column
    whose values are all the same byte width (content digests are) —
    the buffer reshape replaces a per-row object conversion, which was
    the driver-merge hot spot at 580 k partial rows.  Returns ``None``
    when the column has nulls, ragged widths, or a non-contiguous
    layout (callers fall back to the object path)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count or len(col) == 0:
        return None
    bufs = col.buffers()
    if len(bufs) < 3 or bufs[2] is None:
        return None
    off_dtype = np.int64 if pa.types.is_large_string(col.type) \
        or pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype,
                         count=len(col) + 1,
                         offset=col.offset * np.dtype(off_dtype).itemsize)
    widths = np.diff(offs)
    if width is None:
        width = int(widths[0]) if len(widths) else 0
    if width == 0 or not (widths == width).all():
        return None
    data = np.frombuffer(bufs[2], dtype=np.uint8,
                         count=int(offs[-1] - offs[0]), offset=int(offs[0]))
    return data.reshape(len(col), width).view(f"S{width}").ravel()


def _hex_prefix_u64(hbytes: np.ndarray) -> np.ndarray:
    """Exact uint64 from the first 16 hex chars of ``S32`` digest keys —
    the digest IS already a hash, so bucket assignment needs a parse,
    not a re-hash (replaces a to_pylist + xxhash round trip per batch)."""
    u = hbytes.view(np.uint8).reshape(len(hbytes), -1)[:, :16]
    nib = _HEX_LUT[u].astype(np.uint64)
    out = np.zeros(len(hbytes), dtype=np.uint64)
    for i in range(16):
        out = (out << np.uint64(4)) | nib[:, i]
    return out


def _hash_text_column(tbl: pa.Table, col: str, hash_fn: str):
    """Per-row content keys for ``tbl[col]``: vectorized 128-bit hex
    (``hash_fn="fast"``, the engine default — round-2 verdict #2) or
    per-row md5 hex (``hash_fn="md5"``, cross-engine-recomputable mode).
    ``list<int>`` columns (pre-tokenized sequences) hash with the
    order-sensitive vectorized token-row kernel regardless of mode.
    Returns a ``pa.StringArray`` with null for null cells."""
    import pyarrow.compute as pc

    coltype = tbl[col].type
    if pa.types.is_list(coltype) or pa.types.is_large_list(coltype):
        from xema_ray.functions.sketches import hash_int_list_rows, pack_hex128

        colv = tbl[col]
        if isinstance(colv, pa.ChunkedArray):
            colv = colv.combine_chunks()
        arr = pa.array(pack_hex128(
            hash_int_list_rows(colv, seed=0),
            hash_int_list_rows(colv, seed=0x9E3779B9)).astype("U32"),
            type=pa.string())
        valid = pc.is_valid(tbl[col])
        if not pc.all(valid).as_py():
            arr = pc.if_else(valid, arr, pa.scalar(None, type=pa.string()))
        return arr
    if hash_fn == "md5":
        texts = tbl[col].to_pylist()
        return pa.array(
            [hashlib.md5(t.encode("utf-8", "surrogatepass")).hexdigest()
             if t is not None else None for t in texts],
            type=pa.string(),
        )
    from xema_ray.functions.sketches import hash_strings_hex128

    import pyarrow.compute as pc

    texts = tbl[col].to_pylist()  # object list; hashing itself is vectorized
    hexes = hash_strings_hex128(texts).astype("U32")
    arr = pa.array(hexes, type=pa.string())
    valid = pc.is_valid(tbl[col])
    if not pc.all(valid).as_py():
        arr = pc.if_else(valid, arr, pa.scalar(None, type=pa.string()))
    return arr


def _content_hash_batch(tbl: pa.Table, col: str, id_col: str,
                        hash_fn: str = "fast") -> pa.Table:
    """Per-batch partial (hash, min_id, cnt) — the only thing that
    shuffles.  Hash + delegate to the shared partial builder (one body
    to keep in sync — code-review r3)."""
    t = pa.table({id_col: tbl[id_col],
                  "_h": _hash_text_column(tbl, col, hash_fn)})
    return _content_hash_partial_from(t, "_h", id_col)


def exact_dedup_groups(ds, col: str = "text", id_col: str = "doc_id",
                       hash_fn: str = "fast"):
    """One row per distinct content: ``(doc_id=min id, n_copies)``.

    Matches ``SELECT min(id), count(*) FROM t GROUP BY content`` (128-bit
    hash collisions are negligible at any practical corpus size).  The
    output is O(distinct contents) so it stays distributed: per-batch
    partials exchange through a COARSE hash-bucket groupby (B buckets,
    each digest in exactly one bucket) and merge with the vectorized
    group sort — not one Ray sort group per digest.
    """
    def partial(t: pa.Table) -> pa.Table:
        thin = pa.table({id_col: t[id_col],
                         "_h": _hash_text_column(t, col, hash_fn)})
        return _bucketed_hash_partial(thin, "_h", id_col)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = _groups_from_frame(g.drop(columns=["bucket"]))
        return pd.DataFrame({"doc_id": out["keep_id"],
                             "n_copies": out["n"]})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(merge, batch_format="pandas")


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id",
                hash_fn: str = "fast", strategy: str = "auto",
                auto_driver_limit: int = 8_000_000):
    """Survivor rows (first id per distinct content).

    Scale shape (round-1 verdict fix): only the DUPLICATE groups —
    ``(hash, keeper id)`` for contents appearing more than once, rare by
    assumption — are collected and broadcast.  The corpus-sized survivor
    set never materializes on the driver; a row is kept when its content
    hash is not in a duplicate group, or it IS that group's keeper.
    The partial merge uses the measured-auto driver / coarse-bucket
    strategy (:func:`_collect_dup_groups`) rather than a one-group-per-
    digest Ray groupby.
    """
    import ray

    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        thin = pa.table({id_col: t[id_col],
                         "_h": _hash_text_column(t, col, hash_fn)})
        return _bucketed_hash_partial(thin, "_h", id_col)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    dup_h, keep_id = _collect_dup_groups(partials, strategy,
                                         auto_driver_limit)
    ref = ray.put((dup_h, keep_id))

    class Keep:
        def __init__(self, ref):
            self.dup_h, self.keep_id = ray.get(ref)  # one plasma read/actor

        def __call__(self, tbl: pa.Table) -> pa.Table:
            h = _hash_text_column(tbl, col, hash_fn)
            idx = pc.index_in(h, value_set=self.dup_h)  # null = unique content
            keeper = pc.take(self.keep_id, idx) if len(self.keep_id) else None
            keep = pc.is_null(idx) if keeper is None else pc.or_kleene(
                pc.is_null(idx), pc.equal(tbl[id_col], keeper)
            )
            # rows with null content/id never survived before; keep parity
            keep = pc.and_(pc.fill_null(keep, False),
                           pc.and_(pc.is_valid(h), pc.is_valid(tbl[id_col])))
            return tbl.filter(keep)

    return ds.map_batches(Keep, fn_constructor_kwargs={"ref": ref},
                          batch_format="pyarrow", concurrency=(1, 8))


# ----------------------------------------------------------------------
# shingling + MinHash-LSH
# ----------------------------------------------------------------------


def _shingle_hashes(text: str, k: int, word_re) -> np.ndarray:
    """Single-doc shingle-hash set — the scalar reference for the batch
    kernel (:func:`word_ngram_hashes` + ``unique_per_row``); kept for
    tests and ad-hoc use.  NOTE: hashes joined gram STRINGS, so values
    differ from the batch kernel's word-mix hashes; both are internally
    consistent hash spaces."""
    from xema_ray.functions.sketches import hash_strings

    words = word_re.findall(text.lower())
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < k:
        grams = [" ".join(words)]
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(hash_strings(np.array(grams, dtype=object)))


class MinHashStage:
    """Actor: emits (doc_id, band, band_hash) rows per document.

    ``sig_sample``: ship only the first S signature slots with each band
    row instead of all k.  The banded shuffle explodes every doc into
    ``bands`` rows, each dragging the signature along for in-bucket
    verification — at 100 TB that k×8-byte rider is the dominant shuffle
    cost (r1 verdict).  Sampling trades estimator resolution (est_jaccard
    granularity 1/S instead of 1/k) for a k/S shuffle-size cut; the
    MinHash slots are i.i.d., so a prefix is an unbiased sample.
    """

    def __init__(self, col: str, id_col: str, k: int = 128, bands: int = 16,
                 shingle: int = 3, seed: int = 7,
                 sig_sample: Optional[int] = None):
        import re

        from xema_ray.functions.sketches import MinHasher

        self.col, self.id_col = col, id_col
        self.bands = bands
        self.shingle = shingle
        self.sig_sample = sig_sample
        self.mh = MinHasher(k=k, seed=seed)
        self.word_re = re.compile(r"[a-z0-9]+")

    def signature_matrix(self, texts) -> np.ndarray:
        """Batch-vectorized signatures (r3): one regex scan + one
        factorize + one gram-hash pass for the WHOLE batch
        (:func:`word_ngram_hashes`), then chunked permutation mins via
        ``signature_matrix_flat`` — no per-document Python calls."""
        import pandas as pd

        from xema_ray.functions.sketches import word_ngram_hashes

        s = pd.Series(texts, dtype="object").fillna("").str.lower()
        words_all = s.str.findall(self.word_re)
        flat, offsets = word_ngram_hashes(words_all, self.shingle)
        return self.mh.signature_matrix_flat(flat, offsets)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl[self.col].to_pylist()
        ids = tbl[self.id_col].to_pylist()
        sigs = self.signature_matrix(texts)
        from xema_ray.functions.sketches import MinHasher

        bands = MinHasher.band_keys(sigs, self.bands)  # (n, bands)
        n = len(texts)
        doc = np.repeat(np.asarray(ids, dtype=object), self.bands)
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)
        bh = bands.reshape(-1)
        # signatures ride along (packed bytes) for in-bucket verification
        sig_rows = np.repeat(np.arange(n), self.bands)
        if self.sig_sample is not None and self.sig_sample < self.mh.k:
            sigs = sigs[:, : self.sig_sample]
        return pa.table({
            "doc_id": pa.array(doc),
            "band": pa.array(band_id, type=pa.int32()),
            "band_hash": pa.array(bh.view(np.int64), type=pa.int64()),
            "sig": pa.array([sigs[r].tobytes() for r in sig_rows], type=pa.binary()),
        })


def _coarse_groupby(rows, key_cols: list, block_fn,
                    n_buckets: Optional[int] = None):
    """Hash the (numeric) group key into ``n_buckets`` coarse partitions
    and run ``block_fn`` ONCE per partition — it scans every fine group
    inside (sort + boundary detection).  Identical results to
    ``groupby(key_cols).map_groups`` because the bucket is a pure function
    of the key (all rows of a key co-locate); removes the per-tiny-group
    scheduling overhead that dominated with 10^4-10^5 LSH buckets."""
    if n_buckets is None:
        from xema_ray.stages.shuffle import default_shuffle_buckets

        n_buckets = default_shuffle_buckets()  # cluster-aware (r3 item 10)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for c in key_cols:
            col = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            h = h * np.uint64(1099511628211) ^ col.view(np.uint64)
        return t.append_column(
            "_cb", pa.array((h % np.uint64(n_buckets)).astype(np.int32)))

    return rows.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_cb").map_groups(block_fn, batch_format="pandas")


def _pair_hash64(t: pa.Table) -> np.ndarray:
    """Deterministic uint64 hash of each (doc_a, doc_b) row — vectorized
    splitmix-style mix for integer ids (the f-string lane cost minutes
    of pure Python at the 20x stress's 62M emitted pairs, r5), string
    hashing otherwise.  Shared by the pair-dedupe bucketer and the
    verification pair SLICER (both only need same-pair → same-value)."""
    from xema_ray.functions.sketches import hash_strings

    if t.num_rows == 0:
        return np.empty(0, np.uint64)
    if pa.types.is_integer(t.schema.field("doc_a").type):
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (a + np.uint64(0x9E3779B97F4A7C15)) \
            * np.uint64(0xBF58476D1CE4E5B9)
        h ^= (b + np.uint64(0x94D049BB133111EB)) \
            * np.uint64(0xD6E8FEB86659FD93)
        return h ^ (h >> np.uint64(29))
    return hash_strings(
        [f"{a}\x1f{b}" for a, b in
         zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist())])


def _tag_pair_hash_mod(t: pa.Table, n: int, col: str) -> pa.Table:
    """Append ``col`` = pair-hash64 % ``n`` (int32) — the shared pair
    co-location tag (dedupe buckets, verification slices and
    intersection-count buckets all need only same-pair → same-value)."""
    return t.append_column(col, pa.array(
        (_pair_hash64(t) % np.uint64(n)).astype(np.int32)))


def _dedupe_pairs(pairs, keep: list, n_buckets: Optional[int] = None):
    """Distributed (doc_a, doc_b) pair dedupe via the same coarse-bucket
    exchange (duplicates arise only across bands; identical pairs hash to
    the same bucket)."""
    cols = ["doc_a", "doc_b"] + keep
    if n_buckets is None:
        from xema_ray.stages.shuffle import default_shuffle_buckets

        n_buckets = default_shuffle_buckets()

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])[cols]

    return pairs.map_batches(
        lambda t: _tag_pair_hash_mod(t, n_buckets, "_cb"),
        batch_format="pyarrow") \
        .groupby("_cb").map_groups(drop, batch_format="pandas")


def _pairs_table_to_ds(tbl: pa.Table, target_blocks: int = None):
    """Driver-fold results enter Ray as MULTIPLE blocks (~cpus/2 slices
    of the arrow table), not one: a single 576k-row block made the
    downstream verification stage one serial task — and the batched
    lexsort kernel is superlinear in batch size on top (r5 bench:
    76 s vs 2.5 s for doc_allpairs_jaccard's verify)."""
    import ray
    import ray.data as rd

    if target_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        target_blocks = max(2, cpus // 2)
    n = tbl.num_rows
    if n == 0:
        return rd.from_arrow(tbl)
    step = -(-n // target_blocks)
    return rd.from_arrow([tbl.slice(i, step) for i in range(0, n, step)])


def _est_pair_emission(df: pd.DataFrame, key_cols: list,
                       cap: Optional[int] = None) -> float:
    """Upper bound on the raw pairs a per-key-block all-pairs fold can
    emit from ``df``: sum of C(min(m, cap), 2) over the (numeric) key
    blocks — the same key combine as ``_coarse_groupby``'s bucketer, so
    the blocks counted here are exactly the fine groups the fold scans.
    ``cap`` is the fold's per-block skew guard (``max_bucket`` /
    ``max_posting``): a boilerplate block of 100k postings emits at most
    C(cap, 2) pairs, so estimating the uncapped C(m, 2) would mis-route
    a driver-sized fold onto the exchanges (code-review r5s2)."""
    h = np.zeros(len(df), dtype=np.uint64)
    for c in key_cols:
        h = h * np.uint64(1099511628211) \
            ^ df[c].to_numpy().astype(np.int64).view(np.uint64)
    _, cnts = np.unique(h, return_counts=True)
    m = cnts[cnts >= 2].astype(np.float64)
    if cap is not None:
        m = np.minimum(m, float(cap))
    return float((m * (m - 1.0) / 2.0).sum())


def _pair_self_join(rows, block_fn, key_cols: list, extra_fields: list,
                    strategy: str, auto_driver_limit: int,
                    block_cap: Optional[int] = None):
    """Shared driver/groupby strategy scaffold for pair-generating
    self-joins (MinHash bands, SimHash bands, AllPairs prefix postings):
    measured-auto lane choice, then either a driver fold with an EXPLICIT
    output schema (an empty or all-int pandas frame would otherwise infer
    float64 ids and diverge from the groupby path's column types —
    code-review r3s5) or the coarse-bucket groupby + distributed pair
    dedupe.

    ``rows`` must carry a ``doc_id`` column (every stage renames to it);
    ``extra_fields``: ``(name, pa_type)`` columns kept after doc_a/doc_b.
    """
    import ray.data as rd

    auto = strategy == "auto"
    if auto:
        rows = rows.materialize()
        # BYTE-gated as well as row-gated (r5 stress): MinHash band rows
        # carry ~1 KB signatures, so 1.6M rows under the row limit were
        # still a 1.6 GB driver concat on a duplication-heavy corpus
        strategy = "driver" if rows.count() <= auto_driver_limit \
            and rows.size_bytes() <= AUTO_DRIVER_BYTES else "groupby"

    if strategy == "driver":
        id_type = rows.schema().base_schema.field("doc_id").type
        schema = pa.schema([("doc_a", id_type), ("doc_b", id_type),
                            *extra_fields])
        frames = [b.to_pandas() for b in
                  rows.iter_batches(batch_format="pyarrow")
                  if b.num_rows]
        if not frames:
            return rd.from_arrow(pa.table(
                {f.name: pa.array([], f.type) for f in schema}))
        big = pd.concat(frames, ignore_index=True)
        # OUTPUT gate (auto lane only): the row/byte gates above bound
        # the INPUT, but pair emission is quadratic in key-block sizes —
        # on the r5 20x duplication stress, 4M postings under both input
        # gates emitted 123M raw pairs through block_fn, a 12 GB private
        # driver heap (pandas drop_duplicates hash state; measured via
        # smaps_rollup, NOT plasma mapping).  Estimated from the pulled
        # frame, NOT a separate key-column pull: a keys-only pre-pull
        # costs one extra Ray execution on EVERY small-corpus call
        # (~2-3 s of this box's executor floor, measured on
        # doc_allpairs_jaccard) to save a transient <= 512 MB pull only
        # in the rare reroute case.  C(m,2) is capped at the fold's
        # skew guard so boilerplate blocks don't mis-route (r5 review).
        if not auto or _est_pair_emission(big, key_cols, cap=block_cap) \
                <= 4 * auto_driver_limit:
            pairs_df = block_fn(big)
            pairs_df = pairs_df.drop_duplicates(["doc_a", "doc_b"])
            return _pairs_table_to_ds(pa.Table.from_pandas(
                pairs_df.reset_index(drop=True), schema=schema,
                preserve_index=False))
        del big, frames
        strategy = "groupby"

    if strategy != "groupby":
        raise ValueError(f"unknown strategy {strategy!r}")
    pairs = _coarse_groupby(rows, key_cols, block_fn)
    if auto:
        # measured-auto dedupe (auto lane ONLY — explicit "groupby" keeps
        # the fully distributed chain testable and barrier-free): the
        # pair set is usually orders of magnitude smaller than the
        # postings that produced it, and the distributed pair dedupe
        # costs a second full exchange (~4-6 s fixed on this box) to
        # dedupe what fits in one driver frame
        pairs = pairs.materialize()
        cols = ["doc_a", "doc_b"] + [n for n, _ in extra_fields]
        if pairs.count() <= auto_driver_limit:
            frames = [b.to_pandas() for b in
                      pairs.iter_batches(batch_format="pyarrow")
                      if b.num_rows]
            if not frames:
                return pairs.map_batches(lambda t: t.select(cols),
                                         batch_format="pyarrow")
            out = pd.concat(frames, ignore_index=True) \
                .drop_duplicates(["doc_a", "doc_b"])[cols]
            # fold-output schema is already exact (built per-bucket from
            # typed numpy arrays), so round-tripping preserves id types
            return _pairs_table_to_ds(pa.Table.from_pandas(
                out.reset_index(drop=True), preserve_index=False))
    return _dedupe_pairs(pairs, keep=[n for n, _ in extra_fields])


def minhash_lsh_pairs(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 128,
    bands: int = 16,
    shingle: int = 3,
    threshold: float = 0.7,
    max_bucket: int = 64,
    sig_sample: Optional[int] = None,
    strategy: str = "auto",
    auto_driver_limit: int = 4_000_000,
):
    """Candidate near-duplicate pairs via banded MinHash-LSH, verified with
    estimated Jaccard (signature agreement) ≥ ``threshold``.

    Returns a Dataset of ``(doc_a, doc_b, est_jaccard)`` with doc_a < doc_b,
    deduplicated across bands.  ``max_bucket`` caps pairwise explosion in
    degenerate buckets (boilerplate text) — the documented skew guard.

    ``strategy``: the banded exchange is two coarse-bucket groupbys
    (bucket-pairs, then cross-band pair dedupe) — the multi-node path.
    On this box each Ray sort exchange has a ~7 s FIXED cost regardless
    of data size, so ``'auto'`` (mirroring :func:`_collect_dup_groups`)
    counts the materialized band rows and, below ``auto_driver_limit``,
    runs the identical bucket scan once on the driver (same pair set:
    the coarse bucket is a pure function of the band key, and the scan
    already walks every fine group) — measured 8.4 s → ~2.5 s at sf0.1.
    """
    band_rows = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"col": col, "id_col": id_col, "k": k,
                               "bands": bands, "shingle": shingle,
                               "sig_sample": sig_sample},
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """All (band, band_hash) buckets that hashed into this COARSE
        partition, processed in one call (sort + boundary scan) — the
        per-bucket Ray map_groups overhead dominated wall time with tens
        of thousands of tiny buckets."""
        out_a, out_b, out_j = [], [], []
        g_all = group.sort_values(["band", "band_hash"], kind="stable")
        keys = (g_all["band"].to_numpy().astype(np.int64) << 48) \
            ^ g_all["band_hash"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            # doc_id-sorted retention: which max_bucket docs survive a
            # degenerate bucket must not depend on row ARRIVAL order,
            # or the driver and groupby strategies (and two runs of the
            # same strategy) could keep different subsets (code-review
            # r3s5)
            g = g_all.iloc[s:e].sort_values("doc_id", kind="stable") \
                .drop_duplicates("doc_id").head(max_bucket)
            n = len(g)
            if n < 2:
                continue
            sigs = np.stack([np.frombuffer(b, dtype=np.uint64) for b in g["sig"]])
            ids = g["doc_id"].to_numpy()
            for i in range(n - 1):
                agree = (sigs[i + 1:] == sigs[i]).mean(axis=1)
                for j in np.nonzero(agree >= threshold)[0]:
                    a, b = ids[i], ids[i + 1 + j]
                    if a == b:
                        continue
                    if a > b:  # natural ordering (ints AND strings)
                        a, b = b, a
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(float(agree[j]))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b,
                             "est_jaccard": out_j})

    return _pair_self_join(band_rows, block_pairs, ["band", "band_hash"],
                           [("est_jaccard", pa.float64())],
                           strategy, auto_driver_limit,
                           block_cap=max_bucket)


# ----------------------------------------------------------------------
# SimHash near-dup
# ----------------------------------------------------------------------


class SimHashStage:
    """Actor: 64-bit SimHash per doc + 4×16-bit band keys.

    ``hash_fn="md5"`` swaps the splitmix gram-hash space for md5-derived
    hashes (:func:`~xema_ray.functions.sketches.md5_ngram_hashes`) so a
    SQL oracle can recompute the full signature/band/Hamming pipeline
    independently; ``"fast"`` (default) is the vectorized engine lane."""

    def __init__(self, col: str, id_col: str, shingle: int = 3,
                 hash_fn: str = "fast"):
        import re

        self.col, self.id_col = col, id_col
        self.shingle = shingle
        self.hash_fn = hash_fn
        self.word_re = re.compile(r"[a-z0-9]+")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from xema_ray.functions.sketches import (
            md5_ngram_hashes,
            simhash_flat,
            unique_per_row,
            word_ngram_hashes,
        )

        texts = tbl[self.col].to_pylist()
        ids = tbl[self.id_col].to_pylist()
        n = len(texts)
        # batch-vectorized (r3): one regex scan + factorize + gram-hash
        # pass for the whole batch; per-doc shingle SET semantics kept via
        # unique_per_row (duplicates weight SimHash, unlike MinHash mins)
        s = pd.Series(texts, dtype="object").fillna("").str.lower()
        words_all = s.str.findall(self.word_re)
        if self.hash_fn == "md5":
            flat, offsets = md5_ngram_hashes(words_all, self.shingle)
        else:
            flat, offsets = word_ngram_hashes(words_all, self.shingle)
        flat, offsets = unique_per_row(flat, offsets)
        sh = simhash_flat(flat, offsets)
        doc = np.repeat(np.asarray(ids, dtype=object), 4)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        keys = np.empty(4 * n, dtype=np.int64)
        sims = np.repeat(sh, 4)
        for b in range(4):
            keys[band == b] = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(doc),
            "band": pa.array(band, type=pa.int32()),
            "band_key": pa.array(keys, type=pa.int64()),
            "simhash": pa.array(sims.view(np.int64), type=pa.int64()),
        })


def simhash_pairs(ds, col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, max_bucket: int = 64,
                  strategy: str = "auto",
                  auto_driver_limit: int = 4_000_000,
                  hash_fn: str = "fast"):
    """Near-duplicate pairs with SimHash Hamming distance ≤ ``max_hamming``
    (any such pair shares at least one of the 4 16-bit bands).
    ``strategy``: same measured-auto driver/groupby choice as
    :func:`minhash_lsh_pairs` (two Ray sort exchanges cost ~14 s fixed
    on this box; the driver scan yields the identical pair set)."""
    from xema_ray.functions.sketches import hamming64

    rows = ds.map_batches(
        SimHashStage, fn_constructor_kwargs={"col": col, "id_col": id_col,
                                             "hash_fn": hash_fn},
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        g_all = group.sort_values(["band", "band_key"], kind="stable")
        keys = (g_all["band"].to_numpy().astype(np.int64) << 48) \
            ^ g_all["band_key"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            g = g_all.iloc[s:e].sort_values("doc_id", kind="stable") \
                .drop_duplicates("doc_id").head(max_bucket)
            n = len(g)
            if n < 2:
                continue
            sims = g["simhash"].to_numpy().view(np.uint64)
            ids = g["doc_id"].to_numpy()
            for i in range(n - 1):
                d = hamming64(np.full(n - i - 1, sims[i], dtype=np.uint64),
                              sims[i + 1:])
                for j in np.nonzero(d <= max_hamming)[0]:
                    a, b = ids[i], ids[i + 1 + j]
                    if a == b:
                        continue
                    if a > b:  # natural ordering (ints AND strings)
                        a, b = b, a
                    out_a.append(a); out_b.append(b); out_h.append(int(d[j]))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    return _pair_self_join(rows, block_pairs, ["band", "band_key"],
                           [("hamming", pa.int64())],
                           strategy, auto_driver_limit,
                           block_cap=max_bucket)


# ----------------------------------------------------------------------
# exact n-gram Jaccard (verification kernel / brute-force small-group path)
# ----------------------------------------------------------------------


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    import re

    word_re = re.compile(r"[a-z0-9]+")
    a = set(map(tuple, _ngrams(word_re.findall((text_a or "").lower()), n)))
    b = set(map(tuple, _ngrams(word_re.findall((text_b or "").lower()), n)))
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def _ngrams(words, n):
    if len(words) < n:
        return [tuple(words)] if words else []
    return [tuple(words[i : i + n]) for i in range(len(words) - n + 1)]


def _gather_ranges(flat: np.ndarray, offs: np.ndarray, idx: np.ndarray):
    """Concatenated values of rows ``idx`` from a CSR-style ``(flat,
    offsets)`` store, plus a parallel row-index array — the classic
    vectorized ranges-gather (no per-row Python loop)."""
    idx = np.asarray(idx, dtype=np.int64)
    starts = offs[idx]
    lens = offs[idx + 1] - starts
    reps = np.repeat(np.arange(len(idx), dtype=np.int64), lens)
    total = int(lens.sum())
    if total == 0:
        return flat[:0], reps
    cum = np.cumsum(lens) - lens
    pos = np.arange(total, dtype=np.int64) - cum[reps] + starts[reps]
    return flat[pos], reps


def _pair_intersections(vals_a, idx_a, vals_b, idx_b, n_pairs: int):
    """Batched set-intersection counts for ``n_pairs`` pairs whose
    DISTINCT gram hashes arrive concatenated with parallel pair-index
    arrays: ONE ``lexsort`` over (pair, gram) + one ``bincount`` replace
    the per-pair ``searchsorted`` loop (round-4 verdict item #3).  Each
    gram appears at most once per side per pair, so adjacent equal
    (pair, gram) rows after the sort are exactly the intersections."""
    g = np.concatenate([vals_a, vals_b])
    p = np.concatenate([idx_a, idx_b])
    if not len(g):
        return np.zeros(n_pairs, np.int64)
    order = np.lexsort((g, p))
    sg, sp = g[order], p[order]
    eq = (sg[1:] == sg[:-1]) & (sp[1:] == sp[:-1])
    return np.bincount(sp[1:][eq], minlength=n_pairs).astype(np.int64)


def _jaccard_from_store(store, a_ids, b_ids) -> np.ndarray:
    """Vectorized per-pair Jaccard against a gram store ``(pd.Index ids,
    flat u64, offsets)`` whose LAST row is the missing-id sentinel (the
    zero-token doc's gram set, mirroring the exact lane's
    ``texts.get(a, "")``)."""
    index, flat, offs = store
    sentinel = len(index)
    ia = index.get_indexer(a_ids)
    ib = index.get_indexer(b_ids)
    ia = np.where(ia < 0, sentinel, ia)
    ib = np.where(ib < 0, sentinel, ib)
    la = offs[ia + 1] - offs[ia]
    lb = offs[ib + 1] - offs[ib]
    va, pia = _gather_ranges(flat, offs, ia)
    vb, pib = _gather_ranges(flat, offs, ib)
    inter = _pair_intersections(va, pia, vb, pib, len(ia))
    union = la + lb - inter
    # union == 0 only when both sides are empty -> J = 1 (matches
    # ngram_jaccard('','')); one empty side gives inter = 0 -> J = 0
    return np.where(union == 0, 1.0,
                    inter / np.maximum(union, 1).astype(np.float64))


def _append_score(t: pa.Table, ja: np.ndarray, fixed_point: bool,
                  threshold: float) -> pa.Table:
    """Shared verified-output assembly: append ``j_fp`` (floor(1e6·J)
    BEFORE any rounding — an independent SQL engine computing the same
    exact integer-ratio division lands on the identical int64) or a
    rounded ``jaccard`` float, then filter at the threshold."""
    import pyarrow.compute as pc

    if fixed_point:
        t = t.append_column("j_fp", pa.array(
            np.floor(1e6 * ja).astype(np.int64), type=pa.int64()))
        return t.filter(pc.greater_equal(
            t["j_fp"], pa.scalar(int(np.floor(1e6 * threshold)),
                                 type=pa.int64())))
    t = t.append_column("jaccard", pa.array(
        np.round(ja, 6), type=pa.float64()))
    return t.filter(pc.greater_equal(t["jaccard"], threshold))


def _binary_col_runs(col):
    """``(flat u64, offsets)`` view of an Arrow binary column holding
    packed little-endian uint64 runs — offsets arithmetic on the Arrow
    buffers, no per-row Python decode."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_large_binary(col.type):
        col = col.cast(pa.large_binary())
    off = np.frombuffer(col.buffers()[1], np.int64, count=len(col) + 1,
                        offset=col.offset * 8)
    data = col.buffers()[2]
    flat = np.frombuffer(data, dtype=np.uint64, offset=int(off[0]),
                         count=int((off[-1] - off[0]) // 8))
    return flat, ((off - off[0]) // 8).astype(np.int64)


def _u64_runs_to_binary(flat: np.ndarray, offs: np.ndarray):
    """Arrow large_binary array whose row ``i`` is
    ``flat[offs[i]:offs[i+1]]`` packed as little-endian uint64 bytes —
    built straight from the buffers (no per-row slicing)."""
    off_b = (offs.astype(np.int64) * 8)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(offs) - 1,
        [None, pa.py_buffer(off_b.tobytes()),
         pa.py_buffer(np.ascontiguousarray(flat).tobytes())])


def _dup_content_winner_mask(ids: pd.Series, payloads: pd.Series) -> np.ndarray:
    """Keep-mask resolving REPEATED doc_ids deterministically: the
    winner is the row whose packed gram payload compares smallest
    (bytes order; tie → first position) — a pure function of row
    CONTENT, so the verified pair set is identical under any shuffle
    arrival order.  ``payloads`` need only be populated at duplicated
    positions."""
    ids = ids.reset_index(drop=True)
    dup_all = ids.duplicated(keep=False).to_numpy()
    keep = ~dup_all
    dup_pos = np.flatnonzero(dup_all)
    if len(dup_pos):
        sub = pd.DataFrame({
            "i": dup_pos,
            "id": ids.iloc[dup_pos].astype(str).to_numpy(),
            "g": payloads.reset_index(drop=True).iloc[dup_pos]
            .to_numpy()})
        win = sub.sort_values(["g", "i"], kind="stable") \
            .drop_duplicates("id")["i"].to_numpy()
        keep[win] = True
    return keep


def _verify_bucketed(pairs_ds, cand, id_col: str, n: int,
                     threshold: float, fixed_point: bool,
                     missing_grams: np.ndarray, n_buckets: int = None,
                     gram_col: str = "text", shingle: int = 3,
                     max_payload_bytes: int = 4 << 30):
    """Distributed pair verification with NO driver-side gram/text dict
    (round-4 verdict item #1): candidate docs' gram sets and the pair
    rows are co-partitioned by doc-hash bucket through TWO exchanges —
    stage A keys everything by ``doc_a`` and attaches side-a grams
    inside each bucket group, stage B re-keys by ``doc_b``, attaches
    side-b grams and verifies with the batched lexsort kernel.  Driver
    and broadcast footprint are O(candidate ids) (the gather filter),
    never O(candidate docs × grams); per-group memory is one bucket's
    gram rows + pairs.

    ``cand`` is the candidate-filtered thin ``(id, text)`` dataset;
    gram rows ``(k, g)`` — g = the doc's sorted distinct gram hashes
    packed as u64 bytes — are materialized once and consumed by both
    stages.  A pair endpoint with no gram row (id absent from the
    corpus) gets ``missing_grams``, mirroring the broadcast lanes.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from xema_ray.functions.sketches import hash_strings, splitmix64
    from xema_ray.stages.shuffle import default_shuffle_buckets

    if n_buckets is None:
        n_buckets = default_shuffle_buckets()
    missing_bytes = np.ascontiguousarray(missing_grams).tobytes()
    pair_schema = pairs_ds.schema().base_schema
    if not isinstance(pair_schema, pa.Schema):
        # pandas-block datasets (the driver-lane pair folds) expose a
        # PandasBlockSchema with no .field — peek one converted batch
        pair_schema = next(iter(pairs_ds.iter_batches(
            batch_size=1, batch_format="pyarrow"))).schema
    id_type = pair_schema.field("doc_a").type
    extras = [(f.name, f.type) for f in pair_schema
              if f.name not in ("doc_a", "doc_b")]
    reserved = {"_vk", "_vg", "_vga", "_vgb", "_vb", "_vslice"}
    clash = reserved & {nm for nm, _ in extras}
    if clash:  # fail loudly instead of silently misclassifying rows
        raise ValueError(
            f"pair columns {sorted(clash)} collide with the bucketed "
            "verification lane's internal fields; rename them or use "
            "strategy='broadcast'")

    def gram_rows(t: pa.Table) -> pa.Table:
        flat, offs = _doc_gram_sets(t[gram_col].to_pandas(), n)
        return pa.table({"_vk": t[id_col].cast(id_type),
                         "_vg": _u64_runs_to_binary(flat, offs)})

    grams = cand.map_batches(gram_rows, batch_format="pyarrow") \
        .materialize()

    def with_bucket(t: pa.Table) -> pa.Table:
        col = t["_vk"]
        if pa.types.is_integer(col.type):
            # vectorized splitmix64 for integer ids; a pure function of
            # the key value, so pair and gram rows co-locate
            h = splitmix64(col.to_numpy(zero_copy_only=False))
        else:
            h = hash_strings(col.cast(pa.string()).to_pylist())
        return t.append_column("_vb", pa.array(
            (h % np.uint64(n_buckets)).astype(np.int32)))

    def align(t: pa.Table, key_from: str, schema: pa.Schema) -> pa.Table:
        """Project ``t`` onto the union schema: absent columns become
        typed nulls, ``k`` comes from ``key_from``."""
        nrows = t.num_rows
        cols = []
        for f in schema:
            if f.name == "_vk":
                cols.append(t[key_from].cast(f.type))
            elif f.name in t.column_names:
                cols.append(t[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(nrows, f.type))
        return pa.Table.from_arrays(cols, schema=schema)

    def attach(gt: pa.Table, side: str, out_col: str) -> tuple:
        """Split a bucket group into gram/pair rows and attach the
        ``side`` endpoint's gram bytes as ``out_col`` (vectorized
        indexer + take; missing ids take the sentinel row)."""
        is_gram = pc.is_valid(gt["_vg"])
        gr = gt.filter(is_gram)
        pr = gt.filter(pc.invert(is_gram))
        if not pr.num_rows:
            return None, None
        ids = gr["_vk"].to_pandas()
        if ids.duplicated().any():
            # repeated doc_ids: winner = MIN packed gram bytes per id —
            # a pure function of content, so the verified pair set is
            # identical under any shuffle arrival order (r5 review;
            # "keep last" depended on nondeterministic group row order)
            keep = _dup_content_winner_mask(
                ids, gr["_vg"].to_pandas())
            gr = gr.filter(pa.array(keep))
            ids = ids[keep]
        gvals = pa.concat_arrays(
            [gr["_vg"].combine_chunks(),
             pa.array([missing_bytes], type=pa.large_binary())]) \
            if gr.num_rows else \
            pa.array([missing_bytes], type=pa.large_binary())
        idx = pd.Index(ids).get_indexer(pr[side].to_pandas()) \
            if gr.num_rows else np.full(pr.num_rows, -1, np.int64)
        idx = np.where(idx < 0, len(gvals) - 1, idx)
        return pr, gvals.take(pa.array(idx, type=pa.int64()))

    def _run(pairs_sl):
        schema_a = pa.schema([("_vk", id_type), ("doc_a", id_type),
                              ("doc_b", id_type), *extras,
                              ("_vg", pa.large_binary())])
        stage_a_in = pairs_sl.map_batches(
            lambda t: align(t, "doc_a", schema_a), batch_format="pyarrow") \
            .union(grams.map_batches(lambda t: align(t, "_vk", schema_a),
                                     batch_format="pyarrow")) \
            .map_batches(with_bucket, batch_format="pyarrow")

        pair_cols = ["doc_a", "doc_b"] + [nm for nm, _ in extras]
        empty_a = pa.Table.from_arrays(
            [pa.array([], f.type) for f in schema_a
             if f.name != "_vk"] + [pa.array([], pa.large_binary())],
            names=[f.name for f in schema_a if f.name != "_vk"][:-1]
            + ["_vga", "_vg"])

        def attach_a(gt: pa.Table) -> pa.Table:
            pr, ga = attach(gt, "doc_a", "_vga")
            if pr is None:
                return empty_a
            out = pr.select(pair_cols).append_column("_vga", ga)
            return out.append_column("_vg", pa.nulls(out.num_rows,
                                                   pa.large_binary()))

        stage_a_out = stage_a_in.groupby("_vb").map_groups(
            attach_a, batch_format="pyarrow")

        schema_b = pa.schema([("_vk", id_type), ("doc_a", id_type),
                              ("doc_b", id_type), *extras,
                              ("_vga", pa.large_binary()),
                              ("_vg", pa.large_binary())])
        stage_b_in = stage_a_out.map_batches(
            lambda t: align(t, "doc_b", schema_b), batch_format="pyarrow") \
            .union(grams.map_batches(lambda t: align(t, "_vk", schema_b),
                                     batch_format="pyarrow")) \
            .map_batches(with_bucket, batch_format="pyarrow")

        score_f = ("j_fp", pa.int64()) if fixed_point \
            else ("jaccard", pa.float64())
        empty_b = pa.Table.from_arrays(
            [pa.array([], t) for _, t in
             [("doc_a", id_type), ("doc_b", id_type), *extras, score_f]],
            names=[nm for nm, _ in
                   [("doc_a", id_type), ("doc_b", id_type), *extras,
                    score_f]])

        def verify_b(gt: pa.Table) -> pa.Table:
            pr, gb = attach(gt, "doc_b", "_vgb")
            if pr is None:
                return empty_b
            fa, oa = _binary_col_runs(pr["_vga"])
            fb, ob = _binary_col_runs(gb)
            la, lb = np.diff(oa), np.diff(ob)
            ra = np.repeat(np.arange(len(la), dtype=np.int64), la)
            rb = np.repeat(np.arange(len(lb), dtype=np.int64), lb)
            inter = _pair_intersections(fa, ra, fb, rb, pr.num_rows)
            union = la + lb - inter
            ja = np.where(union == 0, 1.0,
                          inter / np.maximum(union, 1).astype(np.float64))
            return _append_score(pr.select(pair_cols), ja, fixed_point,
                                 threshold)

        return stage_b_in.groupby("_vb").map_groups(
            verify_b, batch_format="pyarrow")

    # SLICE the pair set so ONE pass's attached gram payload fits the
    # object store (r5 stress: 11M candidate pairs x ~2 KB gram bytes
    # was a 26 GB stage output that wedged the union->sort barrier on
    # one box): slices run sequentially, each a bounded two-exchange
    # pass; verified outputs are small and union lazily.
    n_pairs = pairs_ds.count()
    g_bytes = grams.size_bytes() or 0
    g_rows = max(1, grams.count())
    est = int(n_pairs * 2 * (g_bytes / g_rows))
    n_slices = max(1, -(-est // max_payload_bytes))
    if n_slices == 1:
        return _run(pairs_ds)

    # hash ONCE (the string-id lane is a per-row Python fold — repeating
    # it per slice would scan and re-hash the full pair set n_slices
    # times, code-review r5): tag each pair with its slice, materialize
    # the tagged set, then each pass is a cheap column filter
    tagged = pairs_ds.map_batches(
        lambda t: _tag_pair_hash_mod(t, n_slices, "_vslice"),
        batch_format="pyarrow").materialize()
    outs = []
    for s in range(n_slices):
        def pick(t: pa.Table, s=s) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.equal(t["_vslice"], s)) \
                .drop_columns(["_vslice"])

        outs.append(_run(tagged.map_batches(
            pick, batch_format="pyarrow")).materialize())
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def verify_pairs_jaccard(pairs_ds, docs_ds, col: str = "text",
                         id_col: str = "doc_id", n: int = 3,
                         threshold: float = 0.6,
                         fixed_point: bool = False,
                         method: str = "exact",
                         strategy: str = "auto",
                         auto_broadcast_docs: int = 500_000,
                         max_payload_bytes: int = 4 << 30):
    """Exact-Jaccard verification of candidate pairs.

    Scale shape: the candidate-ID set (small — LSH/prefix-join output)
    broadcasts as the corpus gather filter, so only the candidate docs'
    texts ever leave the workers.  How the gathered gram sets meet the
    pairs is the ``strategy``:

    * ``"broadcast"`` — gather the candidate docs' sorted distinct
      gram-hash sets into ONE store and broadcast it; verification is a
      stateless ``map_batches`` over the pairs.  Fast (no exchange) but
      driver + object-store footprint is O(candidate docs × grams) —
      the small-candidate fast path.
    * ``"bucketed"`` — co-partition pairs and gram sets by doc-hash
      bucket through two exchanges (:func:`_verify_bucketed`); nothing
      larger than the candidate-ID set ever reaches the driver.  The
      100-TB lane for duplication-heavy corpora where the candidate
      side approaches the corpus (round-4 verdict item #1).
    * ``"auto"`` (default) — broadcast below ``auto_broadcast_docs``
      candidate docs, bucketed above (mirrors the dedup merges'
      measured-auto choice).

    ``method``: ``"exact"`` recomputes string-gram set Jaccard per pair
    (Python set ops — the readable reference lane; broadcast only).
    ``"hash"`` compares each doc's sorted distinct 64-bit gram-hash
    array with one batched lexsort/bincount kernel
    (:func:`_pair_intersections`) — ~50× faster per pair and the lane
    both strategies share.  A cross-gram hash collision (~2^-64 per
    gram pair) could perturb one count by 1; identical gram semantics
    otherwise (empty docs share the empty gram, so empty-empty
    verifies at J=1 in both modes; a candidate id absent from
    ``docs_ds`` gets the zero-token doc's gram set, mirroring the
    exact lane's ``texts.get(a, "")``).
    """
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    if method not in ("exact", "hash"):
        raise ValueError(f"unknown method {method!r}")
    if strategy not in ("auto", "broadcast", "bucketed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "bucketed" and method != "hash":
        raise ValueError("strategy='bucketed' requires method='hash'")
    # empty-candidate early return must mirror the verified schema:
    # j_fp (int64) under fixed_point, jaccard (float) otherwise —
    # callers select the score column (code-review r4s2)
    score = ("j_fp", pd.Series([], dtype=np.int64)) if fixed_point \
        else ("jaccard", pd.Series([], dtype=float))
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=object),
                          "doc_b": pd.Series([], dtype=object),
                          score[0]: score[1]})
    pairs_ds = pairs_ds.materialize()  # avoids re-running LSH twice
    # distinct candidate endpoints, reduced per batch DISTRIBUTED — the
    # driver folds small unique arrays, never pair rows as Python dicts
    # (r5 stress: take_all() of 2M candidate rows was 4 GB driver RSS)

    def endpoints(t: pa.Table) -> pa.Table:
        both = pa.chunked_array(
            [t["doc_a"], t["doc_b"]]).combine_chunks()
        return pa.table({"id": pc.unique(both)})

    parts = [b["id"] for b in
             pairs_ds.select_columns(["doc_a", "doc_b"])
             .map_batches(endpoints, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return rd.from_pandas(empty)
    need = pc.unique(pa.chunked_array(parts).combine_chunks())
    need = need.take(pc.sort_indices(need))
    need_ref = ray.put(need)
    if strategy == "auto":
        strategy = "broadcast" if len(need) <= auto_broadcast_docs \
            else ("bucketed" if method == "hash" else "broadcast")

    # task-based stages (no actor pool): the filter/verify kernels are
    # stateless apart from the broadcast refs, and actor-pool spin-up was
    # the dominant cost of this path on small candidate sets (r3 bench:
    # ~4 s of the 7 s verify wall-time at sf0.1)
    def gather(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=ray.get(need_ref)))

    cand = docs_ds.select_columns([id_col, col]).map_batches(
        gather, batch_format="pyarrow")

    # a candidate id absent from docs_ds gets the zero-token doc's
    # gram set, mirroring the exact lane's texts.get(a, "") — both
    # lanes then verify (missing, empty-doc) at J=1 (code-review r4s2)
    _MISSING = _doc_gram_sets(pd.Series([""]), n)[0]

    if method == "hash" and strategy == "bucketed":
        return _verify_bucketed(pairs_ds, cand, id_col, n, threshold,
                                fixed_point, _MISSING,
                                gram_col=col,
                                max_payload_bytes=max_payload_bytes)

    if method == "hash":
        ids_parts, flats, lens = [], [], []
        for b in cand.iter_batches(batch_format="pyarrow"):
            if not b.num_rows:
                continue
            flat, offs = _doc_gram_sets(b[col].to_pandas(), n)
            ids_parts.append(np.asarray(b[id_col].to_pylist(),
                                        dtype=object))
            flats.append(flat)
            lens.append(np.diff(offs))
        if ids_parts:
            ids_all = np.concatenate(ids_parts)
            flat_all = np.concatenate(flats)
            lens_all = np.concatenate(lens)
            # repeated doc_ids: content-determined winner (min packed
            # gram bytes) — matches the bucketed lane exactly, and is
            # independent of batch arrival order (r5 review)
            dup_any = pd.Index(ids_all).duplicated(keep=False)
            if dup_any.any():
                offs_tmp = np.r_[0, np.cumsum(lens_all)]
                pay = pd.Series([None] * len(ids_all), dtype=object)
                for p in np.flatnonzero(dup_any):  # dup rows only
                    pay.iloc[p] = flat_all[
                        offs_tmp[p]:offs_tmp[p + 1]].tobytes()
                keep = _dup_content_winner_mask(pd.Series(ids_all), pay)
                vals, _ = _gather_ranges(
                    flat_all,
                    np.r_[0, np.cumsum(lens_all)],
                    np.flatnonzero(keep))
                flat_all, lens_all = vals, lens_all[keep]
                ids_all = ids_all[keep]
        else:
            ids_all = np.empty(0, dtype=object)
            flat_all, lens_all = np.empty(0, np.uint64), np.empty(0,
                                                                  np.int64)
        # sentinel row for missing ids appended LAST
        flat_all = np.concatenate([flat_all, _MISSING])
        offs_all = np.r_[0, np.cumsum(np.r_[lens_all, len(_MISSING)])] \
            .astype(np.int64)
        gref = ray.put((pd.Index(ids_all), flat_all, offs_all))

        class VerifyHash:
            def __init__(self):
                self.store = ray.get(gref)

            def __call__(self, t: pa.Table) -> pa.Table:
                ja = _jaccard_from_store(
                    self.store,
                    np.asarray(t["doc_a"].to_pylist(), dtype=object),
                    np.asarray(t["doc_b"].to_pylist(), dtype=object))
                return _append_score(t, ja, fixed_point, threshold)

        # bounded batch_size: the lexsort kernel is superlinear in batch
        # size (one 576k-row batch measured 78 s vs 141 x 18 ms at 4096)
        return pairs_ds.map_batches(VerifyHash, batch_format="pyarrow",
                                    batch_size=4096,
                                    concurrency=(1, 8))

    texts: dict = {}
    for b in cand.iter_batches(batch_format="pyarrow"):  # ≤ 2·|pairs| rows
        for i, t in zip(b[id_col].to_pylist(), b[col].to_pylist()):
            texts[i] = t
    tref = ray.put(texts)

    class Verify:
        def __init__(self):
            self.texts = ray.get(tref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ja = np.array([ngram_jaccard(self.texts.get(a, ""),
                                         self.texts.get(b, ""), n=n)
                           for a, b in zip(t["doc_a"].to_pylist(),
                                           t["doc_b"].to_pylist())])
            return _append_score(t, ja, fixed_point, threshold)

    return pairs_ds.map_batches(Verify, batch_format="pyarrow",
                                concurrency=(1, 4))


def _bucketed_hash_partial(t: pa.Table, h_col: str, id_col: str,
                           n_buckets: int = None) -> pa.Table:
    """Per-batch (h, min_id, cnt) partial + coarse hash bucket for the
    groupby merge path (the bucket is a pure function of h via
    :func:`_attach_bucket`, so it needs no coordination and every
    digest lands in exactly one bucket)."""
    g = _content_hash_partial_from(t, h_col, id_col)
    return _attach_bucket(g, n_buckets)


def _groups_from_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Merge (h, min_id, cnt) partial rows into one row per digest group
    ``(h, keep_id=min id, n=Σcnt)`` — numpy fixed-width-bytes group-sort
    instead of a pandas object groupby + string-min aggregate (PyObject
    comparisons per group made the latter the whole export pipeline's
    bottleneck: 28 s vs 2.3 s on 580 k partials)."""
    if not len(df):
        return pd.DataFrame({"h": [], "keep_id": [], "n": []})
    hb = df["h"].to_numpy().astype("S")     # hex digests — ASCII
    uniq, inv = np.unique(hb, return_inverse=True)
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, df["cnt"].to_numpy(dtype=np.int64))
    ids = df["min_id"].to_numpy()
    if np.issubdtype(ids.dtype, np.number):
        id_key = ids
    else:
        try:
            # ASCII bytes order == str order (NUL-padded compare ok)
            id_key = ids.astype("S")
        except UnicodeEncodeError:
            id_key = ids                    # object compare fallback
    order = np.lexsort((id_key, inv))
    inv_s = inv[order]
    firsts = np.ones(len(inv_s), dtype=bool)
    firsts[1:] = inv_s[1:] != inv_s[:-1]
    keep_pos = order[firsts]                # min-id row per group
    keep_idx = np.empty(len(uniq), np.int64)
    keep_idx[inv[keep_pos]] = keep_pos
    return pd.DataFrame({"h": df["h"].to_numpy()[keep_idx],
                         "keep_id": ids[keep_idx], "n": sums})


def _dup_from_frame(df: pd.DataFrame) -> pd.DataFrame:
    """(h, keep_id) restricted to groups with Σcnt > 1."""
    g = _groups_from_frame(df)
    return g[g["n"] > 1][["h", "keep_id"]]


def _collect_dup_groups(partials, strategy: str = "auto",
                        auto_driver_limit: int = 8_000_000):
    """Merge bucketed (h, min_id, cnt, bucket) partials into the
    duplicate-group broadcast set ``(dup_h, keep_id)``.

    ``'driver'`` folds the partials on the driver (right while
    Σ distinct-per-batch is modest — one vectorized group sort, no
    exchange); ``'groupby'`` merges through a COARSE hash-bucket
    ``groupby(bucket).map_groups`` (the multi-node path: B buckets
    instead of one sort group per distinct digest, which made Ray's
    sort-based aggregate the bottleneck — measured 14.5 s → ~1 s at
    sf0.1).  ``'auto'`` counts the materialized partial rows and picks
    driver below ``auto_driver_limit``.  Mirrors
    :func:`~xema_ray.stages.checks.duplicate_values`.
    """
    if strategy == "auto":
        partials = partials.materialize()
        strategy = "driver" if partials.count() <= auto_driver_limit \
            else "groupby"

    if strategy == "driver":
        import pyarrow.compute as pc

        tables = [b for b in partials.iter_batches(batch_format="pyarrow")
                  if b.num_rows]
        if not tables:
            return pa.array([], type=pa.string()), pa.array([])
        tbl = pa.concat_tables(tables).combine_chunks()
        h = tbl["h"].combine_chunks() if isinstance(tbl["h"],
                                                    pa.ChunkedArray) \
            else tbl["h"]
        hb = _fixed_width_view(h)
        if hb is None:                          # object fallback
            dup = _dup_from_frame(tbl.to_pandas())
            return (pa.array(dup["h"], type=pa.string()),
                    pa.Array.from_pandas(dup["keep_id"]))
        ids = tbl["min_id"].combine_chunks() \
            if isinstance(tbl["min_id"], pa.ChunkedArray) else tbl["min_id"]
        keep_idx, sums = _merge_hash_rows(
            hb, _ids_key_fn(ids),
            tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64))
        dup_sel = pa.array(keep_idx[sums > 1])
        dup_h = pc.take(h, dup_sel)
        keep_id = pc.take(ids, dup_sel)
    else:
        # each digest lands in exactly one bucket, so per-bucket merges
        # are globally complete; only dup groups leave the workers
        dup_rows = partials.groupby("bucket").map_groups(
            lambda g: _dup_from_frame(g.drop(columns=["bucket"])),
            batch_format="pandas").take_all()  # O(duplicate groups)
        dup_h = pa.array([r["h"] for r in dup_rows], type=pa.string())
        keep_id = pa.array([r["keep_id"] for r in dup_rows])
    return dup_h, keep_id


def exact_dedup_project(ds, col: str = "text", id_col: str = "doc_id",
                        keep_cols: tuple = (), hash_fn: str = "fast",
                        strategy: str = "auto",
                        auto_driver_limit: int = 8_000_000):
    """Composition-friendly exact dedup: ONE pass over the (possibly
    expensive) upstream computes content digests and materializes only
    the THIN ``(id, keep_cols..., digest)`` projection — the heavy
    columns and the upstream pipeline are never re-executed, unlike
    :func:`exact_dedup`, whose survivor filter re-consumes its input.
    Downstream multi-pass operators (the packing prefix-scan reads its
    input three times) then re-read cheap materialized blocks instead of
    recomputing the chain.  Returns the deduped thin projection (digest
    column dropped).

    Merge strategies (mirrors :func:`~xema_ray.stages.checks.
    duplicate_values`): per-batch pre-aggregated ``(h, min_id, cnt)``
    partials are merged either on the driver (``'driver'`` — right while
    Σ distinct-per-batch is modest; one pandas groupby, no exchange) or
    through a COARSE hash-bucket ``groupby(bucket).map_groups``
    (``'groupby'`` — the multi-node path: B buckets instead of one sort
    group per distinct digest, which made Ray's sort-based aggregate the
    pipeline bottleneck — measured 14.5 s → ~1 s at sf0.1).  ``'auto'``
    counts the materialized partial rows and picks driver below
    ``auto_driver_limit``.
    """
    import ray

    import pyarrow.compute as pc

    def project(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col]}
        for c in keep_cols:
            cols[c] = t[c]
        cols["_h"] = _hash_text_column(t, col, hash_fn)
        return pa.table(cols)

    thin = ds.map_batches(project, batch_format="pyarrow").materialize()

    partials = thin.map_batches(
        lambda t: _bucketed_hash_partial(t, "_h", id_col),
        batch_format="pyarrow")
    dup_h, keep_id = _collect_dup_groups(partials, strategy,
                                         auto_driver_limit)
    ref = ray.put((dup_h, keep_id))

    def keep(t: pa.Table) -> pa.Table:
        d_h, k_id = ray.get(ref)
        idx = pc.index_in(t["_h"], value_set=d_h)
        keeper = pc.take(k_id, idx) if len(k_id) else None
        m = pc.is_null(idx) if keeper is None else pc.or_kleene(
            pc.is_null(idx), pc.equal(t[id_col], keeper))
        m = pc.and_(pc.fill_null(m, False),
                    pc.and_(pc.is_valid(t["_h"]), pc.is_valid(t[id_col])))
        return t.filter(m).drop_columns(["_h"])

    return thin.map_batches(keep, batch_format="pyarrow")


def _merge_hash_rows(hb: np.ndarray, ids_key, cnts: np.ndarray):
    """Group-merge kernel over fixed-width digest bytes: returns
    ``(keep_idx, sums)`` — for each distinct digest (np.unique order)
    the row index of its MIN id and its total count.

    Fast path: digests that appear once (the overwhelming case in a
    mostly-unique corpus) never touch the id column at all — the
    lexsort + id-byte conversion runs only over rows of duplicated
    digests (``ids_key(rows)`` is called lazily with just those rows)."""
    uniq, inv, ucnt = np.unique(hb, return_inverse=True,
                                return_counts=True)
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, cnts)
    keep_idx = np.empty(len(uniq), np.int64)
    single_rows = (ucnt == 1)[inv]
    keep_idx[inv[single_rows]] = np.flatnonzero(single_rows)
    if not single_rows.all():
        rows = np.flatnonzero(~single_rows)
        sub_inv = inv[rows]
        order = np.lexsort((ids_key(rows), sub_inv))
        si = sub_inv[order]
        firsts = np.ones(len(si), dtype=bool)
        firsts[1:] = si[1:] != si[:-1]
        keep_idx[si[firsts]] = rows[order[firsts]]
    return keep_idx, sums


def _ids_key_fn(ids):
    """Lazy min-comparable key for an Arrow id column: ASCII bytes when
    encodable (byte order == str order), object fallback otherwise."""
    import pyarrow.compute as pc

    def key(rows: np.ndarray) -> np.ndarray:
        sub = pc.take(ids, pa.array(rows)).to_numpy(zero_copy_only=False)
        if np.issubdtype(sub.dtype, np.number):
            return sub
        try:
            return sub.astype("S")
        except UnicodeEncodeError:
            return sub

    return key


def _content_hash_partial_from(tbl: pa.Table, h_col: str,
                               id_col: str) -> pa.Table:
    """(hash, min_id, cnt) partial from an already-hashed column —
    Arrow-native: the digest column is viewed as fixed-width bytes
    straight off the value buffer (zero per-row objects; the pandas
    round trip this replaces was the per-batch hot spot)."""
    import pyarrow.compute as pc

    h, ids = tbl[h_col], tbl[id_col]
    mask = pc.and_(pc.is_valid(h), pc.is_valid(ids))
    if not pc.all(pc.fill_null(mask, False)).as_py():
        t = tbl.filter(pc.fill_null(mask, False))
        h, ids = t[h_col], t[id_col]
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if len(h) == 0:
        return pa.table({
            "h": pa.array([], type=pa.string()),
            "min_id": pa.array([], type=tbl[id_col].type),
            "cnt": pa.array([], type=pa.int64()),
        })
    hb = _fixed_width_view(h)
    if hb is None:                       # ragged/exotic layout fallback
        df = pd.DataFrame({"h": h.to_pandas(), "min_id": ids.to_pandas()})
        df["cnt"] = 1
        g = _groups_from_frame(df)
        return pa.table({
            "h": pa.array(g["h"], type=pa.string()),
            "min_id": pa.Array.from_pandas(g["keep_id"],
                                           type=tbl[id_col].type),
            "cnt": pa.array(g["n"].to_numpy(dtype=np.int64),
                            type=pa.int64()),
        })
    keep_idx, sums = _merge_hash_rows(
        hb, _ids_key_fn(ids), np.ones(len(hb), dtype=np.int64))
    ki = pa.array(keep_idx)
    return pa.table({
        "h": pc.take(h, ki),
        "min_id": pc.take(ids, ki),
        "cnt": pa.array(sums, type=pa.int64()),
    })


def shared_passage_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                         ngram: int = 3, window: int = 4,
                         hash_fn: str = "fast", max_bucket: int = 256,
                         auto_driver_limit: int = 4_000_000,
                         as_dataset: bool = False):
    """Cross-document SHARED-PASSAGE detection: pairs of docs whose
    winnowing fingerprint sets intersect, with the intersection size.
    By the winnowing guarantee (Schleimer et al. 2003) any two docs
    sharing a run of ``window + ngram - 1`` words share >= 1
    fingerprint — this catches copied passages that whole-document
    dedup (exact or MinHash) misses.

    Shape: the fingerprint stage streams (doc_id, fp) rows; ONE
    ``groupby(fp)`` co-locates each fingerprint's postings; in-bucket
    pair expansion is vectorized (triu indices) and skew-capped at
    ``max_bucket`` docs per fingerprint (a fp shared by B docs is
    boilerplate, not plagiarism — emitting B² pairs for it would be
    the quadratic blowup every LSH-family stage here guards against).
    Pair rows are O(near-duplicate pairs); the per-pair intersection
    count folds on the driver UNDER ``auto_driver_limit`` rows, else
    through the coarse pair-hash-bucket exchange (same pair → same
    bucket, so per-bucket counts are global) and the driver only ever
    folds the REDUCED ``(doc_a, doc_b, n_shared)`` rows.

    Returns a pyarrow Table ``(doc_a, doc_b, n_shared)`` with
    ``doc_a < doc_b``, sorted by (doc_a, doc_b).  With
    ``as_dataset=True`` the reduced rows come back as a Dataset
    instead (same columns, NO global order) and never land on the
    driver — the scale entry point: at the 20× duplication stress the
    RESULT is 106M distinct pairs, driver-sized only because the Table
    contract collects it (13.5 GB measured; the Dataset lane holds
    refs only).
    """
    from xema_ray.stages.text import winnow_fingerprints

    fps = winnow_fingerprints(ds, text_col=text_col, ngram=ngram,
                              window=window, hash_fn=hash_fn,
                              id_col=id_col)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2 or len(ids) > max_bucket:
            return pd.DataFrame({"doc_a": ids[:0], "doc_b": ids[:0]})
        ai, bi = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ai], "doc_b": ids[bi]})

    pair_rows = fps.groupby("fp").map_groups(bucket_pairs,
                                             batch_format="pandas") \
        .materialize()
    if pair_rows.count() > auto_driver_limit:
        from xema_ray.stages.shuffle import default_shuffle_buckets

        n_buckets = default_shuffle_buckets()

        def cnt(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(["doc_a", "doc_b"], as_index=False).size() \
                .rename(columns={"size": "n_shared"})
            out["n_shared"] = out["n_shared"].astype(np.int64)
            return out

        pair_rows = pair_rows.map_batches(
            lambda t: _tag_pair_hash_mod(t, n_buckets, "_cb"),
            batch_format="pyarrow") \
            .groupby("_cb").map_groups(cnt, batch_format="pandas")
        if as_dataset:
            return pair_rows
        frames = [b.to_pandas() for b in
                  pair_rows.iter_batches(batch_format="pyarrow")
                  if b.num_rows]
        out = pd.concat(frames, ignore_index=True) \
            .sort_values(["doc_a", "doc_b"], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)
    frames = [b.to_pandas() for b in
              pair_rows.iter_batches(batch_format="pyarrow")]
    if not frames:
        tbl = pa.table({"doc_a": pa.array([]), "doc_b": pa.array([]),
                        "n_shared": pa.array([], type=pa.int64())})
    else:
        df = pd.concat(frames, ignore_index=True)
        out = df.groupby(["doc_a", "doc_b"], sort=True, as_index=False) \
            .size().rename(columns={"size": "n_shared"})
        out["n_shared"] = out["n_shared"].astype(np.int64)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
    if as_dataset:
        # multi-block entry like every driver-fold result (ONE block
        # would serialize every downstream stage — _pairs_table_to_ds)
        return _pairs_table_to_ds(tbl)
    return tbl


# ----------------------------------------------------------------------
# quality-aware survivor selection
# ----------------------------------------------------------------------


def _best_partial_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Reduce (h, id, q, cnt) rows to one row per digest:
    ``(h, id=argmax(q, then min id), q, n=Σcnt)`` — same numpy
    fixed-width group-sort as :func:`_groups_from_frame` (primary key
    digest, then −q, then id; first row per group wins)."""
    if not len(df):
        return pd.DataFrame({"h": [], "id": [], "q": [], "cnt": []})
    hb = df["h"].to_numpy().astype("S")
    uniq, inv = np.unique(hb, return_inverse=True)
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, df["cnt"].to_numpy(dtype=np.int64))
    ids = df["id"].to_numpy()
    id_key = ids if np.issubdtype(ids.dtype, np.number) else ids.astype("S")
    q = df["q"].to_numpy(dtype=np.int64)
    order = np.lexsort((id_key, -q, inv))
    inv_s = inv[order]
    firsts = np.ones(len(inv_s), dtype=bool)
    firsts[1:] = inv_s[1:] != inv_s[:-1]
    best = order[firsts]
    keep_idx = np.empty(len(uniq), np.int64)
    keep_idx[inv[best]] = best
    return pd.DataFrame({"h": df["h"].to_numpy()[keep_idx],
                         "id": ids[keep_idx], "q": q[keep_idx],
                         "cnt": sums})


def exact_dedup_best(ds, score_batch, col: str = "text",
                     id_col: str = "doc_id", hash_fn: str = "fast",
                     min_copies: int = 2):
    """Duplicate-group report keeping the BEST copy, not the first:
    one row per content group with ≥ ``min_copies`` members —
    ``(h, doc_id, q, n_copies)`` where the survivor maximizes
    ``(score, then min id)``.

    What real pipelines do when exact copies differ in surrounding
    quality signals (crawl snapshots of the same page: keep the one
    whose extraction scored best).  Same exchange as
    :func:`exact_dedup_groups`: per-batch partials pre-reduce each
    digest to ONE rider row (id, score, count) so only digests move;
    coarse hash-bucket groupby; vectorized group-sort merge per bucket.
    ``score_batch(tbl) -> int64 array`` computes the per-row score
    (integer fixed-point, so merge order can't change the argmax).
    """
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "h": _hash_text_column(t, col, hash_fn).to_pandas(),
            "id": t[id_col].to_pandas(),
            "q": np.asarray(score_batch(t), dtype=np.int64),
            "cnt": np.ones(t.num_rows, dtype=np.int64)})
        df = df[df["h"].notna() & df["id"].notna()]
        red = _best_partial_frame(df)
        id_type = t.schema.field(id_col).type
        out = pa.table({"h": pa.array(red["h"], pa.string()),
                        "id": pa.array(red["id"], id_type),
                        "q": pa.array(red["q"].to_numpy(), pa.int64()),
                        "cnt": pa.array(red["cnt"], pa.int64())})
        return _attach_bucket(out)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        red = _best_partial_frame(g.drop(columns=["bucket"]))
        red = red[red["cnt"] >= min_copies]
        return pd.DataFrame({"h": red["h"], "doc_id": red["id"],
                             "q": red["q"].astype(np.int64),
                             "n_copies": red["cnt"].astype(np.int64)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(merge, batch_format="pandas")


def _attach_bucket(g: pa.Table, n_buckets: int = None) -> pa.Table:
    """Coarse digest-derived bucket column (pure function of h — no
    coordination; cf. _bucketed_hash_partial)."""
    from xema_ray.functions.sketches import hash_strings
    from xema_ray.stages.shuffle import default_shuffle_buckets

    if n_buckets is None:
        n_buckets = default_shuffle_buckets()
    if g.num_rows:
        hb = _fixed_width_view(g["h"])
        if hb is not None and hb.dtype.itemsize >= 16:
            bucket = (_hex_prefix_u64(hb) % np.uint64(n_buckets)) \
                .astype(np.int32)
        else:
            bucket = (hash_strings(g["h"].to_pylist()) % n_buckets) \
                .astype(np.int32)
    else:
        bucket = np.empty(0, dtype=np.int32)
    return g.append_column("bucket", pa.array(bucket, type=pa.int32()))


# ----------------------------------------------------------------------
# exact duplicated-span extraction (Lee et al. 2021, arXiv 2107.06499)
# ----------------------------------------------------------------------


def _words_lower(texts: pd.Series) -> pd.Series:
    """Lowercased ``[a-z0-9]+`` word lists per document — the shared
    tokenization for the gram/span lanes (regex findall dominates the
    scrub cost; callers that need BOTH grams and words compute this once
    and pass it to :func:`_gram_stream`)."""
    return texts.fillna("").str.lower().str.findall(_WORD_RE) \
        .reset_index(drop=True)


_WORD_RE = re.compile(r"[a-z0-9]+")


def _gram_stream(texts: pd.Series, n: int, hash_fn: str,
                 words_all: pd.Series = None):
    """Per-gram ``(doc_row, pos0, hash)`` arrays for every word
    ``n``-gram in the batch (docs with < n words contribute nothing —
    span semantics, unlike the fingerprint lane's whole-doc gram).

    ``hash_fn="fast"``: shared vectorized splitmix kernel, uint64.
    ``hash_fn="md5"``: full md5 hex over the joined gram string (S32
    bytes) — the cross-engine lane (SQL groups the gram STRINGS; equal
    strings <=> equal md5 up to collisions far below corpus scale).
    """
    if words_all is None:
        words_all = _words_lower(texts)
    if hash_fn == "md5":
        rows, pos, hs = [], [], []
        for r, words in enumerate(words_all):
            for j in range(len(words) - n + 1):
                rows.append(r)
                pos.append(j)
                hs.append(hashlib.md5(
                    " ".join(words[j:j + n]).encode()).hexdigest())
        return (np.asarray(rows, np.int64), np.asarray(pos, np.int64),
                np.asarray(hs, dtype="S32"))
    from xema_ray.functions.sketches import word_ngram_hashes

    flat, offsets = word_ngram_hashes(words_all, n)
    wc = words_all.str.len().to_numpy(dtype=np.int64)
    n_grams = np.diff(offsets)
    real = wc >= n  # short docs contributed one whole-doc gram: drop it
    keep = np.repeat(real, n_grams)
    rows = np.repeat(np.arange(len(wc), dtype=np.int64), n_grams)[keep]
    pos = (np.arange(len(flat), dtype=np.int64)
           - np.repeat(offsets[:-1], n_grams))[keep]
    return rows, pos, flat[keep]


def duplicated_grams(ds, n: int = 8, min_count: int = 2,
                     text_col: str = "text", hash_fn: str = "fast",
                     n_buckets: int = None) -> np.ndarray:
    """Sorted hashes of word n-grams occurring >= ``min_count`` times
    corpus-wide (total occurrences, within-doc repeats included) — the
    digest-only counting pass.  Per-batch ``np.unique`` partials
    (hash, cnt) exchange through the coarse hash-bucket groupby (each
    hash in exactly one bucket => per-bucket sums are exact); only the
    duplicated tail leaves the workers, never gram strings."""
    from xema_ray.functions.sketches import hash_strings
    from xema_ray.stages.shuffle import default_shuffle_buckets

    if hash_fn == "fast":
        # scale lane: the gram keys are near-unique (the same worst
        # case as uniform bigrams), so route them through the shared
        # raw-task u64 hash exchange instead of the Ray sort-based
        # groupby (see stats.u64_key_exchange notes; 131 s -> ~13 s at
        # 175 M keys).  Per-bucket counts are global, so the
        # >= min_count cut per bucket is globally exact.
        from xema_ray.stages.stats import u64_key_exchange

        def gram_keys(t: pa.Table) -> np.ndarray:
            _, _, h = _gram_stream(t[text_col].to_pandas(), n, "fast")
            return h

        keys, _ = u64_key_exchange(
            ds.select_columns([text_col]).to_arrow_refs(), gram_keys,
            lambda uk, cnts: (uk[cnts >= min_count],
                              cnts[cnts >= min_count]),
            n_buckets=n_buckets)
        return np.sort(keys)

    if hash_fn == "verified":
        # STRING-exact lane at u64-exchange speed (r5, VERDICT item 6 —
        # the md5 lane's per-gram hashlib loop was ~10 s of the 15 s
        # doc_dup_spans wall at sf0.1): pass A counts splitmix64 keys
        # through the raw-task exchange — equal strings always share a
        # key, so the >= min_count cut is a guaranteed SUPERSET of the
        # true duplicated grams (a cross-string collision only merges
        # counts upward); pass B streams the corpus once more,
        # prefilters occurrences against the broadcast candidate keys
        # and recounts the few candidate gram STRINGS exactly (driver
        # fold is O(candidate grams), boilerplate-sized).  Returns
        # ``(strings, stream_hashes)`` — the verified duplicated gram
        # strings plus their fast-lane hashes (the gram hash combines
        # WORD hashes, so it can't be recomputed from the joined
        # string) — exact string semantics, no hash caveat at all.
        import ray

        cand = duplicated_grams(ds, n=n, min_count=min_count,
                                text_col=text_col, hash_fn="fast",
                                n_buckets=n_buckets)
        empty = (np.empty(0, dtype=object), np.empty(0, np.uint64))
        if not len(cand):
            return empty
        cand_ref = ray.put(cand)

        def str_partials(t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pandas()
            words_all = _words_lower(texts)
            rows, pos, h = _gram_stream(texts, n, "fast",
                                        words_all=words_all)
            ck = ray.get(cand_ref)
            if len(h):
                i = np.clip(np.searchsorted(ck, h), 0, len(ck) - 1)
                hit = ck[i] == h
            else:
                hit = np.zeros(0, bool)
            gs = _gram_strings_at(words_all, rows[hit], pos[hit], n)
            uniq, first, cnts = np.unique(gs, return_index=True,
                                          return_counts=True)
            return pa.table({"g": pa.array(uniq, type=pa.string()),
                             "sh": pa.array(h[hit][first], pa.uint64()),
                             "c": pa.array(cnts.astype(np.int64))})

        frames = [b.to_pandas() for b in
                  ds.select_columns([text_col])
                  .map_batches(str_partials, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow") if b.num_rows]
        if not frames:
            return empty
        agg = pd.concat(frames, ignore_index=True) \
            .groupby("g", sort=True).agg(c=("c", "sum"),
                                         sh=("sh", "first"))
        keep = agg["c"].to_numpy() >= min_count
        return (agg.index[keep].to_numpy(dtype=object),
                agg["sh"].to_numpy(dtype=np.uint64)[keep])

    if n_buckets is None:
        n_buckets = default_shuffle_buckets()

    def partial(t: pa.Table) -> pa.Table:
        _, _, h = _gram_stream(t[text_col].to_pandas(), n, hash_fn)
        uniq, cnt = np.unique(h, return_counts=True)
        if not len(uniq):
            return pa.table({
                "h": pa.array([], pa.string() if hash_fn == "md5"
                              else pa.uint64()),
                "c": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int32())})
        if hash_fn == "md5":
            bucket = (_hex_prefix_u64(uniq) % n_buckets).astype(np.int32)
            hcol = pa.array([x.decode() for x in uniq], pa.string())
        else:
            bucket = (uniq % np.uint64(n_buckets)).astype(np.int32)
            hcol = pa.array(uniq, pa.uint64())
        return pa.table({"h": hcol,
                         "c": pa.array(cnt.astype(np.int64)),
                         "bucket": pa.array(bucket)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("h", sort=False)["c"].sum()
        return pd.DataFrame({"h": agg.index[agg >= min_count]})

    rows = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow").groupby("bucket").map_groups(
        fold, batch_format="pandas").take_all()
    if hash_fn == "md5":
        return np.sort(np.asarray([r["h"] for r in rows], dtype="S32"))
    return np.sort(np.asarray([r["h"] for r in rows], dtype=np.uint64))


def _gram_strings_at(words_all: pd.Series, rows: np.ndarray,
                     pos: np.ndarray, n: int) -> np.ndarray:
    """Reconstruct the gram strings at specific (doc_row, word_pos)
    occurrences — only ever called on DUPLICATE-candidate hits, so the
    Python join loop is bounded by duplicated occurrences, not corpus
    grams."""
    return np.array([" ".join(words_all.iloc[r][p:p + n])
                     for r, p in zip(rows, pos)], dtype=object)


class _DupGramSet:
    """Membership tester for a duplicated-gram artifact.  uint64/S32
    arrays test stream hashes directly (fast/md5 lanes); a VERIFIED
    ``(strings, stream_hashes)`` tuple tests via a fast-hash prefilter
    plus string equality on the few candidates — exact, and the
    expensive stream stays the vectorized fast lane."""

    def __init__(self, dup):
        self.verified = isinstance(dup, tuple)
        if self.verified:
            strings, hashes = dup
            order = np.argsort(hashes)
            self.pre = hashes[order]
            self.index = pd.Index(strings)
        else:
            self.dup = dup

    @property
    def stream_hash_fn(self) -> str:
        return "fast" if self.verified else \
            ("md5" if self.dup.dtype.kind == "S" else "fast")

    def hits(self, h: np.ndarray, rows: np.ndarray, pos: np.ndarray,
             words_all: pd.Series, n: int) -> np.ndarray:
        table = self.pre if self.verified else self.dup
        if not (len(h) and len(table)):
            return np.zeros(len(h), bool)
        i = np.clip(np.searchsorted(table, h), 0, len(table) - 1)
        hit = table[i] == h
        if self.verified and hit.any():
            at = np.flatnonzero(hit)
            gs = _gram_strings_at(words_all, rows[at], pos[at], n)
            ok = self.index.get_indexer(gs) >= 0
            hit = np.zeros(len(h), bool)
            hit[at[ok]] = True
        return hit


def dup_spans(ds, n: int = 8, min_count: int = 2, text_col: str = "text",
              id_col: str = "doc_id", hash_fn: str = "fast",
              concurrency=(1, 8)):
    """Exact duplicated-SPAN extraction (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every maximal run of
    words whose constituent word ``n``-grams each occur >= ``min_count``
    times corpus-wide.  The removal manifest for substring-level dedup
    — exact dedup catches identical docs, MinHash near-identical docs;
    this catches the verbatim PASSAGES shared across otherwise-distinct
    documents (licenses, templates, quoted spans) that n-copy memorized
    text comes from.

    Scale shape: one digest-only counting exchange (8 B/gram partials,
    bucket-exact sums) + a broadcast of the duplicated-gram set
    (boilerplate-sized by assumption, same contract as line dedup) + a
    streaming mark-and-merge pass (vectorized run detection, no
    shuffle).  Returns ``(doc_id, start_pos, end_pos, n_words)`` with
    1-based inclusive word positions.
    """
    import ray

    dup = duplicated_grams(ds, n=n, min_count=min_count,
                           text_col=text_col, hash_fn=hash_fn)
    dup_ref = ray.put(dup)

    class MarkSpans:
        def __init__(self):
            self.dup = _DupGramSet(ray.get(dup_ref))  # one read/actor

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pandas()
            words_all = _words_lower(texts)
            rows, pos, h = _gram_stream(texts, n,
                                        self.dup.stream_hash_fn,
                                        words_all=words_all)
            out_schema = {
                id_col: t.schema.field(id_col).type,
            }
            hit = self.dup.hits(h, rows, pos, words_all, n)
            rows, pos = rows[hit], pos[hit]
            # maximal runs: a new span starts at a doc change or a
            # position gap (order within a doc is the emission order)
            if len(rows):
                brk = np.ones(len(rows), bool)
                brk[1:] = (rows[1:] != rows[:-1]) | (np.diff(pos) != 1)
                sidx = np.flatnonzero(brk)
                eidx = np.append(sidx[1:], len(rows)) - 1
                ids = t[id_col].take(pa.array(rows[sidx])) \
                    .combine_chunks() if isinstance(t[id_col],
                                                    pa.ChunkedArray) \
                    else t[id_col].take(pa.array(rows[sidx]))
                start = pos[sidx] + 1
                end = pos[eidx] + n
                return pa.table({
                    id_col: ids,
                    "start_pos": pa.array(start, pa.int64()),
                    "end_pos": pa.array(end, pa.int64()),
                    "n_words": pa.array(end - start + 1, pa.int64()),
                })
            return pa.table({
                id_col: pa.array([], out_schema[id_col]),
                "start_pos": pa.array([], pa.int64()),
                "end_pos": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
            })

    return ds.map_batches(MarkSpans, batch_format="pyarrow",
                          concurrency=concurrency)


def remove_spans(ds, spans, text_col: str = "text",
                 id_col: str = "doc_id", concurrency=(1, 8)):
    """APPLY a duplicated-span manifest (Lee et al. 2021 step 2): cut
    the flagged word runs out of every document.  ``spans`` is the
    :func:`dup_spans` output (pyarrow Table or small Dataset — the
    manifest is boilerplate-sized by the same contract as the line-
    dedup common set) broadcast once via ``ray.put``; the pass streams,
    no shuffle.  Output ``(doc_id, n_words, n_removed, clean_text)``
    where ``clean_text`` is the surviving words joined by one space
    (word-stream semantics, same normalization as the manifest)."""
    import re

    import ray

    if not isinstance(spans, pa.Table):
        spans = pa.concat_tables(
            b for b in spans.iter_batches(batch_format="pyarrow"))
    by_doc: dict = {}
    for r in spans.to_pylist():
        by_doc.setdefault(r[id_col], []).append(
            (r["start_pos"], r["end_pos"]))
    ref = ray.put(by_doc)

    class Scrub:
        def __init__(self):
            self.by_doc = ray.get(ref)
            self.word_re = re.compile(r"[a-z0-9]+")

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t[text_col].to_pandas().fillna("").str.lower() \
                .str.findall(self.word_re).reset_index(drop=True)
            ids = t[id_col].to_pylist()
            n_words = np.zeros(len(ids), np.int64)
            n_removed = np.zeros(len(ids), np.int64)
            clean = []
            for i, (doc, words) in enumerate(zip(ids, texts)):
                n_words[i] = len(words)
                iv = self.by_doc.get(doc)
                if not iv:
                    clean.append(" ".join(words))
                    continue
                drop = np.zeros(len(words), bool)
                for s, e in iv:  # 1-based inclusive
                    drop[s - 1:e] = True
                n_removed[i] = int(drop.sum())
                clean.append(" ".join(
                    w for w, d in zip(words, drop) if not d))
            return pa.table({
                id_col: t[id_col],
                "n_words": pa.array(n_words),
                "n_removed": pa.array(n_removed),
                "clean_text": pa.array(clean, pa.string()),
            })

    return ds.map_batches(Scrub, batch_format="pyarrow",
                          concurrency=concurrency)


def _span_scrub_table(tbl: pa.Table, dup: np.ndarray, n: int,
                      text_col: str, id_col: str) -> pa.Table:
    """One-pass mark + excise for the checkpointed shard map: spans are
    recomputed LOCALLY from the broadcast duplicated-gram set (the only
    shared state), so a shard task needs no manifest join."""
    texts = tbl[text_col].to_pandas()
    words_all = _words_lower(texts)  # tokenize ONCE; grams reuse it
    dset = _DupGramSet(dup)
    rows, pos, h = _gram_stream(texts, n, dset.stream_hash_fn,
                                words_all=words_all)
    hit = dset.hits(h, rows, pos, words_all, n)
    n_words = words_all.str.len().to_numpy(dtype=np.int64)
    drop_masks = [None] * len(words_all)
    for r, p in zip(rows[hit], pos[hit]):
        m = drop_masks[r]
        if m is None:
            m = drop_masks[r] = np.zeros(n_words[r], bool)
        m[p:p + n] = True
    n_removed = np.zeros(len(words_all), np.int64)
    clean = []
    for r, words in enumerate(words_all):
        m = drop_masks[r]
        if m is None:
            clean.append(" ".join(words))
            continue
        n_removed[r] = int(m.sum())
        clean.append(" ".join(w for w, d in zip(words, m) if not d))
    return pa.table({
        id_col: tbl[id_col],
        "n_words": pa.array(n_words),
        "n_removed": pa.array(n_removed),
        "clean_text": pa.array(clean, pa.string()),
    })


def run_span_dedup(paths, out_dir: str, n: int = 8, min_count: int = 2,
                   text_col: str = "text", id_col: str = "doc_id",
                   batch_rows: int = 16384):
    """Checkpointed, RESUMABLE duplicated-span dedup — the production
    runner (mirrors ``run_line_dedup``): the duplicated-gram set is
    computed once and persisted to ``<out_dir>/dup_grams.parquet`` with
    a signature over every input shard's lineage + config (a rerun with
    unchanged inputs loads it instead of recounting); the scrub pass
    runs through :func:`~xema_ray.state.checkpoint.run_map_shards`
    (atomic per-shard parquet, manifest resume) with the gram-set
    digest embedded in its config signature."""
    import functools
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from xema_ray.state.checkpoint import _lineage, run_map_shards

    paths = sorted(paths)
    os.makedirs(out_dir, exist_ok=True)
    cfg = {"n": n, "min_count": min_count, "text_col": text_col}
    sig = hashlib.md5(json.dumps(
        [cfg] + [_lineage(p) for p in paths]).encode()).hexdigest()
    dup_file = os.path.join(out_dir, "dup_grams.parquet")
    sig_file = dup_file + ".sig"
    if (os.path.exists(dup_file) and os.path.exists(sig_file)
            and open(sig_file).read() == sig):
        dup = pq.read_table(dup_file)["h"].to_numpy(
            zero_copy_only=False).astype(np.uint64)
    else:
        dup = duplicated_grams(rd.read_parquet(paths), n=n,
                               min_count=min_count, text_col=text_col,
                               hash_fn="fast")
        tmp = dup_file + ".tmp"
        pq.write_table(pa.table({"h": pa.array(dup, pa.uint64())}), tmp)
        os.replace(tmp, dup_file)
        with open(sig_file, "w") as f:
            f.write(sig)
    dup_sig = hashlib.md5(dup.tobytes()).hexdigest()[:16]
    fn = functools.partial(_span_scrub_table, dup=dup, n=n,
                           text_col=text_col, id_col=id_col)
    return run_map_shards(
        paths, out_dir, fn, columns=[id_col, text_col],
        cfg_sig=f"spandedup:{json.dumps(cfg, sort_keys=True)}"
                f":dup={dup_sig}",
        batch_rows=batch_rows)



# ----------------------------------------------------------------------
# checkpointed near-dup runner (pairs -> verify -> clusters -> survivors)
# ----------------------------------------------------------------------


from dataclasses import dataclass as _dataclass


@_dataclass
class NearDupSummary:
    docs: int
    pairs: int
    clusters: int
    removed: int
    survivors: int
    partitions_done: int
    partitions_skipped: int
    manifest_path: str
    out_dir: str


def _write_ds_parquet_atomic(ds, out_file: str, empty_schema=None):
    """Stream a Dataset into ONE parquet file atomically (tmp + rename)
    without driver materialization — batches flow through a
    ParquetWriter one at a time."""
    import os

    import pyarrow.parquet as pq

    tmp = out_file + ".tmp"
    writer = None
    try:
        for b in ds.iter_batches(batch_format="pyarrow"):
            if writer is None:
                writer = pq.ParquetWriter(tmp, b.schema)
            writer.write_table(b)
        if writer is None:
            sch = empty_schema
            if sch is None:
                base = ds.schema(fetch_if_missing=True)
                sch = base.base_schema if base is not None and \
                    isinstance(base.base_schema, pa.Schema) else \
                    pa.schema([])
            pq.write_table(sch.empty_table(), tmp)
        else:
            writer.close()
            writer = None
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, out_file)


def _drop_rows_table(t: pa.Table, drop_ids=None, id_col: str = "doc_id"):
    """Shard-level survivor filter for :func:`run_near_dedup` — a
    top-level picklable kernel for ``run_map_shards``."""
    import pyarrow.compute as pc

    if drop_ids is None or not len(drop_ids):
        return t
    vs = pa.array(list(drop_ids)).cast(t.schema.field(id_col).type)
    drop = pc.fill_null(pc.is_in(t[id_col], value_set=vs), False)
    return t.filter(pc.invert(drop))


def run_near_dedup(paths, out_dir: str, threshold: float = 0.8,
                   candidates: str = "minhash", verify: str = "hash",
                   text_col: str = "text", id_col: str = "doc_id",
                   n: int = 3, batch_rows: int = 16384) -> NearDupSummary:
    """Checkpointed, RESUMABLE near-duplicate dedup — the production
    runner behind the ``neardup`` CLI (round-4 verdict item #2; mirrors
    ``run_span_dedup``):

    1. the candidate-pair -> exact-verify -> connected-components chain
       runs once and persists ``<out_dir>/pairs.parquet`` and
       ``<out_dir>/clusters.parquet`` (both bounded by duplicate docs,
       streamed to disk — never driver-materialized) under a signature
       covering every input shard's lineage + the config; a rerun with
       unchanged inputs loads them instead of recomputing;
    2. the survivor filter runs through
       :func:`~xema_ray.state.checkpoint.run_map_shards` (one Ray task
       per shard, atomic per-shard parquet under
       ``<out_dir>/survivors/shards/``, manifest resume) with a digest
       of the drop-id set in its config signature, so a changed cluster
       table invalidates exactly the downstream shards.

    A run killed between any two steps resumes to byte-identical output.
    """
    import functools
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from xema_ray.stages.cluster import dup_clusters
    from xema_ray.state.checkpoint import _lineage, run_map_shards

    if candidates not in ("minhash", "allpairs"):
        raise ValueError(f"unknown candidates {candidates!r}")
    paths = sorted(paths)
    os.makedirs(out_dir, exist_ok=True)
    cfg = {"threshold": threshold, "candidates": candidates,
           "verify": verify, "text_col": text_col, "id_col": id_col,
           "n": n}
    sig = hashlib.md5(json.dumps(
        [cfg] + [_lineage(p) for p in paths]).encode()).hexdigest()
    pairs_file = os.path.join(out_dir, "pairs.parquet")
    clusters_file = os.path.join(out_dir, "clusters.parquet")
    sig_file = os.path.join(out_dir, "neardup.sig")
    if not (os.path.exists(pairs_file) and os.path.exists(clusters_file)
            and os.path.exists(sig_file)
            and open(sig_file).read() == sig):
        thin = rd.read_parquet(paths, columns=[id_col, text_col])
        if candidates == "allpairs":
            cands = allpairs_jaccard_pairs(thin, col=text_col,
                                           id_col=id_col, n=n,
                                           threshold=threshold)
        else:
            # estimator threshold below the exact cut for candidate
            # recall (the exact jaccard >= threshold filter defines the
            # output set)
            cands = minhash_lsh_pairs(thin, col=text_col, id_col=id_col,
                                      shingle=n,
                                      threshold=max(0.0, threshold - 0.05))
        pairs_ds = verify_pairs_jaccard(cands, thin, col=text_col,
                                        id_col=id_col, n=n,
                                        threshold=threshold,
                                        method=verify).materialize()
        clusters_ds = dup_clusters(pairs_ds).materialize()
        _write_ds_parquet_atomic(pairs_ds, pairs_file)
        _write_ds_parquet_atomic(clusters_ds, clusters_file)
        with open(sig_file, "w") as f:
            f.write(sig)

    # drop set: non-keeper cluster members — bounded by duplicate docs.
    # An empty pair graph can leave a columnless/zero-row artifact (a
    # fully-materialized empty Dataset has no schema to write) — treat
    # it as "no duplicates".
    ct = pq.read_table(clusters_file)
    if "keep" in ct.column_names and ct.num_rows:
        dcol = id_col if id_col in ct.column_names else "doc_id"
        drop_ids = ct.filter(pc.equal(ct["keep"], 0))[dcol].to_pylist()
        n_clusters = len(pc.unique(ct["cluster_id"]))
    else:
        drop_ids, n_clusters = [], 0
    drop_sig = hashlib.md5(
        "\x1f".join(sorted(map(str, drop_ids))).encode()).hexdigest()[:16]
    fn = functools.partial(_drop_rows_table, drop_ids=drop_ids,
                           id_col=id_col)
    ms = run_map_shards(
        paths, os.path.join(out_dir, "survivors"), fn,
        cfg_sig=f"neardup:{json.dumps(cfg, sort_keys=True)}"
                f":drop={drop_sig}",
        batch_rows=batch_rows)
    return NearDupSummary(
        docs=ms.rows_in, pairs=pq.read_metadata(pairs_file).num_rows,
        clusters=n_clusters, removed=len(drop_ids),
        survivors=ms.rows_out, partitions_done=ms.partitions_done,
        partitions_skipped=ms.partitions_skipped,
        manifest_path=ms.manifest_path, out_dir=out_dir)


# ----------------------------------------------------------------------
# exact set-similarity self-join (AllPairs / PPJoin prefix filtering)
# ----------------------------------------------------------------------
#
# Reference scope note: Xema has no similarity operators; this family is
# part of the training-data suite the build brief asks for.  Algorithm:
# Bayardo, Ma, Srikant "Scaling Up All Pairs Similarity Search" (WWW'07)
# and Xiao et al. "Efficient Similarity Joins for Near Duplicate
# Detection" (PPJoin, WWW'08) — both public.


def _doc_gram_sets(texts: pd.Series, n: int):
    """Per-doc DISTINCT word-n-gram hash sets ``(flat, offsets)`` —
    same gram semantics as the MinHash lane (short docs contribute one
    whole-doc gram, empty docs the empty gram, matching the SQL oracle's
    ``CASE WHEN len(w) >= n`` arm)."""
    from xema_ray.functions.sketches import unique_per_row, word_ngram_hashes

    words = _words_lower(texts)
    flat, offs = word_ngram_hashes(words, n, empty_doc_gram=True)
    return unique_per_row(flat, offs)


def allpairs_jaccard_pairs(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    order: str = "df",
    hot_min_df: int = 32,
    max_posting: Optional[int] = None,
    strategy: str = "auto",
    auto_driver_limit: int = 4_000_000,
):
    """EXACT candidate pairs at n-gram Jaccard >= ``threshold`` via
    prefix-filtered set-similarity self-join (AllPairs / PPJoin).

    Unlike MinHash-LSH this is lossless by construction: two sets with
    Jaccard >= t MUST share a token inside their length-
    ``s - ceil(t*s) + 1`` prefixes under ANY global token order, so the
    candidate set is a guaranteed superset of the true pair set —
    composing with :func:`verify_pairs_jaccard` yields the exact answer
    with recall certified by the algorithm, not by corpus luck.

    Scale shape: only PREFIX postings are exchanged (a ``1 - t/(1+t)``
    fraction of each doc's distinct grams), grouped by gram hash through
    the shared coarse-bucket exchange.  ``order='df'`` (default) runs ONE
    digest-only document-frequency pass through the raw-task u64 exchange
    and broadcasts only the HOT grams (df >= ``hot_min_df``) — prefixes
    then hold each doc's rarest grams, so posting lists stay tiny and the
    broadcast is O(hot vocabulary), never O(vocabulary).  ``order='hash'``
    skips the pass (correct under any total order; more candidates).
    Gram identity is the shared 64-bit splitmix hash — a cross-gram
    collision (~2^-64 per pair) could at worst add a spurious candidate,
    which exact verification removes.

    ``max_posting`` (default None = exact) optionally caps degenerate
    posting lists with doc_id-sorted retention — the documented skew
    guard, which trades the recall guarantee; with df ordering the
    prefix of a real corpus holds rare grams and the cap stays inert.

    Returns a Dataset of distinct ``(doc_a, doc_b)`` with doc_a < doc_b.
    """
    import ray

    eps = 1e-9
    hot_ref = None
    if order == "df":
        from xema_ray.stages.stats import u64_key_exchange

        def df_keys(tbl: pa.Table) -> np.ndarray:
            flat, _ = _doc_gram_sets(tbl[col].to_pandas(), n)
            return flat  # per-doc distinct => counts are document freqs

        hk, hd = u64_key_exchange(
            ds.select_columns([col]).to_arrow_refs(), df_keys,
            lambda uk, cnts: (uk[cnts >= hot_min_df],
                              cnts[cnts >= hot_min_df]))
        o = np.argsort(hk)
        hot_ref = ray.put((hk[o], hd[o].astype(np.int64)))
    elif order != "hash":
        raise ValueError(f"unknown order {order!r}")

    def postings(t: pa.Table) -> pa.Table:
        flat, offs = _doc_gram_sets(t[col].to_pandas(), n)
        sizes = np.diff(offs)
        ids = np.repeat(np.asarray(t[id_col].to_pylist(), dtype=object),
                        sizes)
        if hot_ref is not None and len(flat):
            hk, hd = ray.get(hot_ref)  # plasma-local read per task
            if len(hk):
                idx = np.minimum(np.searchsorted(hk, flat), len(hk) - 1)
                df = np.where(hk[idx] == flat, hd[idx], 0)
            else:
                df = np.zeros(len(flat), np.int64)
        else:
            df = np.zeros(len(flat), np.int64)
        rows = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        # rare-first canonical order: (df with cold grams at 0, hash);
        # a pure function of the gram + the broadcast hot table, so
        # every doc in every batch sorts its set identically
        order_ = np.lexsort((flat, df, rows))
        f2, ids2 = flat[order_], ids[order_]
        pos = (np.arange(len(f2), dtype=np.int64)
               - np.repeat(offs[:-1], sizes))
        # prefix length s - ceil(t*s) + 1; eps makes the ceil LOOSE
        # (never smaller prefixes than the bound requires)
        p = sizes - np.ceil(threshold * sizes - eps).astype(np.int64) + 1
        keep = pos < np.repeat(p, sizes)
        # explicit doc_id type: a zero-row batch's empty object array
        # would infer a NULL-typed column and break schema unification
        # with the other blocks (r4 advice)
        return pa.table({
            "gram": pa.array(f2[keep].view(np.int64), type=pa.int64()),
            "doc_id": pa.array(ids2[keep],
                               type=t.schema.field(id_col).type),
            "size": pa.array(sizes.repeat(sizes)[keep].astype(np.int64)),
            "pos": pa.array(pos[keep], type=pa.int64()),
        })

    post_rows = ds.map_batches(postings, batch_format="pyarrow")
    req_f = threshold / (1.0 + threshold)

    _NO_PAIRS = {"doc_a": pd.Series([], dtype=object),
                 "doc_b": pd.Series([], dtype=object)}

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if not len(group):
            return pd.DataFrame(_NO_PAIRS)
        out_a, out_b = [], []  # numpy chunks; ONE frame built at the end
        g_all = group.sort_values("gram", kind="stable")
        keys = g_all["gram"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1], True])
        blk = np.diff(bounds)
        # drop singleton gram blocks VECTORIZED before the Python loop:
        # on a mostly-unique vocabulary nearly every block is size 1,
        # and iterating them in Python dominated the fold
        if (blk < 2).any():
            g_all = g_all.iloc[np.repeat(blk, blk) >= 2]
            keys = g_all["gram"].to_numpy()
            bounds = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1],
                                          True]) if len(keys) else \
                np.array([0])
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = g_all.iloc[s:e]
            if max_posting is not None:
                # doc_id sort only exists to make cap retention
                # deterministic; postings are per-doc distinct, so the
                # dedup is a no-op unless the corpus repeats doc_ids
                g = g.sort_values("doc_id", kind="stable") \
                    .drop_duplicates("doc_id").head(max_posting)
            m = len(g)
            if m < 2:
                continue
            ids = g["doc_id"].to_numpy()
            sz = g["size"].to_numpy(dtype=np.int64)
            ps = g["pos"].to_numpy(dtype=np.int64)
            for i in range(m - 1):
                sa, pa_i = sz[i], ps[i]
                sb, pb = sz[i + 1:], ps[i + 1:]
                mn = np.minimum(sa, sb)
                mx = np.maximum(sa, sb)
                # size filter: J <= min/max
                ok = mn >= np.ceil(threshold * mx - eps)
                # positional filter: under one global order, common
                # grams before this shared gram number <= min(pa, pb)
                # and at-or-after it <= min(sa-pa, sb-pb), so overlap
                # <= both summed — sound at EVERY shared gram
                # independently (no probe-order state needed; the
                # min-over-occurrences variant was measured to cut
                # <0.01% more candidates at 4x the fold cost)
                o_req = np.ceil(req_f * (sa + sb) - eps)
                ub = (np.minimum(pa_i, pb)
                      + np.minimum(sa - pa_i, sb - pb))
                ok &= ub >= o_req
                ok &= ids[i + 1:] != ids[i]
                if not ok.any():
                    continue
                jb = ids[i + 1:][ok]
                ja = np.full(len(jb), ids[i], dtype=ids.dtype)
                out_a.append(np.minimum(ja, jb))
                out_b.append(np.maximum(ja, jb))
        if not out_a:
            return pd.DataFrame(_NO_PAIRS)
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    return _pair_self_join(post_rows, block_pairs, ["gram"], [],
                           strategy, auto_driver_limit,
                           block_cap=max_posting)
