"""Text-analysis operators over ``documents`` — language ID, quality
scoring, token counting, document fingerprinting.  All deterministic, all
vectorized (pyarrow.compute / numpy inside map_batches), all mirrored by
DuckDB SQL oracles (__ray_entry__.oracle_sql) so the driver value-checks
them.

Language ID is the classic stopword-hit heuristic: score each language by
|distinct_words ∩ stoplist|, predict the argmax with a fixed tie-break
order.  (A real n-gram model is a drop-in replacement for the per-language
scorer; the Ray plumbing — cached stoplists in the actor, vectorized
membership — is the part that matters at 100 TB.)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (worker_token_hasher,
                                 TokenHasher, distinct_doc_tokens,
                                 md5_int60, tokenize_column)
from ..stages.taskmode import as_tasks

# fixed stoplists (mirrored verbatim in the SQL oracle)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "es": ["el", "los", "y", "es", "un", "una", "como", "por"],
    "fr": ["le", "les", "et", "est", "dans", "que", "pour", "sur"],
}
# argmax tie-break: first in this order wins (mirrored in the oracle CASE)
LANG_ORDER = ["en", "de", "es", "fr"]

SUBTOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"   # BPE-ish pre-tokenizer (RE2 in
                                           # both pyarrow and DuckDB)


def _docs(sf_dir: str, columns=("doc_id", "text")):
    from ..functions.scale import sized_read_parquet

    return sized_read_parquet(os.path.join(sf_dir, "documents.parquet"),
                              columns=list(columns))


class TextStatsStage:
    """Actor: documents batch -> token/char counts + quality score."""

    def __init__(self):
        self.hasher = worker_token_hasher()

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        n_tokens = pc.list_value_length(split).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nospace = pc.replace_substring(text, " ", "")
        n_chars = pc.utf8_length(nospace).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offsets, tok = tokenize_column(text, self.hasher)
        n_distinct, _, _ = distinct_doc_tokens(offsets, tok)
        n_sub = pc.count_substring_regex(
            pc.utf8_lower(text), SUBTOKEN_RE).to_numpy(
            zero_copy_only=False).astype(np.int64)

        nt = n_tokens.astype(np.float64)
        avg_len = n_chars / nt
        # identical expression order to the SQL oracle (bit-exact doubles);
        # published as basis-points int (floor), not a rounded float, so the
        # value-hash compare never hits round-half semantics differences
        quality = (0.4 * np.minimum(1.0, nt / 100.0)
                   + 0.3 * (n_distinct / nt)
                   + 0.3 * np.minimum(1.0, avg_len / 8.0))
        quality_q = np.floor(quality * 10000).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_distinct": pa.array(n_distinct),
            "n_subtokens": pa.array(n_sub),
            "quality_q": pa.array(quality_q),
        })


def text_quality(sf_dir: str, concurrency: int = 4):
    """(doc_id, n_tokens, n_distinct, n_subtokens, quality)."""
    return _docs(sf_dir).map_batches(as_tasks(TextStatsStage),
                                     batch_format="pyarrow",
                                     batch_size=4096)


class LangIdStage:
    """Actor: stopword-hit language ID.  Stoplist hash sets are built once
    per actor; per batch the work is one np.isin per language over the
    distinct (doc, token) postings."""

    def __init__(self):
        self.hasher = worker_token_hasher()
        self.stop_h60 = {lang: np.array(sorted(md5_int60(w) for w in ws),
                                        dtype=np.int64)
                         for lang, ws in STOPWORDS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        offsets, tok = tokenize_column(t["text"], self.hasher)
        counts, u_doc, u_tok = distinct_doc_tokens(offsets, tok)
        n = t.num_rows
        h60 = self.hasher.h60_array[u_tok]
        hits = {}
        for lang in LANG_ORDER:
            member = np.isin(h60, self.stop_h60[lang])
            hits[lang] = np.bincount(u_doc[member], minlength=n).astype(
                np.int64)
        stacked = np.stack([hits[lang] for lang in LANG_ORDER])  # [L, n]
        best = np.argmax(stacked, axis=0)       # first max wins = LANG_ORDER
        pred = np.array(LANG_ORDER, dtype=object)[best]
        return pa.table({
            "doc_id": t["doc_id"],
            "pred_lang": pa.array(pred, pa.string()),
            **{f"hits_{lang}": pa.array(hits[lang]) for lang in LANG_ORDER},
        })


def lang_id(sf_dir: str, concurrency: int = 4):
    """(doc_id, pred_lang, hits_en, hits_de, hits_es, hits_fr)."""
    return _docs(sf_dir).map_batches(as_tasks(LangIdStage),
                                     batch_format="pyarrow",
                                     batch_size=4096)


class LangConfusionStage(LangIdStage):
    """Actor: declared-label vs predicted-language partial counts."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as _pd

        pred = super().__call__(t)["pred_lang"]
        df = _pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "pred_lang": pred.to_numpy(zero_copy_only=False),
            "n": 1}).groupby(["lang", "pred_lang"], as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)


def lang_confusion(sf_dir: str):
    """Label-quality evaluation: confusion matrix between the corpus's
    DECLARED ``lang`` column and the stoplist language-ID prediction —
    the metadata-trust audit run before lang-filtered mixing (declared
    labels are crawl metadata; predictions are content; disagreement
    rows flag mislabeled slices, incl. languages the ID model cannot
    emit, e.g. 'zh' here).

    Output: (lang, pred_lang, n).

    Scale shape: zero shuffle — the per-batch stage scores and collapses
    to at most |langs|^2 partial rows; one bounded driver reduce.
    """
    import pandas as _pd

    parts = _docs(sf_dir, columns=("doc_id", "text", "lang")) \
        .map_batches(as_tasks(LangConfusionStage),
                     batch_format="pyarrow", batch_size=4096) \
        .to_pandas()
    if len(parts) == 0:
        return _pd.DataFrame({"lang": _pd.Series([], dtype=object),
                              "pred_lang": _pd.Series([], dtype=object),
                              "n": _pd.Series([], dtype=np.int64)})
    agg = parts.groupby(["lang", "pred_lang"], as_index=False)["n"].sum()
    agg["n"] = agg["n"].astype(np.int64)
    return agg


def doc_fingerprint(sf_dir: str, hash_mode: str = "fast"):
    """Content fingerprint of lowercased text: hex digest + 60-bit int form
    (the exact-dedup / shard-routing key).  (doc_id, fp, fp_int).

    ``hash_mode='fast'`` (default): vectorized xxhash64 — fp is its 16-hex
    form.  ``'md5'``: per-row md5 (SQL-oracle bridge, pinned by the driver
    query)."""
    from ..functions.hashing import fast_hash64

    def fp(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        if hash_mode == "md5":
            digests = [hashlib.md5(s.encode()).hexdigest()
                       for s in low.to_pylist()]
            ints = [int(d[:15], 16) for d in digests]
            return pa.table({"doc_id": t["doc_id"],
                             "fp": pa.array(digests, pa.string()),
                             "fp_int": pa.array(ints, pa.int64())})
        h = fast_hash64(low)
        hexes = np.char.mod("%016x", h.astype(np.uint64))
        return pa.table({
            "doc_id": t["doc_id"],
            "fp": pa.array(hexes.astype(object), pa.string()),
            "fp_int": pa.array((h >> np.uint64(4)).astype(np.int64)),
        })

    return _docs(sf_dir).map_batches(fp, batch_format="pyarrow")


def doc_sample(sf_dir: str, pct: int = 10, hash_mode: str = "fast"):
    """Deterministic content-hash sampling — the reproducible train/eval
    split primitive: keep documents whose id-hash-derived bucket is below
    ``pct`` (stable across runs, partitionings and cluster sizes; never a
    seeded RNG, which would depend on row order).
    Output: (doc_id, bucket).

    ``hash_mode='md5'`` is the SQL-oracle bridge (md5 of the id string);
    'fast' (default) uses the vectorized xxhash path."""
    from ..functions.hashing import fast_hash64

    def fn(t: pa.Table) -> pa.Table:
        if hash_mode == "md5":
            ids = t["doc_id"].to_pylist()
            buckets = np.fromiter(
                (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
                 for i in ids), dtype=np.int64, count=len(ids))
        else:
            buckets = (fast_hash64(pc.cast(t["doc_id"], pa.string()))
                       % np.uint64(100)).astype(np.int64)
        keep = buckets < pct
        return pa.table({"doc_id": t["doc_id"].filter(pa.array(keep)),
                         "bucket": pa.array(buckets[keep])})

    return _docs(sf_dir, columns=("doc_id",)).map_batches(
        fn, batch_format="pyarrow")


def text_normalize(sf_dir: str):
    """Canonical text normalization pass: lowercase + whitespace collapse
    + trim, with before/after length accounting (the cleanup primitive
    every corpus pipeline runs first).
    Output: (doc_id, norm_text, n_chars_before, n_chars_after)."""

    def fn(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        collapsed = pc.replace_substring_regex(low, r"\s+", " ")
        norm = pc.utf8_trim_whitespace(collapsed)
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_text": norm,
            "n_chars_before": pc.cast(pc.utf8_length(t["text"]),
                                      pa.int64()),
            "n_chars_after": pc.cast(pc.utf8_length(norm), pa.int64()),
        })

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def token_heavy_hitters(sf_dir: str, k: int = 20):
    """Exact corpus-wide heavy hitters: the k most frequent tokens
    (``string_split(text, ' ')`` semantics, empties dropped), ties broken
    by token text ascending.

    Output: (token, n)  ordered (n DESC, token ASC), k rows.

    Scale shape: per-batch token value_counts (the combiner — each batch
    ships one row per distinct token, not per occurrence), one token-keyed
    groupby sum, per-block top-k prefilter, then a k x n_blocks sort.  The
    count-min sketch variant (pipelines/sketches.py) removes even the
    token-cardinality shuffle for approximate use.
    """
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=("text",))

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({
            "token": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby("token").aggregate(Sum("cnt", alias_name="n"))

    def block_topk(t: pa.Table) -> pa.Table:
        t = pa.table({"token": t["token"],
                      "n": pc.cast(t["n"], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
        return t.take(idx[:k])

    return (agg.map_batches(block_topk, batch_format="pyarrow")
            .sort(["n", "token"], descending=[True, False]).limit(k))


def source_top_tokens(sf_dir: str, k: int = 10):
    """Grouped heavy hitters: the k most frequent tokens WITHIN each
    source (the per-source \"signature vocabulary\" a mixing or
    contamination review looks at), ties broken by token text ascending.

    Output: (source, token, n, rk) with rk = 1..k per source, ordered
    (source, rk).

    Scale shape: the per-batch combiner ships one (source, token, count)
    row per distinct pair per batch — never token occurrences; ONE
    (source, token)-keyed groupby sum; then a per-block top-k-per-source
    prefilter caps what the final per-source selection sees at
    |sources| x k rows per block.  Identical shuffle economics to the
    global token_heavy_hitters with the group key widened.
    """
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=("text", "source"))

    def partial(t: pa.Table) -> pa.Table:
        split = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False)
        src = t["source"].to_numpy(zero_copy_only=False)
        toks = pc.list_flatten(split)
        keep = pc.not_equal(toks, "")
        d = pa.table({"source": pa.array(np.repeat(src, lens), pa.string()),
                      "token": toks}).filter(keep) \
            .group_by(["source", "token"]).aggregate([("token", "count")])
        return pa.table({"source": d["source"], "token": d["token"],
                         "cnt": pc.cast(d["token_count"], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby(["source", "token"]).aggregate(Sum("cnt", alias_name="n"))

    def block_topk(t: pa.Table) -> pa.Table:
        df = pa.table({"source": t["source"], "token": t["token"],
                       "n": pc.cast(t["n"], pa.int64())}).to_pandas()
        df = df.sort_values(["source", "n", "token"],
                            ascending=[True, False, True], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("source").head(k),
                                    preserve_index=False)

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["source", "token", "n", "rk"]]

    return agg.map_batches(block_topk, batch_format="pyarrow") \
        .groupby("source").map_groups(per_source, batch_format="pandas",
                                      num_cpus=1)


def stratified_sample(sf_dir: str, per_group: int = 25,
                      hash_mode: str = "fast"):
    """Deterministic stratified sampling: the ``per_group``
    lowest-content-hash documents per language — a reproducible per-stratum
    split that never depends on row order, partitioning or a seeded RNG.

    Output: (lang, doc_id, rk)  with rk = 1..per_group within the stratum.

    Scale shape: per-batch combiner keeps at most ``per_group`` candidates
    per stratum, so the shuffle ships O(groups x per_group x batches)
    candidate rows, never the corpus.  ``hash_mode='md5'`` orders by the
    md5 hex digest (SQL-oracle bridge); 'fast' by the vectorized xxhash.
    """
    import pandas as pd

    from ..functions.hashing import fast_hash64

    def rank_keys(t: pa.Table):
        if hash_mode == "md5":
            return np.array([hashlib.md5(str(i).encode()).hexdigest()
                             for i in t["doc_id"].to_pylist()], dtype=object)
        return fast_hash64(pc.cast(t["doc_id"], pa.string()))

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t["lang"].to_numpy(zero_copy_only=False),
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "h": rank_keys(t),
        })
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        df = df[df.groupby("lang").cumcount() < per_group]
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort").head(per_group)
        return pd.DataFrame({
            "lang": g["lang"].to_numpy(object),
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "rk": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return _docs(sf_dir, columns=("doc_id", "lang")) \
        .map_batches(combine, batch_format="pyarrow", batch_size=262144) \
        .groupby("lang").map_groups(per_lang, batch_format="pandas",
                                    num_cpus=1)


PACK_CAPACITY = 2048        # chars per training bin (stand-in for tokens)


def pack_sequences(sf_dir: str, capacity: int = PACK_CAPACITY,
                   npart: Optional[int] = None):
    """Greedy sequence packing (training-batch construction): pack
    documents into bins of at most ``capacity`` chars via
    first-fit-decreasing, the standard sample-packing step that turns a
    ragged corpus into dense fixed-budget training rows.

    Output: (doc_id, part, bin_id, n_chars) — bin identity is the pair
    (part, bin_id); every bin's total n_chars <= capacity (documents
    longer than the capacity get a singleton bin).

    Scale shape: ONE shuffle of (doc_id, n_chars) pairs routed by
    ``doc_id % NPART`` — the text never moves.  Packing runs
    independently per partition (FFD is sequential by nature, so the
    partition IS the parallelism unit); within a partition the bin-residual
    scan is a numpy argmax over <= n_bins residuals per doc, on a few
    hundred thousand ints per partition at most.  Deterministic: fixed
    partitioner, stable descending sort with doc_id tie-break — so a
    PINNED ``npart`` makes the whole packing SQL-exact (the driver
    oracle unrolls FFD as a recursive residual-list CTE).
    """
    from ..functions.scale import coarse_npart

    if npart is None:
        npart = coarse_npart()

    def route(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"part": pa.array(d % npart),
                         "doc_id": t["doc_id"], "n_chars": t["n_chars"]})

    def pack_part(g: "pd.DataFrame"):
        import pandas as pd

        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="mergesort")
        sizes = g["n_chars"].to_numpy(np.int64)
        resid = np.empty(len(sizes), dtype=np.int64)   # bin residuals
        n_bins = 0
        assign = np.empty(len(sizes), dtype=np.int64)
        for i, s in enumerate(sizes):
            fit = np.flatnonzero(resid[:n_bins] >= s)
            if len(fit):
                b = int(fit[0])                        # first fit
                resid[b] -= s
            else:
                b = n_bins
                resid[b] = max(capacity - s, 0)        # oversize: singleton
                n_bins += 1
            assign[i] = b
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "part": g["part"].to_numpy(np.int64),
            "bin_id": assign,
            "n_chars": sizes,
        })

    return _docs(sf_dir, columns=("doc_id", "n_chars")) \
        .map_batches(route, batch_format="pyarrow") \
        .groupby("part").map_groups(pack_part, batch_format="pandas")


TFIDF_TOP_K = 3


def tfidf_top_terms(sf_dir: str, top_k: int = TFIDF_TOP_K):
    """TF-IDF top-k terms per document: score = tf * ln(N/df), ranked
    per doc with deterministic tie-break (micro-rounded score desc, then
    token hash asc) — the classic relevance/keyword-extraction primitive.

    Output: (doc_id, token_h, rnk) — integer-only so the driver's
    value-hash compare is float-order-proof (scores are micro-rounded
    identically on both sides before ranking).

    Scale shape: two posting-sized shuffles, text never moves —
      1. (token_h, doc_id, tf) postings route by token bucket; df is a
         vectorized in-bucket count and rides back on each posting row;
      2. postings re-route by doc bucket; scoring + per-doc top-k is one
         vectorized pandas pass per bucket.
    N (corpus size) comes from the parquet row-count metadata.
    """
    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    n_docs = float(_docs(sf_dir, columns=("doc_id",)).count())

    class Postings:
        def __init__(self):
            self.hasher = worker_token_hasher()

        def __call__(self, t: pa.Table) -> pa.Table:
            offsets, tok = tokenize_column(t["text"], self.hasher)
            n = len(offsets) - 1
            doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                                np.diff(offsets))
            vocab = int(tok.max()) + 1 if len(tok) else 1
            key = doc_idx * vocab + tok
            uniq, tf = np.unique(key, return_counts=True)
            u_doc = uniq // vocab
            u_tok = uniq % vocab
            doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
            token_h = self.hasher.h60_array[u_tok]
            return pa.table({
                "part": pa.array(token_h % npart),
                "token_h": pa.array(token_h, pa.int64()),
                "doc_id": pa.array(doc_ids[u_doc], pa.int64()),
                "tf": pa.array(tf.astype(np.int64)),
            })

    def attach_df(g: "pd.DataFrame"):
        import pandas as pd

        df = g.groupby("token_h")["doc_id"].transform("size")
        return pd.DataFrame({
            "part": g["doc_id"].to_numpy(np.int64) % npart,
            "token_h": g["token_h"], "doc_id": g["doc_id"],
            "tf": g["tf"], "df": df.to_numpy(np.int64)})

    def per_doc_topk(g: "pd.DataFrame"):
        import pandas as pd

        score = g["tf"].to_numpy(np.float64) * \
            np.log(n_docs / g["df"].to_numpy(np.float64))
        g = g.assign(score_u=np.rint(score * 1e6).astype(np.int64))
        g = g.sort_values(["doc_id", "score_u", "token_h"],
                          ascending=[True, False, True], kind="mergesort")
        rnk = g.groupby("doc_id").cumcount() + 1
        g = g.assign(rnk=rnk)
        g = g[g["rnk"] <= top_k]
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "token_h": g["token_h"].to_numpy(np.int64),
                             "rnk": g["rnk"].to_numpy(np.int64)})

    return _docs(sf_dir).map_batches(as_tasks(Postings),
                                     batch_format="pyarrow",
                                     batch_size=4096) \
        .groupby("part").map_groups(attach_df, batch_format="pandas") \
        .groupby("part").map_groups(per_doc_topk, batch_format="pandas")


DECON_BENCH_MOD = 50       # doc_id % MOD == 0 -> held-out benchmark doc


def _shingles3(texts: pa.ChunkedArray | pa.Array) -> tuple:
    """Vectorized 3-token shingles: returns (doc_offsets[n+1], shingle
    StringArray flat, grouped by doc).  binary_join_element_wise over the
    shifted flat-token array — no Python per token."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    split = pc.split_pattern(texts, " ")
    flat = split.flatten()
    offs = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    m = len(flat)
    if m < 3:
        return np.zeros(len(offs), np.int64), pa.array([], pa.string())
    sh = pc.binary_join_element_wise(
        flat.slice(0, m - 2), flat.slice(1, m - 2), flat.slice(2, m - 2),
        " ")
    # positions i where i and i+2 fall in the same doc
    doc_idx = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                        np.diff(offs))
    valid = doc_idx[:m - 2] == doc_idx[2:]
    sh_counts = np.maximum(np.diff(offs) - 2, 0)
    new_offs = np.concatenate([[0], np.cumsum(sh_counts)])
    return new_offs, sh.filter(pa.array(valid))


def decontaminate(sf_dir: str, bench_mod: int = DECON_BENCH_MOD):
    """Benchmark decontamination: flag every training document that shares
    at least one 3-token shingle with the held-out benchmark set
    (``doc_id % bench_mod == 0``) — the standard train/eval overlap check
    run before every serious pretraining job.

    Output: (doc_id, contaminated) over the training (non-benchmark) docs.

    Scale shape: the benchmark set is small by definition, so its distinct
    shingles are built in a distributed filtered pass, collected bounded,
    and broadcast once (``ray.put``); the training scan matches each doc's
    shingles via searchsorted inside map_batches — no shuffle at all.
    Shingles stay raw strings here so the SQL oracle compares exactly; at
    production scale hash them to 64-bit (functions/hashing.fast_hash64)
    and broadcast the hash set (or a bloom filter past ~10^8 shingles).
    """
    import ray

    def bench_shingles(t: pa.Table) -> pa.Table:
        # Ray's expr-filter has no modulo; fuse the benchmark predicate here
        t = t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % bench_mod == 0))
        _, sh = _shingles3(t["text"])
        return pa.table({"s": pc.unique(sh)})

    parts = [b for b in _docs(sf_dir).map_batches(bench_shingles,
                                                  batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    if parts:
        allsh = pa.concat_tables(
            [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
             for p in parts])
        bench_arr = np.sort(np.asarray(
            pc.unique(allsh["s"]).to_pylist(), dtype=object))
    else:
        bench_arr = np.array([], dtype=object)
    bench_ref = ray.put(bench_arr)

    def scan(t: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        # training docs only
        d = t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % bench_mod != 0))
        offs, sh = _shingles3(d["text"])
        n = d.num_rows
        if len(bset) and len(sh):
            # match DISTINCT shingles only, then gather back per occurrence
            denc = pc.dictionary_encode(sh)
            dvals = np.asarray(denc.dictionary.to_pylist(), dtype=object)
            pos = np.searchsorted(bset, dvals)
            pos_c = np.clip(pos, 0, len(bset) - 1)
            dhit = (pos < len(bset)) & (bset[pos_c] == dvals)
            hit = dhit[denc.indices.to_numpy(zero_copy_only=False)
                       .astype(np.int64)]
            doc_of_sh = np.repeat(np.arange(n, dtype=np.int64),
                                  np.diff(offs))
            per_doc = np.bincount(doc_of_sh[hit], minlength=n)
        else:
            per_doc = np.zeros(n, np.int64)
        return pa.table({
            "doc_id": d["doc_id"],
            "contaminated": pa.array((per_doc > 0).astype(np.int64)),
        })

    return _docs(sf_dir).map_batches(scan, batch_format="pyarrow",
                                     batch_size=4096)


REDACT_TERMS = ("customer", "spark", "key")


def redact_terms(sf_dir: str, terms=REDACT_TERMS, token: str = "[REDACTED]"):
    """Dictionary-based redaction — the PII/blocklist-scrub plumbing (term
    list broadcast once, vectorized regex alternation per batch; swap the
    synthetic term list for an email/phone/SSN pattern set in production).

    Output: (doc_id, n_hits, text_out_len) — redacted length + hit count
    per document (the redacted text itself stays inside the pipeline; a
    production run would write_parquet it).

    Scale shape: pure map — Arrow RE2 kernels run once per BATCH over the
    whole column (no per-row Python), zero shuffle, prunes to the two
    columns it reads.
    """
    pat = "\\b(" + "|".join(sorted(terms)) + ")\\b"

    def fn(t: pa.Table) -> pa.Table:
        hits = pc.count_substring_regex(t["text"], pattern=pat)
        out = pc.replace_substring_regex(t["text"], pattern=pat,
                                         replacement=token)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_hits": pc.cast(hits, pa.int64()),
            "text_out_len": pc.cast(pc.utf8_length(out), pa.int64()),
        })

    return _docs(sf_dir, columns=("doc_id", "text")).map_batches(
        fn, batch_format="pyarrow")


def quality_prune(sf_dir: str, lo_p: float = 0.1, hi_p: float = 0.9):
    """Global quantile-band corpus pruning: keep the documents whose
    quality score sits between the corpus-wide P10 and P90 (drop the
    garbage tail AND the suspiciously-perfect head — the standard
    pretraining-mix pruning move).

    Output: (doc_id, quality_q) for the surviving band.

    Scale shape: the quality score has a BOUNDED integer domain (0..10000
    basis points), so the global quantiles come from per-batch bincount
    partials reduced into one fixed-size histogram — zero data shuffle,
    and the driver holds <= 10001 (q, count) rows regardless of corpus
    size (constant, not corpus-cardinality-sized).  Quantile semantics
    match DuckDB quantile_disc: sorted 0-based index ceil(p*n) - 1.
    """
    from ray.data.aggregate import Sum

    def stats():
        return _docs(sf_dir).map_batches(as_tasks(TextStatsStage),
                                         batch_format="pyarrow",
                                         batch_size=4096)

    def hist_partial(t: pa.Table) -> pa.Table:
        q = t["quality_q"].to_numpy(zero_copy_only=False)
        h = np.bincount(q, minlength=10001)
        nz = np.flatnonzero(h)
        return pa.table({"q": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(h[nz].astype(np.int64))})

    hrows = (stats().map_batches(hist_partial, batch_format="pyarrow")
             .groupby("q").aggregate(Sum("cnt", alias_name="n"))
             .take_all())                       # bounded: <= 10001 rows
    if not hrows:                               # empty corpus: empty band
        import ray.data as rd

        return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                       "quality_q": pa.array([],
                                                             pa.int64())}))
    qs = np.array([r["q"] for r in hrows], np.int64)
    ns = np.array([r["n"] for r in hrows], np.int64)
    order = np.argsort(qs)
    qs, cum = qs[order], np.cumsum(ns[order])
    total = int(cum[-1])

    def disc(p: float) -> int:
        k = max(int(np.ceil(p * total)) - 1, 0)
        return int(qs[np.searchsorted(cum, k + 1)])

    lo, hi = disc(lo_p), disc(hi_p)

    def band(t: pa.Table) -> pa.Table:
        q = t["quality_q"]
        m = pc.and_(pc.greater_equal(q, lo), pc.less_equal(q, hi))
        return pa.table({"doc_id": t["doc_id"].filter(m),
                         "quality_q": q.filter(m)})

    return stats().map_batches(band, batch_format="pyarrow")


def _per_doc_max_count(doc_of_pos: np.ndarray, gram_id: np.ndarray,
                       n_docs: int, n_grams: int) -> np.ndarray:
    """Max occurrence count of any single gram per doc.

    One combined sort key (doc * n_grams + gram), one np.unique
    run-length, one reduceat — no per-doc Python."""
    out = np.zeros(n_docs, np.int64)
    if len(gram_id) == 0:
        return out
    key = doc_of_pos * np.int64(n_grams) + gram_id
    uk, cnt = np.unique(key, return_counts=True)
    ud = uk // n_grams
    starts = np.flatnonzero(np.concatenate([[True], ud[1:] != ud[:-1]]))
    out[ud[starts]] = np.maximum.reduceat(cnt, starts)
    return out


def repetition_filter(sf_dir: str):
    """Gopher-style intra-document repetition statistics (the repetition
    quality filters of Rae et al. 2021 §A1.1.2 — duplicate-token fraction
    plus the fraction of tokens covered by the most frequent 2-gram and
    3-gram) and the resulting keep/drop flag.

    Output: (doc_id, n_tokens, dup_tok_q, top2_q, top3_q, is_repetitive)
    with the fractions as floor(x*10000) basis-point ints (float-free
    value hashing, same convention as TextStatsStage).

    Scale shape: zero shuffle — one map pass.  Tokens are batch-locally
    integer-coded with Arrow's dictionary_encode (C++ hash table, no
    Python per token); n-gram identities come from an id cascade
    (bigram id = unique(token_id * V + next_token_id), trigram id =
    unique(bigram_id * V + third_token_id)), so all ids stay well inside
    int64 at any batch size; per-doc top counts are one sort-free
    np.unique run-length + reduceat.
    """

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        offsets = offsets - offsets[0]
        denc = pc.dictionary_encode(split.flatten())
        g1 = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(denc.dictionary)) or np.int64(1)
        n = t.num_rows
        n_tokens = np.diff(offsets)
        doc = np.repeat(np.arange(n, dtype=np.int64), n_tokens)
        # distinct tokens per doc (duplicate-unigram fraction)
        uniq_dt = np.unique(doc * V + g1)
        n_distinct = np.bincount(uniq_dt // V, minlength=n).astype(np.int64)

        flat = len(g1)
        top2 = np.zeros(n, np.int64)
        top3 = np.zeros(n, np.int64)
        if flat >= 2:
            # bigram ids aligned to every position i in [0, flat-1)
            k2 = g1[:-1] * V + g1[1:]
            u2, g2 = np.unique(k2, return_inverse=True)
            ok2 = doc[:-1] == doc[1:]
            top2 = _per_doc_max_count(doc[:-1][ok2], g2[ok2], n, len(u2))
            if flat >= 3:
                k3 = g2[:-1] * V + g1[2:]
                u3, g3 = np.unique(k3, return_inverse=True)
                # doc is sorted, so doc[i] == doc[i+2] implies i+1 too
                ok3 = doc[:-2] == doc[2:]
                top3 = _per_doc_max_count(doc[:-2][ok3], g3[ok3], n,
                                          len(u3))

        # identical float expression order to the SQL oracle (single
        # IEEE754 division -> same double -> same floor in both engines)
        nt = n_tokens.astype(np.float64)
        dup_q = np.floor((n_tokens - n_distinct) * 10000.0 / nt).astype(
            np.int64)
        top2_q = np.floor(top2 * 2 * 10000.0 / nt).astype(np.int64)
        top3_q = np.floor(top3 * 3 * 10000.0 / nt).astype(np.int64)
        rep = (dup_q > 6000) | (top2_q > 2000) | (top3_q > 1800)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "dup_tok_q": pa.array(dup_q),
            "top2_q": pa.array(top2_q),
            "top3_q": pa.array(top3_q),
            "is_repetitive": pa.array(rep),
        })

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                     batch_size=4096)


def source_mix_sample(sf_dir: str, hash_mode: str = "fast"):
    """Deterministic source-weighted mixing — the data-mixing primitive of
    corpus construction: each source s keeps a per-source fraction
    (permille = (src_num * 53) % 1000, src_num parsed from the name) of
    its documents, selected by content-stable id hash (never a seeded
    RNG: resampling any shard reproduces the same mixture).

    Output: (doc_id, source) — the surviving mixture.

    Scale shape: pure map over (doc_id, source); weights are a formula
    here, a broadcast dict in production — zero shuffle either way.
    """
    from ..functions.hashing import fast_hash64

    def fn(t: pa.Table) -> pa.Table:
        src_num = pc.cast(pc.utf8_slice_codeunits(t["source"], 3),
                          pa.int64()).to_numpy(zero_copy_only=False)
        permille = (src_num * 53) % 1000
        if hash_mode == "md5":
            ids = t["doc_id"].to_pylist()
            h = np.fromiter(
                (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
                 for i in ids), dtype=np.int64, count=len(ids))
        else:
            h = (fast_hash64(pc.cast(t["doc_id"], pa.string()))
                 % np.uint64(1000)).astype(np.int64)
        keep = pa.array(h < permille)
        return pa.table({"doc_id": t["doc_id"].filter(keep),
                         "source": t["source"].filter(keep)})

    return _docs(sf_dir, columns=("doc_id", "source")).map_batches(
        fn, batch_format="pyarrow")


VOCAB_K = 20            # top-k corpus vocabulary (synthetic corpus
                        # has ~31 distinct tokens, so k=20 leaves a
                        # real OOV tail at every scale factor)


def vocab_coverage(sf_dir: str, vocab_k: int = VOCAB_K):
    """Vocabulary-coverage / OOV-rate filter: build the corpus vocabulary
    (the ``vocab_k`` most frequent tokens, ties by token text — the same
    deterministic top-k as token_heavy_hitters) and score every document
    by how many of its token positions fall outside it (the classic
    tokenizer-fit / gibberish screen).

    Output: (doc_id, n_tokens, n_oov, oov_q) with oov_q =
    floor(n_oov * 10000 / n_tokens) basis points.

    Scale shape: pass 1 is the heavy-hitters reduction (per-batch
    value_counts combiner, one token-keyed groupby, per-block top-k
    prefilter) whose result is BOUNDED (k rows) and broadcast via
    ray.put; pass 2 is a zero-shuffle map using one np.isin per batch
    against the sorted vocab hashes.
    """
    import ray

    vocab_rows = token_heavy_hitters(sf_dir, k=vocab_k).take_all()
    vocab = np.sort(np.array([r["token"] for r in vocab_rows],
                             dtype=object)).astype(str)
    vocab_ref = ray.put(vocab)

    def score(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False).astype(
            np.int64)
        offsets = offsets - offsets[0]
        n_tokens = np.diff(offsets)
        denc = pc.dictionary_encode(split.flatten())
        in_vocab_dict = np.isin(
            np.asarray(denc.dictionary.to_pylist(), dtype=object)
            .astype(str), v)
        idx = denc.indices.to_numpy(zero_copy_only=False)
        oov_flat = ~in_vocab_dict[idx]
        doc = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_tokens)
        n_oov = np.bincount(doc[oov_flat], minlength=t.num_rows) \
            .astype(np.int64)
        oov_q = np.floor(n_oov * 10000.0 / n_tokens.astype(np.float64)) \
            .astype(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(n_tokens),
                         "n_oov": pa.array(n_oov),
                         "oov_q": pa.array(oov_q)})

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow",
                                     batch_size=4096)


def perplexity_prune(sf_dir: str, vocab_k: int = 256,
                     keep_q: float = 0.25):
    """CCNet-style perplexity-proxy pruning: score every document by its
    mean unigram log-probability under the corpus's own top-k vocabulary
    (OOV tokens get the ln(1/N) floor) and keep the documents at or
    above the corpus-wide ``keep_q`` quantile — the classic LM-filter
    shape with the LM replaced by an exact, integer-reproducible
    unigram model.

    Output: (doc_id, sum_lp, n_tok, avg_lp, keep) — all integers:
    per-token log-probs are floor(ln(count/N) * 10000) milli-units, so
    per-doc sums are EXACT and the oracle compare is order-free.

    Scale shape: pass 1 is the bounded heavy-hitters vocab (per-batch
    value_counts combiner + one token groupby) plus a zero-shuffle
    total-count reduce (O(blocks) driver rows); the per-token log-prob
    table is BOUNDED (k+1 entries) and broadcast; pass 2 scores docs
    zero-shuffle (dictionary-encode once per batch, bincount-weighted
    per-doc sums); the keep threshold comes from a bounded histogram
    over the integer avg_lp domain (|ln(1/N)|*10^4 bins, O(1) driver
    state) with quantile_disc semantics, exactly like quality_prune.
    """
    import ray

    from ray.data.aggregate import Sum

    # -- pass 1a: vocab with counts (bounded k rows on the driver) --------
    vocab_rows = token_heavy_hitters(sf_dir, k=vocab_k).take_all()

    # -- pass 1b: total token count (zero shuffle, O(blocks)) -------------
    def count_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({"n": pa.array([len(toks)], pa.int64())})

    nparts = _docs(sf_dir, columns=("text",)) \
        .map_batches(count_partial, batch_format="pyarrow",
                     batch_size=262144)
    total = sum(int(b["n"][i].as_py())
                for b in nparts.iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 20)
                for i in range(b.num_rows))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "sum_lp": pa.array([], pa.int64()),
                      "n_tok": pa.array([], pa.int64()),
                      "avg_lp": pa.array([], pa.int64()),
                      "keep": pa.array([], pa.int64())})
    if total == 0 or not vocab_rows:
        import ray.data as rd

        return rd.from_arrow(empty)

    vtok = np.array([r["token"] for r in vocab_rows], object).astype(str)
    vn = np.array([r["n"] for r in vocab_rows], np.int64)
    order = np.argsort(vtok, kind="mergesort")
    vtok, vn = vtok[order], vn[order]
    vlp = np.floor(np.log(vn.astype(np.float64) / total) * 10000.0) \
        .astype(np.int64)
    oov_lp = int(np.floor(np.log(1.0 / total) * 10000.0))
    dim_ref = ray.put((vtok, vlp, oov_lp))

    # -- pass 2: zero-shuffle per-doc scoring ------------------------------
    def score(t: pa.Table) -> pa.Table:
        vt, vl, olp = ray.get(dim_ref)
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        denc = pc.dictionary_encode(flat)
        dwords = np.asarray(denc.dictionary.to_pylist(), object) \
            .astype(str)
        pos = np.searchsorted(vt, dwords)
        posc = np.clip(pos, 0, max(len(vt) - 1, 0))
        dict_lp = np.where(
            (len(vt) > 0) & (pos < len(vt)) & (vt[posc] == dwords),
            vl[posc], olp)
        idx = denc.indices.to_numpy(zero_copy_only=False)
        lp_flat = dict_lp[idx]
        doc = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                        np.diff(offsets))
        n_tok = np.bincount(doc[nonempty], minlength=t.num_rows) \
            .astype(np.int64)
        sum_lp = np.bincount(doc[nonempty],
                             weights=lp_flat[nonempty].astype(np.float64),
                             minlength=t.num_rows).astype(np.int64)
        has = n_tok > 0                      # docs w/o tokens: no row
        avg = np.floor(sum_lp[has].astype(np.float64) /
                       n_tok[has]).astype(np.int64)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(
                pa.array(has)),
            "sum_lp": pa.array(sum_lp[has]),
            "n_tok": pa.array(n_tok[has]),
            "avg_lp": pa.array(avg)})

    def scored():
        return _docs(sf_dir).map_batches(score, batch_format="pyarrow",
                                         batch_size=4096)

    # -- threshold: bounded histogram over the integer avg_lp domain ------
    shift = -oov_lp                          # avg_lp in [oov_lp, 0]

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t["avg_lp"].to_numpy(zero_copy_only=False) + shift
        h = np.bincount(v, minlength=shift + 1)
        nz = np.flatnonzero(h)
        return pa.table({"q": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(h[nz].astype(np.int64))})

    hrows = (scored().map_batches(hist_partial, batch_format="pyarrow")
             .groupby("q").aggregate(Sum("cnt", alias_name="n"))
             .take_all())                    # bounded: <= |ln(1/N)|*10^4
    if not hrows:
        import ray.data as rd

        return rd.from_arrow(empty)
    qs = np.array([r["q"] for r in hrows], np.int64)
    ns = np.array([r["n"] for r in hrows], np.int64)
    order = np.argsort(qs)
    qs, cum = qs[order], np.cumsum(ns[order])
    n_docs = int(cum[-1])
    k = max(int(np.ceil(keep_q * n_docs)) - 1, 0)
    thr = int(qs[np.searchsorted(cum, k + 1)]) - shift

    def flag(t: pa.Table) -> pa.Table:
        keep = pc.cast(pc.greater_equal(t["avg_lp"], thr), pa.int64())
        return t.append_column("keep", keep)

    return scored().map_batches(flag, batch_format="pyarrow")


BM25_TERMS = ("spark", "merge", "window", "hash")
BM25_K = 50


def bm25_retrieval(sf_dir: str, terms=BM25_TERMS, k: int = BM25_K):
    """BM25 document retrieval for a fixed query-term set (k1=1.2,
    b=0.75) — the classic sparse-retrieval scorer over the corpus's own
    df/length statistics.

    Output: (doc_id, score_micro) — the top-k docs by BM25 score, with
    per-(doc, term) scores floored to integer micro-units so per-doc
    sums are EXACT and the oracle compare is order-free (same precision
    discipline as perplexity_prune).

    Scale shape: pass 1 reduces (df per term, total doc length, doc
    count) from per-batch partials — O(|terms| x blocks) driver rows,
    zero shuffle; pass 2 scores zero-shuffle (one split per batch,
    per-term bincount tf) and emits per-batch TOP-K partials, so the
    driver merges <= k x blocks rows regardless of corpus size.
    """
    term_list = [str(t) for t in terms]
    nterm = len(term_list)

    def _tok(t: pa.Table):
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        dl = np.diff(offsets)                 # SQL length(string_split)
        doc = np.repeat(np.arange(t.num_rows, dtype=np.int64), dl)
        return flat, doc, dl

    # -- pass 1: df per term + (sum dl, n docs), bounded partials ---------
    def stats_partial(t: pa.Table) -> pa.Table:
        flat, doc, dl = _tok(t)
        dfs = np.empty(nterm, np.int64)
        for i, term in enumerate(term_list):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc[m], minlength=t.num_rows)
            dfs[i] = int((tf > 0).sum())
        return pa.table({
            "term_idx": pa.array(np.arange(-1, nterm, dtype=np.int64)),
            "df": pa.array(np.concatenate([[0], dfs])),
            "dl": pa.array([int(dl.sum())] + [0] * nterm, pa.int64()),
            "nd": pa.array([t.num_rows] + [0] * nterm, pa.int64()),
        })

    stats = _docs(sf_dir, columns=("text",)) \
        .map_batches(stats_partial, batch_format="pyarrow",
                     batch_size=262144)
    agg: dict = {}
    sumdl = nd = 0
    dfs = np.zeros(nterm, np.int64)
    for b in stats.iter_batches(batch_format="pyarrow",
                                batch_size=1 << 20):
        ti = b["term_idx"].to_numpy(zero_copy_only=False)
        df = b["df"].to_numpy(zero_copy_only=False)
        sumdl += int(b["dl"].to_numpy(zero_copy_only=False).sum())
        nd += int(b["nd"].to_numpy(zero_copy_only=False).sum())
        for i in range(len(ti)):
            if ti[i] >= 0:
                dfs[ti[i]] += df[i]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score_micro": pa.array([], pa.int64())})
    if nd == 0 or sumdl == 0:
        import ray.data as rd

        return rd.from_arrow(empty)
    # idf exactly as the oracle writes it: LN((nd-df+0.5)/(df+0.5)+1)
    idf = np.log((nd - dfs.astype(np.float64) + 0.5) /
                 (dfs.astype(np.float64) + 0.5) + 1.0)

    # -- pass 2: zero-shuffle scoring + per-batch top-k --------------------
    def score(t: pa.Table) -> pa.Table:
        flat, doc, dl = _tok(t)
        dl_f = dl.astype(np.float64)
        score_micro = np.zeros(t.num_rows, np.int64)
        # denominator tail mirrors the SQL parse:
        # tf + 1.2*(0.25 + (0.75*dl)*nd/sumdl)
        tail = 1.2 * (0.25 + (0.75 * dl_f) * nd / sumdl)
        for i, term in enumerate(term_list):
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = np.bincount(doc[m], minlength=t.num_rows) \
                .astype(np.float64)
            # (idf*(tf*2.2))/(tf+tail)*1e6, floored per (doc, term)
            s = (idf[i] * (tf * 2.2)) / (tf + tail) * 1000000.0
            score_micro += np.floor(s).astype(np.int64)
        keep = score_micro > 0
        did = pc.cast(t["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[keep]
        sc = score_micro[keep]
        order = np.lexsort((did, -sc))[:k]
        return pa.table({"doc_id": pa.array(did[order]),
                         "score_micro": pa.array(sc[order])})

    parts = _docs(sf_dir, columns=("doc_id", "text")) \
        .map_batches(score, batch_format="pyarrow", batch_size=262144)
    rows = []
    for b in parts.iter_batches(batch_format="pyarrow",
                                batch_size=1 << 20):
        tb = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if tb.num_rows:
            rows.append(tb)
    if not rows:
        import ray.data as rd

        return rd.from_arrow(empty)
    allr = pa.concat_tables(rows)
    order = np.lexsort((allr["doc_id"].to_numpy(zero_copy_only=False),
                        -allr["score_micro"].to_numpy(
                            zero_copy_only=False)))[:k]
    return allr.take(pa.array(order))


def bigram_heavy_hitters(sf_dir: str, k: int = 20):
    """Exact corpus-wide BIGRAM heavy hitters: the k most frequent
    adjacent token pairs (within-document adjacency; the n-gram
    statistics primitive under tokenizer training / collocation mining).

    Output: (bigram, n) ordered (n DESC, bigram ASC), k rows.

    Scale shape: identical to token_heavy_hitters — the bigram column is
    built vectorized (one Arrow join of the flat token array against its
    shift, document boundaries masked via the list offsets, no per-row
    Python), each batch ships one row per DISTINCT bigram, one keyed
    groupby sum, per-block top-k prefilter, k x n_blocks final sort.
    """
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=("text",))

    def partial(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        n = len(flat)
        if n < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        pairs = pc.binary_join_element_wise(flat.slice(0, n - 1),
                                            flat.slice(1, n), " ")
        # mask positions whose successor starts the next document
        valid = np.ones(n - 1, bool)
        ends = offsets[1:] - 1
        valid[ends[(ends >= 0) & (ends < n - 1)]] = False
        pairs = pairs.filter(pa.array(valid))
        vc = pairs.value_counts()
        return pa.table({
            "bigram": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby("bigram").aggregate(Sum("cnt", alias_name="n"))

    def block_topk(t: pa.Table) -> pa.Table:
        t = pa.table({"bigram": t["bigram"],
                      "n": pc.cast(t["n"], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("bigram", "ascending")])
        return t.take(idx[:k])

    return (agg.map_batches(block_topk, batch_format="pyarrow")
            .sort(["n", "bigram"], descending=[True, False]).limit(k))


CHUNK_CHARS = 200
CHUNK_STRIDE = 150            # chunk - overlap (50-char overlap)


def _chunk_explode_arrays(text, chunk: int, stride: int):
    """Shared chunk-geometry explode, CODEPOINT-correct: chunk ``i`` of
    a doc covers codepoints ``[i*stride, i*stride + chunk)`` while
    ``i*stride < n_codepoints`` — exactly the oracle's character-based
    substr() semantics.  Returns (doc_idx, starts_in_doc, chunk_start,
    chunk_len, bodies).

    Pure-ASCII batches (the common corpus case) take the one-gather
    byte fast path.  Batches with multibyte codepoints decode the flat
    UTF-8 buffer to UTF-32 ONCE (bulk C codec), gather chunk bodies in
    codepoint space, and re-encode the concatenation in one pass with
    vectorized per-codepoint byte lengths for the output offsets — no
    per-row Python either way, and never a chunk boundary inside a
    multibyte codepoint (the pre-fix byte slicing could emit invalid
    UTF-8 on non-ASCII corpora)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    empty = np.empty(0, np.int64)
    if len(text) == 0:
        return empty, empty, empty, empty, pa.array([], pa.string())
    off = np.frombuffer(text.buffers()[1], np.int32,
                        count=len(text) + 1 + text.offset) \
        [text.offset:].astype(np.int64)
    vbuf = text.buffers()[2]
    flatbuf = np.frombuffer(vbuf, np.uint8) if vbuf is not None \
        else np.empty(0, np.uint8)
    body = flatbuf[off[0]:off[-1]]
    if not np.bitwise_and(body, 0x80).any():        # ASCII fast path
        doc_start = off[:-1]
        n_chars = off[1:] - doc_start
        units = flatbuf
        is_ascii = True
    else:
        cont = np.bitwise_and(body, 0xC0) == 0x80
        # codepoint index of each byte position = prefix count of
        # codepoint-start bytes
        cp_prefix = np.concatenate([[0], np.cumsum(~cont)])
        cp_off = cp_prefix[off - off[0]].astype(np.int64)
        units = np.frombuffer(
            body.tobytes().decode("utf-8").encode("utf-32-le"),
            np.uint32)
        doc_start = cp_off[:-1]
        n_chars = cp_off[1:] - cp_off[:-1]
        is_ascii = False
    n_chunks = np.maximum((n_chars + stride - 1) // stride, 0)
    doc_idx = np.repeat(np.arange(len(text), dtype=np.int64), n_chunks)
    if not len(doc_idx):
        return empty, empty, empty, empty, pa.array([], pa.string())
    first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    starts_in_doc = np.arange(len(doc_idx), dtype=np.int64) - \
        first[doc_idx]
    chunk_start = starts_in_doc * stride
    chunk_len = np.minimum(chunk, n_chars[doc_idx] - chunk_start)
    # ONE gather builds every chunk body: absolute unit index =
    # doc_start + chunk_start + intra-chunk offset
    out_off = np.concatenate([[0], np.cumsum(chunk_len)])
    intra = np.arange(int(out_off[-1]), dtype=np.int64) - \
        np.repeat(out_off[:-1], chunk_len)
    gathered = units[np.repeat(doc_start[doc_idx] + chunk_start,
                               chunk_len) + intra]
    if is_ascii:
        bodies = pa.StringArray.from_buffers(
            len(chunk_len),
            pa.py_buffer(out_off.astype(np.int32).tobytes()),
            pa.py_buffer(gathered.tobytes()))
    else:
        u8 = gathered.astype("<u4").tobytes().decode("utf-32-le") \
            .encode("utf-8")
        blen = (1 + (gathered >= 0x80).astype(np.int64)
                + (gathered >= 0x800) + (gathered >= 0x10000))
        b_off = np.concatenate([[0], np.cumsum(blen)])[out_off]
        bodies = pa.StringArray.from_buffers(
            len(chunk_len),
            pa.py_buffer(b_off.astype(np.int32).tobytes()),
            pa.py_buffer(u8))
    return doc_idx, starts_in_doc, chunk_start, chunk_len, bodies


def chunk_documents(sf_dir: str, chunk: int = CHUNK_CHARS,
                    stride: int = CHUNK_STRIDE,
                    hash_mode: str = "fast"):
    """Context-window chunking: split every document into overlapping
    fixed-size character chunks (chunk ``chunk``, stride ``stride`` —
    the standard long-document -> training-context explode; a tokenizer
    boundary swaps in for the character boundary with the same shape).

    Output: one row per chunk — (doc_id, chunk_idx, chunk_start,
    chunk_len, fp) where fp hashes the chunk text (xxhash by default,
    md5 under the oracle bridge).  Chunk ``i`` covers
    ``[i*stride, i*stride + chunk)`` while ``i*stride < n_chars``.

    Scale shape: pure flat_map expressed as one vectorized map_batches
    (``_chunk_explode_arrays``: per-doc chunk counts from integer
    arithmetic, a np.repeat explode, chunk bodies from ONE fancy-index
    gather — codepoint-exact, ASCII fast path); zero shuffle; prunes to
    (doc_id, text) at the read.
    """
    from ..functions.hashing import fast_hash64

    def explode(t: pa.Table) -> pa.Table:
        doc_idx, starts_in_doc, chunk_start, chunk_len, bodies = \
            _chunk_explode_arrays(t["text"], chunk, stride)
        if not len(doc_idx):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_start": pa.array([], pa.int64()),
                             "chunk_len": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.string())})
        if hash_mode == "md5":
            fps = [hashlib.md5(b.encode()).hexdigest()
                   for b in bodies.to_pylist()]
            fp_arr = pa.array(fps, pa.string())
        else:
            h = fast_hash64(bodies)
            fp_arr = pa.array(
                np.char.mod("%016x", h.astype(np.uint64)).astype(object),
                pa.string())
        did = pc.cast(t["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table({
            "doc_id": pa.array(did),
            "chunk_idx": pa.array(starts_in_doc),
            "chunk_start": pa.array(chunk_start),
            "chunk_len": pa.array(chunk_len),
            "fp": fp_arr,
        })

    return _docs(sf_dir, columns=("doc_id", "text")).map_batches(
        explode, batch_format="pyarrow", batch_size=65536)


PMI_MIN_COUNT = 5


def pmi_collocations(sf_dir: str, k: int = 20,
                     min_count: int = PMI_MIN_COUNT):
    """Collocation mining: top-k bigrams by pointwise mutual information
    PMI(a,b) = ln(P(ab) / (P(a) P(b))) with P(ab) over the bigram total
    and P(a), P(b) over the token total — the classic phrase-discovery
    statistic (tokenizer merges, stopword-phrase lists).

    Output: (bigram, n_ab, pmi_micro) ordered (pmi desc, bigram), k
    rows; pmi is floored to integer micro-units with the SAME float
    expression tree as the SQL oracle.

    Scale shape: unigram and bigram counts use the distinct-value
    combiner + ONE keyed groupby each; the (min_count-filtered) bigram
    rows then join the unigram table twice on token-keyed
    co-partitions (union-tag, no broadcast of the unbounded vocab);
    per-block top-k bounds the driver merge.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..functions.scale import coarse_npart

    npart = coarse_npart()
    ds = _docs(sf_dir, columns=("text",))

    def uni_partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    def bi_partial(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        n = len(flat)
        if n < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        a = flat.slice(0, n - 1)
        b = flat.slice(1, n)
        pairs = pc.binary_join_element_wise(a, b, " ")
        valid = np.ones(n - 1, bool)
        ends = offsets[1:] - 1
        valid[ends[(ends >= 0) & (ends < n - 1)]] = False
        valid &= pc.and_(pc.not_equal(a, ""), pc.not_equal(b, "")) \
            .to_numpy(zero_copy_only=False)
        pairs = pairs.filter(pa.array(valid))
        vc = pairs.value_counts()
        return pa.table({"bigram": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    uni = ds.map_batches(uni_partial, batch_format="pyarrow",
                         batch_size=262144) \
        .groupby("token").aggregate(Sum("cnt", alias_name="n")) \
        .materialize()
    bi = ds.map_batches(bi_partial, batch_format="pyarrow",
                        batch_size=262144) \
        .groupby("bigram").aggregate(Sum("cnt", alias_name="n_ab"))

    # bounded totals: per-block partial sums (O(blocks) driver rows)
    def tok_total(t: pa.Table) -> pa.Table:
        s = pc.sum(t["n"]).as_py() if t.num_rows else None
        return pa.table({"s": pa.array([s] if s is not None else [],
                                       pa.int64())})

    from pg_walstream_ray.pipelines.analytics import _gather
    tt = _gather(uni.map_batches(tok_total, batch_format="pyarrow"))
    empty = pa.table({"bigram": pa.array([], pa.string()),
                      "n_ab": pa.array([], pa.int64()),
                      "pmi_micro": pa.array([], pa.int64())})
    if tt is None:
        import ray.data as rd

        return rd.from_arrow(empty)
    n_tok = int(pc.sum(tt["s"]).as_py() or 0)

    def bi_filter(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater_equal(t["n_ab"], min_count))
        s = int(pc.sum(t["n_ab"]).as_py() or 0)   # total over ALL bigrams
        if keep.num_rows:
            return pa.table({"bigram": keep["bigram"],
                             "n_ab": pc.cast(keep["n_ab"], pa.int64()),
                             "part_total": pa.array(
                                 [s] + [0] * (keep.num_rows - 1),
                                 pa.int64())})
        # zero survivors: a zero-length "" row still carries the block's
        # total (bi_side drops empty bigrams before the join)
        return pa.table({"bigram": pa.array([""], pa.string()),
                         "n_ab": pa.array([0], pa.int64()),
                         "part_total": pa.array([s], pa.int64())})

    bim = bi.map_batches(bi_filter, batch_format="pyarrow").materialize()

    def total_only(t: pa.Table) -> pa.Table:
        s = pc.sum(t["part_total"]).as_py() if t.num_rows else None
        return pa.table({"s": pa.array([s] if s is not None else [],
                                       pa.int64())})

    bt = _gather(bim.map_batches(total_only, batch_format="pyarrow"))
    n_bi = int(pc.sum(bt["s"]).as_py() or 0) if bt is not None else 0
    if n_tok == 0 or n_bi == 0:
        import ray.data as rd

        return rd.from_arrow(empty)

    # -- join bigrams to unigram counts: two token-keyed co-partitions --
    def bi_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(pc.utf8_length(t["bigram"]), 0))
        if not t.num_rows:
            return pa.table({"key": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "bigram": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64()),
                             "n_tok_cnt": pa.array([], pa.int64()),
                             "is_uni": pa.array([], pa.bool_())})
        first = pc.list_element(pc.split_pattern(t["bigram"], " "), 0)
        from ..stages.partition import stable_hash_strings
        h = stable_hash_strings(pa.chunked_array([first])) % npart
        return pa.table({"key": first,
                         "bucket": pa.array(h.astype(np.int64)),
                         "bigram": t["bigram"],
                         "n_ab": t["n_ab"],
                         "n_tok_cnt": pa.array(
                             np.zeros(t.num_rows, np.int64)),
                         "is_uni": pa.array(np.zeros(t.num_rows, bool))})

    def uni_side(t: pa.Table) -> pa.Table:
        from ..stages.partition import stable_hash_strings
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        h = stable_hash_strings(pa.chunked_array([tok])) % npart
        return pa.table({"key": tok,
                         "bucket": pa.array(h.astype(np.int64)),
                         "bigram": pa.array([""] * t.num_rows,
                                            pa.string()),
                         "n_ab": pa.array(np.zeros(t.num_rows, np.int64)),
                         "n_tok_cnt": pc.cast(t["n"], pa.int64()),
                         "is_uni": pa.array(np.ones(t.num_rows, bool))})

    def join_first(g: pd.DataFrame) -> pd.DataFrame:
        u = g[g["is_uni"]]
        bg = g[~g["is_uni"]]
        m = bg.merge(u[["key", "n_tok_cnt"]].rename(
            columns={"n_tok_cnt": "n_a"}), on="key", how="inner")
        # re-key by the SECOND token for the next co-partition
        out = pd.DataFrame({"bigram": m["bigram"],
                            "n_ab": m["n_ab"].to_numpy(np.int64),
                            "n_a": m["n_a"].to_numpy(np.int64)})
        out["key"] = out["bigram"].str.split(" ").str[1]
        return out

    bsel = bim.map_batches(
        lambda t: bi_side(pa.table({"bigram": t["bigram"],
                                    "n_ab": t["n_ab"]})),
        batch_format="pyarrow")
    stage1 = bsel.union(uni.map_batches(uni_side,
                                        batch_format="pyarrow")) \
        .groupby("bucket").map_groups(join_first, batch_format="pandas",
                                      num_cpus=1)

    def rekey(t: pa.Table) -> pa.Table:
        from ..stages.partition import stable_hash_strings
        key = t["key"]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        h = stable_hash_strings(pa.chunked_array([key])) % npart
        return pa.table({"key": key,
                         "bucket": pa.array(h.astype(np.int64)),
                         "bigram": t["bigram"],
                         "n_ab": t["n_ab"],
                         "n_a": t["n_a"],
                         "n_tok_cnt": pa.array(
                             np.zeros(t.num_rows, np.int64)),
                         "is_uni": pa.array(np.zeros(t.num_rows, bool))})

    def uni_side2(t: pa.Table) -> pa.Table:
        from ..stages.partition import stable_hash_strings
        tok = t["token"]
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        h = stable_hash_strings(pa.chunked_array([tok])) % npart
        return pa.table({"key": tok,
                         "bucket": pa.array(h.astype(np.int64)),
                         "bigram": pa.array([""] * t.num_rows,
                                            pa.string()),
                         "n_ab": pa.array(np.zeros(t.num_rows, np.int64)),
                         "n_a": pa.array(np.zeros(t.num_rows, np.int64)),
                         "n_tok_cnt": pc.cast(t["n"], pa.int64()),
                         "is_uni": pa.array(np.ones(t.num_rows, bool))})

    def join_second(g: pd.DataFrame) -> pd.DataFrame:
        u = g[g["is_uni"]]
        bg = g[~g["is_uni"]]
        m = bg.merge(u[["key", "n_tok_cnt"]].rename(
            columns={"n_tok_cnt": "n_b"}), on="key", how="inner")
        if not len(m):
            return pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                 "n_ab": pd.Series([], dtype=np.int64),
                                 "pmi_micro": pd.Series([],
                                                        dtype=np.int64)})
        n_ab = m["n_ab"].to_numpy(np.float64)
        n_a = m["n_a"].to_numpy(np.float64)
        n_b = m["n_b"].to_numpy(np.float64)
        # expression tree mirrored in the oracle:
        # LN(n_ab*n_tok*n_tok/(n_bi*n_a*n_b)) — left-assoc products
        arg = ((n_ab * n_tok) * n_tok) / ((n_bi * n_a) * n_b)
        pmi = np.floor(np.log(arg) * 1000000.0).astype(np.int64)
        out = pd.DataFrame({"bigram": m["bigram"],
                            "n_ab": m["n_ab"].to_numpy(np.int64),
                            "pmi_micro": pmi})
        order = np.lexsort((out["bigram"].to_numpy(object),
                            -out["pmi_micro"].to_numpy(np.int64)))[:k]
        return out.iloc[order]

    stage2 = stage1.map_batches(rekey, batch_format="pyarrow") \
        .union(uni.map_batches(uni_side2, batch_format="pyarrow")) \
        .groupby("bucket").map_groups(join_second,
                                      batch_format="pandas", num_cpus=1)
    rows = _gather(stage2)
    if rows is None:
        import ray.data as rd

        return rd.from_arrow(empty)
    df = rows.to_pandas()
    order = np.lexsort((df["bigram"].to_numpy(object),
                        -df["pmi_micro"].to_numpy(np.int64)))[:k]
    df = df.iloc[order]
    return pa.table({"bigram": pa.array(df["bigram"].astype(str)),
                     "n_ab": pa.array(df["n_ab"].to_numpy(np.int64)),
                     "pmi_micro": pa.array(
                         df["pmi_micro"].to_numpy(np.int64))})


PSI_BINS = 10


class _PsiPartial(TextStatsStage):
    """Per-batch (source, quality-bin) counts — the PSI combiner."""

    def __call__(self, t: pa.Table) -> pa.Table:       # type: ignore[override]
        import pandas as pd

        stats = TextStatsStage.__call__(self, t)
        q = stats["quality_q"].to_numpy(zero_copy_only=False)
        b = np.minimum(q // 1000, PSI_BINS - 1).astype(np.int64)
        src = t["source"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": src, "bin": b}) \
            .groupby(["source", "bin"], as_index=False).size()
        return pa.table({
            "source": pa.array(df["source"].astype(str)),
            "bin": pa.array(df["bin"].to_numpy(np.int64)),
            "cnt": pa.array(df["size"].to_numpy(np.int64)),
        })


def psi_source_drift(sf_dir: str):
    """Per-source distribution-drift monitor: Population Stability Index
    of each source's quality-score distribution against the whole
    corpus (10 equal-width basis-point bins, Laplace-smoothed so empty
    bins are well-defined) — the standard training-mix drift alarm.

    Output: (source, n_docs, psi_micro) ordered by source; each bin's
    (p-q)*ln(p/q) term floors to integer micro-units before the sum, so
    the result is summation-order-free and hash-exact vs the oracle.

    Scale shape: the quality scan emits bounded (source, bin) count
    partials (<= |sources| x 10 rows per batch, zero shuffle); the
    driver reduce and the PSI arithmetic are O(|sources| x 10).
    """
    from pg_walstream_ray.pipelines.analytics import _gather

    parts = _docs(sf_dir, columns=("doc_id", "text", "source")) \
        .map_batches(as_tasks(_PsiPartial), batch_format="pyarrow",
                     batch_size=4096)
    rows = _gather(parts)
    empty = pa.table({"source": pa.array([], pa.string()),
                      "n_docs": pa.array([], pa.int64()),
                      "psi_micro": pa.array([], pa.int64())})
    if rows is None:
        import ray.data as rd

        return rd.from_arrow(empty)
    import pandas as pd

    df = rows.to_pandas().groupby(["source", "bin"],
                                  as_index=False)["cnt"].sum()
    total = int(df["cnt"].sum())
    corpus = df.groupby("bin")["cnt"].sum() \
        .reindex(range(PSI_BINS), fill_value=0).to_numpy(np.int64)
    out_src, out_n, out_psi = [], [], []
    for src in sorted(df["source"].unique()):
        sub = df[df["source"] == src]
        cs = sub.set_index("bin")["cnt"] \
            .reindex(range(PSI_BINS), fill_value=0).to_numpy(np.int64)
        ns = int(cs.sum())
        # Laplace smoothing, same rational form as the oracle:
        # p = (c_sb + 1) / (n_s + 10), q = (c_b + 1) / (n + 10)
        p = (cs + 1.0) / (ns + PSI_BINS)
        qq = (corpus + 1.0) / (total + PSI_BINS)
        term = (p - qq) * np.log(p / qq)
        psi = int(np.floor(term * 1000000.0).astype(np.int64).sum())
        out_src.append(src)
        out_n.append(ns)
        out_psi.append(psi)
    return pa.table({"source": pa.array(out_src, pa.string()),
                     "n_docs": pa.array(out_n, pa.int64()),
                     "psi_micro": pa.array(out_psi, pa.int64())})


class _QualitySlim(TextStatsStage):
    """Per-batch slim projection: (doc_id, source, quality_q)."""

    def __call__(self, t: pa.Table) -> pa.Table:       # type: ignore[override]
        stats = TextStatsStage.__call__(self, t)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "quality_q": stats["quality_q"]})


def quality_percentile(sf_dir: str):
    """Per-source quantile normalization of the quality score: each doc's
    score mapped to its within-source PERCENT_RANK (micro-units) — the
    calibration step before cross-source mixing, where raw scores are not
    comparable because sources have different score distributions.

    Output: (doc_id, source, quality_q, pctl_micro) with
    pctl_micro = floor(percent_rank * 10^6), percent_rank =
    count(values < q) / (n_source - 1) (SQL PERCENT_RANK tie semantics:
    min rank of the tie group; single-doc sources get 0).

    Scale shape: ONE text scan produces a slim (doc_id, source,
    quality_q) projection (16 B/row — materialized once so the text is
    never read twice); the per-source score histogram is BOUNDED
    (|sources| x 10001 basis-point values) and gathered with O(1) driver
    state per cell; ranks are then attached by a zero-shuffle map with
    the cumulative tables broadcast via ray.put — doc rows never
    shuffle, and no per-source sort of data rows ever happens.
    """
    import ray
    import ray.data as rd

    from pg_walstream_ray.pipelines.analytics import _gather

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "source": pa.array([], pa.string()),
                      "quality_q": pa.array([], pa.int64()),
                      "pctl_micro": pa.array([], pa.int64())})

    slim = _docs(sf_dir, columns=("doc_id", "text", "source")) \
        .map_batches(as_tasks(_QualitySlim), batch_format="pyarrow",
                     batch_size=4096).materialize()

    def hpart(t: pa.Table) -> pa.Table:
        d = t.group_by(["source", "quality_q"]).aggregate(
            [("quality_q", "count")])
        return pa.table({"source": d["source"], "q": d["quality_q"],
                         "cnt": pc.cast(d["quality_q_count"], pa.int64())})

    rows = _gather(slim.map_batches(hpart, batch_format="pyarrow",
                                    batch_size=262144))
    if rows is None:
        return rd.from_arrow(empty)

    df = rows.to_pandas().groupby(["source", "q"], as_index=False)["cnt"] \
        .sum()
    # per-source LUT: sorted distinct scores + count-strictly-less + n
    lut: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for src, sub in df.groupby("source"):
        sub = sub.sort_values("q", kind="mergesort")
        cnt = sub["cnt"].to_numpy(np.int64)
        cum = cnt.cumsum()
        less = cum - cnt                       # strictly-less at each value
        lut[str(src)] = (sub["q"].to_numpy(np.int64), less, int(cum[-1]))
    ref = ray.put(lut)

    class Attach:
        def __init__(self, r):
            self.lut = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            src = t["source"].to_numpy(zero_copy_only=False)
            q = t["quality_q"].to_numpy(zero_copy_only=False)
            pct = np.zeros(len(q), np.int64)
            for s in np.unique(src):
                m = src == s
                vals, less, n = self.lut[str(s)]
                if n <= 1:
                    continue                   # PERCENT_RANK of 1 row = 0
                cl = less[np.searchsorted(vals, q[m])]
                # same double expression order as the SQL oracle:
                # floor(((r-1)/(n-1)) * 1e6)
                pr = cl.astype(np.float64) / float(n - 1)
                pct[m] = np.floor(pr * 1000000.0).astype(np.int64)
            return pa.table({"doc_id": t["doc_id"], "source": t["source"],
                             "quality_q": t["quality_q"],
                             "pctl_micro": pa.array(pct)})

    return slim.map_batches(Attach, fn_constructor_args=(ref,),
                            batch_format="pyarrow", batch_size=65536,
                            concurrency=(1, 8))


def temperature_mix(sf_dir: str, hash_mode: str = "fast"):
    """Temperature-flattened language mixing — the low-resource-upsampling
    primitive (multilingual corpus construction a la XLM-R): target
    share per language l is n_l^0.5 / sum_m n_m^0.5 (temperature
    alpha = 0.5 flattens the skew toward head languages), realised by a
    deterministic per-language keep fraction
        permille_l = min(1000, 1000 * N * isqrt(n_l) // (S * n_l)),
    with S = sum_m isqrt(n_m) — ALL integer arithmetic (isqrt =
    floor-sqrt is the oracle-bridge convention: a float SUM over
    languages would be order-dependent across engines).  Documents are
    selected by content-stable id hash, never a seeded RNG, so
    resampling any shard reproduces the same mixture.

    Output: (doc_id, lang) — the flattened mixture (head languages
    thinned, tail languages kept whole).

    Scale shape: per-batch lang value_counts combiner -> one BOUNDED
    groupby (|langs| rows) -> driver computes the |langs|-entry permille
    table -> zero-shuffle filter map with the table in the closure
    (ray.put broadcast at real vocabulary sizes).
    """
    import math

    from ray.data.aggregate import Sum

    from ..functions.hashing import fast_hash64

    ds = _docs(sf_dir, columns=("doc_id", "lang"))

    def counts(t: pa.Table) -> pa.Table:
        agg = t.group_by("lang").aggregate([("lang", "count")])
        return pa.table({"lang": agg["lang"],
                         "n": pc.cast(agg["lang_count"], pa.int64())})

    rows = (ds.map_batches(counts, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("lang").aggregate(Sum("n", alias_name="n"))
            .take_all())                    # bounded: |langs| rows
    total = sum(int(r["n"]) for r in rows)
    s_int = sum(math.isqrt(int(r["n"])) for r in rows)
    permille = {r["lang"]: min(
        1000, 1000 * total * math.isqrt(int(r["n"]))
        // (s_int * int(r["n"]))) for r in rows}

    def keep(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        thr = np.fromiter((permille[l] for l in langs), dtype=np.int64,
                          count=len(langs))
        if hash_mode == "md5":
            ids = t["doc_id"].to_pylist()
            h = np.fromiter(
                (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                 % 1000 for i in ids), dtype=np.int64, count=len(ids))
        else:
            h = (fast_hash64(pc.cast(t["doc_id"], pa.string()))
                 % np.uint64(1000)).astype(np.int64)
        mask = pa.array(h < thr)
        return pa.table({"doc_id": t["doc_id"].filter(mask),
                         "lang": t["lang"].filter(mask)})

    return ds.map_batches(keep, batch_format="pyarrow")


TRAIN_SHUFFLE_SEED = 42
TRAIN_SHUFFLE_BITS = 12            # 4096 range buckets


def train_shuffle(sf_dir: str, seed: int = TRAIN_SHUFFLE_SEED,
                  hash_mode: str = "fast",
                  bits: int = TRAIN_SHUFFLE_BITS):
    """Deterministic global training-order shuffle with EXACT positions —
    the epoch-ordering primitive: every document gets a reproducible
    position ``pos`` in a pseudo-random permutation keyed by
    ``hash(doc_id | seed)``.  Unlike ``Dataset.random_shuffle`` the order
    is content-stable (independent of row order, partitioning and cluster
    size), so a resumed/re-run epoch reads the identical sequence and a
    failed run can skip finished position ranges.

    Output: (pos, doc_id) with pos = rank of the doc's 60-bit shuffle key
    (ties, i.e. hash collisions, broken by doc_id — mirrored in the
    oracle's ORDER BY key, doc_id).

    Scale shape (no global sort operator): shuffle keys are uniform
    hashes, so key-range = size-balanced range partition for free.
      1. one pruned scan -> 2^bits-bin key-prefix histogram (per-batch
         partials, one bounded groupby, <= 4096 rows to the driver);
      2. driver prefix-sums bucket offsets (O(2^bits) ints, in the task
         closure -- ray.put scale);
      3. second scan routes rows by key prefix; each bucket sorts locally
         and adds its offset -> exact global rank, one all-to-all of
         (key, doc_id) pairs only.
    A 100 TB corpus shuffles with driver state of 32 KiB and per-task
    sorts of ~N/4096 rows.

    ``hash_mode='md5'`` bridges to the SQL oracle
    (``('0x' || substr(md5(doc_id || '|seed'), 1, 15))::BIGINT``);
    'fast' (default) is the vectorized xxhash path.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..functions.hashing import fast_hash64

    shift = 60 - bits

    def keys_of(t: pa.Table) -> np.ndarray:
        s = pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()), f"|{seed}", "")
        if hash_mode == "md5":
            vals = s.to_pylist()
            return np.fromiter((md5_int60(v) for v in vals),
                               dtype=np.int64, count=len(vals))
        return (fast_hash64(s) >> np.uint64(4)).astype(np.int64)

    ds = _docs(sf_dir, columns=("doc_id",))

    def hist(t: pa.Table) -> pa.Table:
        b = keys_of(t) >> shift
        cnt = np.bincount(b, minlength=1 << bits)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    rows = (ds.map_batches(hist, batch_format="pyarrow",
                           batch_size=262144)
            .groupby("bucket").aggregate(Sum("n", alias_name="n"))
            .take_all())                   # bounded: <= 2^bits rows
    counts = np.zeros(1 << bits, np.int64)
    for r in rows:
        counts[int(r["bucket"])] = int(r["n"])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def route(t: pa.Table) -> pa.Table:
        k = keys_of(t)
        return pa.table({"bucket": pa.array(k >> shift),
                         "key": pa.array(k),
                         "doc_id": pc.cast(t["doc_id"], pa.int64())})

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["doc_id"].to_numpy(np.int64),
                        g["key"].to_numpy(np.int64)))
        base = offsets[int(g["bucket"].iloc[0])]
        out = g.iloc[o]
        return pd.DataFrame({
            "pos": base + np.arange(len(g), dtype=np.int64),
            "doc_id": out["doc_id"].to_numpy(np.int64)})

    return (ds.map_batches(route, batch_format="pyarrow")
            .groupby("bucket").map_groups(rank_bucket,
                                          batch_format="pandas"))


WSAMPLE_K = 200
WSAMPLE_SEED = 7


def weighted_sample(sf_dir: str, k: int = WSAMPLE_K,
                    seed: int = WSAMPLE_SEED, hash_mode: str = "fast"):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    keep the k documents with the smallest ``-ln(u)/w`` where ``u`` is a
    content-stable uniform from ``hash(doc_id|seed)`` and ``w`` is the
    document weight (n_chars — longer docs proportionally likelier).
    Deterministic (no RNG state, independent of row order/partitioning),
    so the sample is reproducible across runs and resumable shards.

    Output: (doc_id, n_chars, score_micro) — the k winners.

    Scores are floored to integer NANO-units so the DuckDB oracle's LN
    agrees bit-for-bit (the micro-floor convention used by bm25/pmi/psi);
    ties break by doc_id in both engines.  Scale shape: per-batch partial
    top-k combiner (k rows leave each block), one k x nblocks merge block
    — never a global sort.
    """
    from ..functions.hashing import fast_hash64

    ds = _docs(sf_dir, columns=("doc_id", "n_chars"))

    def score(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pc.cast(t["doc_id"], pa.string()), f"|{seed}", "")
        if hash_mode == "md5":
            vals = s.to_pylist()
            h32 = np.fromiter(
                (int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
                 for v in vals), dtype=np.int64, count=len(vals))
        else:
            h32 = (fast_hash64(s) >> np.uint64(32)).astype(np.int64)
        u = (h32.astype(np.float64) + 0.5) / 4294967296.0
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        micro = np.floor(-np.log(u) * 1e9 / w).astype(np.int64)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_chars": pc.cast(t["n_chars"], pa.int64()),
                         "score_micro": pa.array(micro)})

    def topk(t: pa.Table) -> pa.Table:
        order = np.lexsort((t["doc_id"].to_numpy(zero_copy_only=False),
                            t["score_micro"].to_numpy(
                                zero_copy_only=False)))[:k]
        return t.take(pa.array(np.sort(order)))

    return (ds.map_batches(score, batch_format="pyarrow")
            .map_batches(topk, batch_format="pyarrow")
            .repartition(1)
            .map_batches(topk, batch_size=None, batch_format="pyarrow"))


ENTROPY_LO_MICRO = 1_000_000     # keep band: 1.0 .. 6.0 nats (micro-units)
ENTROPY_HI_MICRO = 6_000_000


def token_entropy(sf_dir: str, lo_micro: int = ENTROPY_LO_MICRO,
                  hi_micro: int = ENTROPY_HI_MICRO):
    """Shannon token entropy per document — the distribution-shape
    quality signal (repetitive/templated docs score low, natural prose
    sits mid-band, random token soup scores near ln(n_tokens)):
        H = ln(n) - (1/n) * sum_t c_t * ln(c_t)
    over the doc's token counts, floored to integer MICRO-nats (the
    LN-micro oracle-bridge convention shared with bm25/pmi/psi), plus a
    keep flag for the [lo, hi] band.

    Output: (doc_id, n_tokens, entropy_micro, keep).

    Fully vectorized, zero shuffle: per-(doc, token) counts come from ONE
    np.unique over batch-local (doc_idx, token_id) pairs; the per-doc
    sum of c*ln(c) is a segmented np.add.at — no Python loop touches a
    row, and each batch's cost is O(tokens log tokens).
    """

    class EntropyStage:
        def __init__(self):
            self.hasher = worker_token_hasher()

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_tokens": pa.array([], pa.int64()),
                                 "entropy_micro": pa.array([], pa.int64()),
                                 "keep": pa.array([], pa.bool_())})
            text = t["text"]
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            offsets, tok = tokenize_column(text, self.hasher)
            n_docs = t.num_rows
            n_tok = np.diff(offsets).astype(np.int64)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok)
            # per-(doc, token) counts in one unique over combined keys;
            # token ids compact to batch-local indices first so the pair
            # key never collides (hash ids could share low bits)
            _, inv = np.unique(tok, return_inverse=True)
            pair = doc_of * np.int64(int(inv.max()) + 1) + inv
            _, first, cnt = np.unique(pair, return_index=True,
                                      return_counts=True)
            c = cnt.astype(np.float64)
            clnc = np.zeros(n_docs, np.float64)
            np.add.at(clnc, doc_of[first], c * np.log(c))
            n = n_tok.astype(np.float64)
            h = np.log(n) - clnc / n
            micro = np.floor(h * 1e6).astype(np.int64)
            keep = (micro >= lo_micro) & (micro <= hi_micro)
            return pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tokens": pa.array(n_tok),
                "entropy_micro": pa.array(micro),
                "keep": pa.array(keep)})

    return _docs(sf_dir).map_batches(as_tasks(EntropyStage),
                                     batch_format="pyarrow",
                                     batch_size=4096)


def train_val_split(sf_dir: str, val_pct: int = 3):
    """Leakage-audited train/val split: documents are assigned to the VAL
    split by IDENTITY hash (md5(doc_id) % 100 < val_pct) — deterministic
    and reshuffle-proof, unlike a random split — then every TRAIN doc
    sharing at least one 3-token shingle with ANY val doc is flagged
    LEAKY: the split-internal contamination audit run before an eval set
    is trusted (a val answer verbatim in train invalidates the eval).

    Output: (doc_id, split, leaky) — split in {'train','val'}; val rows
    carry leaky=0 by definition.

    Scale shape: same as decontaminate — the val side is a small fixed
    fraction, its distinct shingles are collected bounded and broadcast
    once (``ray.put``); the train scan matches each doc's shingles via
    searchsorted inside map_batches.  ZERO shuffle.
    """
    import ray

    def _is_val(doc_ids: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (md5_int60(str(int(d))) % 100 < val_pct for d in doc_ids),
            dtype=bool, count=len(doc_ids))

    def val_shingles(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(_is_val(ids)))
        _, sh = _shingles3(t["text"])
        return pa.table({"s": pc.unique(sh)})

    parts = [b for b in _docs(sf_dir).map_batches(val_shingles,
                                                  batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    if parts:
        allsh = pa.concat_tables(
            [p if isinstance(p, pa.Table) else pa.Table.from_batches([p])
             for p in parts])
        val_arr = np.sort(np.asarray(
            pc.unique(allsh["s"]).to_pylist(), dtype=object))
    else:
        val_arr = np.array([], dtype=object)
    val_ref = ray.put(val_arr)

    def scan(t: pa.Table) -> pa.Table:
        vset = ray.get(val_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        isv = _is_val(ids)
        n = t.num_rows
        leaky = np.zeros(n, dtype=np.int64)
        train = t.filter(pa.array(~isv))
        if len(vset) and train.num_rows:
            offs, sh = _shingles3(train["text"])
            if len(sh):
                denc = pc.dictionary_encode(sh)
                dvals = np.asarray(denc.dictionary.to_pylist(),
                                   dtype=object)
                pos = np.searchsorted(vset, dvals)
                pos_c = np.clip(pos, 0, len(vset) - 1)
                dhit = (pos < len(vset)) & (vset[pos_c] == dvals)
                hit = dhit[denc.indices.to_numpy(zero_copy_only=False)
                           .astype(np.int64)]
                doc_of_sh = np.repeat(
                    np.arange(train.num_rows, dtype=np.int64),
                    np.diff(offs))
                tl = np.zeros(train.num_rows, dtype=np.int64)
                np.maximum.at(tl, doc_of_sh, hit.astype(np.int64))
                leaky[~isv] = tl
        return pa.table({
            "doc_id": t["doc_id"],
            "split": pa.array(np.where(isv, "val", "train"), pa.string()),
            "leaky": pa.array(leaky)})

    return _docs(sf_dir).map_batches(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Feature-hashing vectorizer (hashing trick) + hashed-embedding retrieval
# ---------------------------------------------------------------------------

HASH_EMBED_D = 16          # hashed dimensionality (mirrored in the oracle)
HASH_EMBED_NQ = 4          # query docs: doc_id < NQ
HASH_EMBED_K = 10


def hash_embed_texts(texts, hasher, d: int = HASH_EMBED_D):
    """Dense signed-occurrence feature-hash matrices for a text column.

    Returns (vecs [n,d] int64, occ [n,d] int64) — the HashEmbedStage
    semantics factored out so any pipeline with a text column (e.g. the
    live CDC change stream) can derive the same md5-bridge-exact integer
    vectors: dim(w) = h60(w) % d, sign(w) = +1 iff bit 4 of h60 is 0,
    weight = signed occurrence sum, empty split('') artifacts dropped.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    vecs = np.zeros((n, d), dtype=np.int64)
    occ = np.zeros((n, d), dtype=np.int64)
    if n:
        offsets, tok = tokenize_column(texts, hasher)
        h60 = hasher.h60_array[tok]
        doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                            np.diff(offsets))
        empty_id = hasher._idx.get("")        # split('') artifacts are
        if empty_id is not None:              # not tokens (oracle:
            keep = tok != empty_id            # WHERE w <> '')
            h60, doc_idx = h60[keep], doc_idx[keep]
        dims = h60 % d
        signs = 1 - 2 * ((h60 >> 4) & 1)
        flat = doc_idx * d + dims
        np.add.at(vecs.ravel(), flat, signs)
        np.add.at(occ.ravel(), flat, 1)
    return vecs, occ


def hash_embed_texts_fast(texts, d: int = HASH_EMBED_D) -> np.ndarray:
    """Production-mode twin of hash_embed_texts: same signed
    feature-hash construction but over the vectorized xxhash kernel
    (fast_hash64) — no per-token Python, no vocabulary cache, ~2 orders
    faster on unique-heavy token streams.  NOT SQL-bridgeable (DuckDB
    can't reproduce xxhash); the md5 path stays the oracle mode, the
    same hash_mode split every content-hash operator documents.
    Returns the dense [n, d] int64 weight matrix."""
    from ..functions.hashing import fast_hash64

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    vecs = np.zeros((n, d), dtype=np.int64)
    if n:
        split = pc.split_pattern(texts, " ")
        offsets = split.offsets.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        offsets = offsets - offsets[0]
        flat = split.flatten()
        doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                            np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        h = fast_hash64(flat)[keep]
        doc_idx = doc_idx[keep]
        dims = (h % d).astype(np.int64)
        signs = 1 - 2 * ((h >> 4) & 1).astype(np.int64)
        # bincount beats np.add.at (unbuffered scatter); float64 sums of
        # +-1 are exact far beyond any batch size
        vecs = np.bincount(doc_idx * d + dims, weights=signs,
                           minlength=n * d).astype(np.int64) \
            .reshape(n, d)
    return vecs


class HashEmbedStage:
    """documents batch -> signed bag-of-words feature-hash vectors (the
    hashing trick: Weinberger et al. 2009 / sklearn HashingVectorizer
    semantics): dim(w) = h60(w) % D, sign(w) = +1 iff bit 4 of h60 is 0.
    Every component is an INTEGER (signed occurrence sum), so the DuckDB
    oracle reproduces the vectors — and any integer similarity computed
    from them — bit-for-bit.  The reference ships raw text through its
    sinks (src/handlers); in-engine vectorization is part of the
    training-data surface this engine adds (SURVEY §2.12).

    Scale shape: the md5-per-DISTINCT-token cost is amortized by the
    worker-process vocabulary cache (worker_token_hasher — survives
    across batches/tasks like actor state); the per-occurrence work is
    all numpy (repeat / modulo / scatter-add).  ZERO shuffle: each doc's
    vector is a pure map.
    """

    def __init__(self, d: int = HASH_EMBED_D):
        self.hasher = worker_token_hasher()
        self.d = d

    def dense(self, t: pa.Table):
        """(doc_ids, dense int64 [n,d] weights, [n,d] occupancy counts).

        Occupancy tracks which (doc, dim) cells saw at least one token:
        the sparse output keeps a cell with weight 0 when +1/-1 signs
        cancelled, exactly as the oracle's GROUP BY does.
        """
        vecs, occ = hash_embed_texts(t["text"] if t.num_rows else
                                     pa.array([], pa.string()),
                                     self.hasher, self.d)
        return (t["doc_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64), vecs, occ)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, vecs, occ = self.dense(t)
        doc_r, dim_r = np.nonzero(occ)
        return pa.table({
            "doc_id": pa.array(ids[doc_r], pa.int64()),
            "dim": pa.array(dim_r.astype(np.int32)),
            "weight": pa.array(vecs[doc_r, dim_r], pa.int64()),
        })


def hash_embed(sf_dir: str, d: int = HASH_EMBED_D):
    """Sparse feature-hash embedding of every document.
    Output: (doc_id, dim, weight) — one row per occupied (doc, dim) cell."""
    return _docs(sf_dir).map_batches(as_tasks(HashEmbedStage, d=d),
                                     batch_format="pyarrow")


def hash_embed_topk(sf_dir: str, nq: int = HASH_EMBED_NQ,
                    k: int = HASH_EMBED_K, d: int = HASH_EMBED_D):
    """Hashed-embedding retrieval: integer dot-product top-k of every
    document against the query docs (doc_id < nq), self excluded —
    similarity search where the index vectors are derived IN-ENGINE from
    text (no precomputed embedding column).  Ties break on neighbor_id;
    integer scores make the ranking exact, so the oracle pins rank AND
    score.  Output: (query_id, neighbor_id, rnk, dot).

    Scale shape: query vectors are a [nq, d] int matrix broadcast once
    (ray.put); each batch computes one [B, nq] int matmul and emits its
    LOCAL top-k per query, so the final groupby(query_id) combine sees
    only O(num_batches * nq * k) candidate rows.  The corpus is never
    shuffled.
    """
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray

    qt = pq_.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"],
                        filters=[("doc_id", "<", nq)])
    qids, qv, _ = HashEmbedStage(d=d).dense(qt)
    if not len(qids):
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64()),
            "dot": pa.array([], pa.int64())}))
    q_ref = ray.put((qids, qv))

    class _Scan:
        def __init__(self):
            self.stage = HashEmbedStage(d=d)
            self.qids, self.qv = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, vecs, _ = self.stage.dense(t)
            empty = pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64())})
            if not len(ids):
                return empty
            dots = vecs @ self.qv.T               # [B, nq] int64 exact
            out_q, out_n, out_d = [], [], []
            for j, qid in enumerate(self.qids):
                keep = ids != qid                 # self excluded
                cand_ids, s = ids[keep], dots[keep, j]
                if not len(cand_ids):
                    continue
                kk = min(k, len(cand_ids))
                # local top-k by (dot desc, doc_id asc)
                order = np.lexsort((cand_ids, -s))[:kk]
                out_q.append(np.full(kk, qid, np.int64))
                out_n.append(cand_ids[order])
                out_d.append(s[order])
            if not out_q:
                return empty
            return pa.table({"query_id": np.concatenate(out_q),
                             "neighbor_id": np.concatenate(out_n),
                             "dot": np.concatenate(out_d)})

    cand = _docs(sf_dir).map_batches(as_tasks(_Scan),
                                     batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dot", "neighbor_id"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": g["query_id"].to_numpy(),
            "neighbor_id": g["neighbor_id"].to_numpy(),
            "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            "dot": g["dot"].to_numpy()})

    return cand.groupby("query_id").map_groups(combine,
                                               batch_format="pandas")


def corpus_curriculum(sf_dir: str):
    """CURRICULUM ordering: exact global training positions by ascending
    quality (easy-first scheduling's deterministic cousin — order the
    corpus by a difficulty/quality signal instead of a hash).  Output:
    (pos, doc_id, quality_q) with pos = rank by (quality_q ASC, doc_id
    ASC), 0-based and contiguous.

    Scale shape (no global sort operator — train_shuffle's histogram
    range partition specialized to a BOUNDED score space): quality_q is
    basis points, so the "histogram" is a direct 10001-bin bincount (one
    bounded groupby, <= 80 KiB of driver state); the second pass routes
    rows by their exact score and each score-bucket only sorts doc_ids
    locally and adds its prefix offset.  One all-to-all of (quality_q,
    doc_id) int pairs; text is read once for scoring and never moves.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    stats = text_quality(sf_dir).select_columns(["doc_id", "quality_q"])

    def hist(t: pa.Table) -> pa.Table:
        q = t["quality_q"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(q, minlength=10001)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    rows = (stats.map_batches(hist, batch_format="pyarrow",
                              batch_size=262144)
            .groupby("bucket").aggregate(Sum("n", alias_name="n"))
            .take_all())                   # bounded: <= 10001 rows
    counts = np.zeros(10001, np.int64)
    for r in rows:
        counts[int(r["bucket"])] = int(r["n"])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy(np.int64))
        base = offsets[int(g["quality_q"].iloc[0])]
        return pd.DataFrame({
            "pos": base + np.arange(len(g), dtype=np.int64),
            "doc_id": ids,
            "quality_q": g["quality_q"].iloc[0]})

    return stats.groupby("quality_q").map_groups(rank_bucket,
                                                 batch_format="pandas")


NB_MICRO = 1_000_000


def nb_source_classify(sf_dir: str):
    """Public face of the NB domain classifier: (doc_id, pred_source,
    score_micro) — see _nb_scored_with_source for the machinery."""
    return _nb_scored_with_source(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "pred_source", "score_micro"]),
        batch_format="pyarrow")


def _nb_scored_with_source(sf_dir: str):
    """Multinomial Naive Bayes DOMAIN CLASSIFIER trained on the corpus
    itself: per-source token counts with Laplace smoothing, then every
    document scored against every source and assigned the argmax — the
    fasttext-style source/quality classifier a filtering pipeline trains
    to score new crawls (predicting the held-in corpus's own labels is
    the standard self-test).  Log-probabilities are FLOOR-microunit
    integers per token occurrence (the bm25/pmi convention), so the sum
    is order-independent and the DuckDB oracle pins prediction AND score.

    Output: (doc_id, pred_source, score_micro).

    Scale shape: training is ONE (source, token)-count shuffle bounded
    by |vocab| x |sources| (at 100 TB the vocab caps by document
    frequency, the same cutoff the TF-IDF family uses); the model
    broadcasts once via ray.put (the [V, S] micro-log matrix) and
    scoring is a zero-shuffle vectorized map (searchsorted + one
    scatter-add per batch).
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def count(t: pa.Table) -> pa.Table:
        import pandas as pd
        hasher = worker_token_hasher()
        offsets, tok = tokenize_column(t["text"], hasher)
        h60 = hasher.h60_array[tok]
        empty_id = hasher._idx.get("")
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            np.diff(offsets))
        if empty_id is not None:
            keep = tok != empty_id
            h60, doc_idx = h60[keep], doc_idx[keep]
        src = t["source"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": src[doc_idx], "h60": h60, "n": 1})
        agg = df.groupby(["source", "h60"], as_index=False,
                         sort=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    model = ds.map_batches(count, batch_format="pyarrow",
                           batch_size=4096) \
        .groupby(["source", "h60"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()                    # bounded: |vocab| x |sources|
    pri = ds.map_batches(
        lambda t: pa.table({"source": t["source"]}),
        batch_format="pyarrow") \
        .groupby("source").count().to_pandas()   # |sources| rows

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "pred_source": pa.array([], pa.string()),
                      "score_micro": pa.array([], pa.int64())})
    if not len(model):
        import ray.data as rd
        return rd.from_arrow(empty)

    sources = np.array(sorted(pri["source"]), dtype=object)
    s_idx = {s: i for i, s in enumerate(sources)}
    nd = pri.set_index("source")["count()"].astype(np.int64)
    ndocs = int(nd.sum())
    vocab = np.sort(model["h60"].unique().astype(np.int64))
    V = len(vocab)
    S = len(sources)
    cnt = np.zeros((V, S), np.int64)
    vi = np.searchsorted(vocab, model["h60"].to_numpy(np.int64))
    si = np.fromiter((s_idx[s] for s in model["source"]), np.int64,
                     len(model))
    cnt[vi, si] = model["n"].to_numpy(np.int64)
    tot = cnt.sum(axis=0)
    # micro-floored per-occurrence log-likelihoods, exactly the oracle's
    # FLOOR(1e6 * ln((c+1)/(tot_s + V)))
    L = np.floor(NB_MICRO * np.log(
        (cnt + 1).astype(np.float64) / (tot + V))).astype(np.int64)
    prior = np.floor(NB_MICRO * np.log(
        nd.loc[sources].to_numpy(np.float64) / ndocs)).astype(np.int64)
    mref = ray.put((vocab, L, prior, sources))

    class _Score:
        def __init__(self):
            self.vocab, self.L, self.prior, self.sources = ray.get(mref)
            self.hasher = worker_token_hasher()

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return empty
            offsets, tok = tokenize_column(t["text"], self.hasher)
            h60 = self.hasher.h60_array[tok]
            empty_id = self.hasher._idx.get("")
            doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                                np.diff(offsets))
            if empty_id is not None:
                keep = tok != empty_id
                h60, doc_idx = h60[keep], doc_idx[keep]
            rows = np.searchsorted(self.vocab, h60)
            scores = np.tile(self.prior, (n, 1))
            np.add.at(scores, doc_idx, self.L[rows])
            best = np.argmax(scores, axis=1)    # first max = source ASC
            return pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "pred_source": pa.array(self.sources[best], pa.string()),
                "score_micro": pa.array(
                    scores[np.arange(n), best], pa.int64())})

    return ds.map_batches(as_tasks(_Score), batch_format="pyarrow",
                          batch_size=4096)


def nb_confusion(sf_dir: str):
    """Classifier calibration report: the (true source x predicted
    source) confusion counts of nb_source_classify — the per-domain
    precision/leakage dashboard a filtering pipeline reviews before
    trusting the classifier.  Output: (source, pred_source, n), a
    |S|^2-bounded reduce."""
    from ray.data.aggregate import Count

    full = _nb_scored_with_source(sf_dir)
    agg = full.groupby(["source", "pred_source"]).aggregate(
        Count(alias_name="n"))
    return agg.map_batches(lambda t: pa.table({
        "source": t["source"], "pred_source": t["pred_source"],
        "n": pc.cast(t["n"], pa.int64())}), batch_format="pyarrow")


def bigram_lm_score(sf_dir: str):
    """Bigram LM perplexity scoring (KenLM-shape, one order above the
    CCNet-style unigram filter): train add-one-smoothed bigram
    probabilities on the corpus itself, then score every document by its
    summed/mean bigram log-probability — lp(w2|w1) =
    ln((c(w1,w2)+1)/(c(w1)+V)), milli-floored ints so distributed sums
    are exact and the oracle pins every value.

    Output: (doc_id, sum_lp, n_pairs, avg_lp) — docs with < 2 tokens
    carry zeros.

    Scale shape: ONE (w1, w2)-count shuffle bounded by the bigram
    vocabulary (at 100 TB the model caps by count cutoff, the standard
    LM pruning); the packed-key model broadcasts once; scoring is a
    zero-shuffle map (dense-id pack + searchsorted + scatter-add).
    """
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=("doc_id", "text"))

    def _doc_pairs(t: pa.Table, hasher):
        """(doc_idx, h1, h2) adjacent FILTERED-token pairs per doc."""
        offsets, tok = tokenize_column(t["text"], hasher)
        h60 = hasher.h60_array[tok]
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                            np.diff(offsets))
        empty_id = hasher._idx.get("")
        if empty_id is not None:
            keep = tok != empty_id
            h60, doc_idx = h60[keep], doc_idx[keep]
        if len(h60) < 2:
            z = np.empty(0, np.int64)
            return z, z, z, h60, doc_idx
        same = doc_idx[:-1] == doc_idx[1:]
        return (doc_idx[:-1][same], h60[:-1][same], h60[1:][same],
                h60, doc_idx)

    def count(t: pa.Table) -> pa.Table:
        import pandas as pd
        hasher = worker_token_hasher()
        _, h1, h2, _, _ = _doc_pairs(t, hasher)
        df = pd.DataFrame({"h1": h1, "h2": h2, "n": 1})
        agg = df.groupby(["h1", "h2"], as_index=False, sort=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    model = ds.map_batches(count, batch_format="pyarrow",
                           batch_size=4096) \
        .groupby(["h1", "h2"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()                  # bounded: bigram vocabulary

    def toks(t: pa.Table) -> pa.Table:
        import pandas as pd
        hasher = worker_token_hasher()
        _, _, _, h60, _ = _doc_pairs(t, hasher)
        return pa.Table.from_pandas(
            pd.DataFrame({"h60": np.unique(h60)}), preserve_index=False)

    n_vocab = ds.map_batches(toks, batch_format="pyarrow",
                             batch_size=4096) \
        .groupby("h60").count().count()          # distinct tokens

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "sum_lp": pa.array([], pa.int64()),
                      "n_pairs": pa.array([], pa.int64()),
                      "avg_lp": pa.array([], pa.int64())})
    if not len(model) or n_vocab == 0:
        def zeros(t: pa.Table) -> pa.Table:
            n = t.num_rows
            z = np.zeros(n, np.int64)
            return pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "sum_lp": pa.array(z), "n_pairs": pa.array(z),
                "avg_lp": pa.array(z)})
        return ds.map_batches(zeros, batch_format="pyarrow")

    h1 = model["h1"].to_numpy(np.int64)
    h2 = model["h2"].to_numpy(np.int64)
    bn = model["n"].to_numpy(np.int64)
    vocab_h = np.unique(np.concatenate([h1, h2]))
    Vd = len(vocab_h)
    id1 = np.searchsorted(vocab_h, h1)
    id2 = np.searchsorted(vocab_h, h2)
    pk = id1 * Vd + id2
    order = np.argsort(pk)
    pk, bn_s = pk[order], bn[order]
    ctx = np.zeros(Vd, np.int64)
    np.add.at(ctx, id1, bn)
    mref = ray.put((vocab_h, pk, bn_s, ctx, int(n_vocab)))

    class _Score:
        def __init__(self):
            (self.vocab_h, self.pk, self.bn, self.ctx,
             self.V) = ray.get(mref)
            self.hasher = worker_token_hasher()

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:
                return empty
            didx, h1, h2, _, _ = _doc_pairs(t, self.hasher)
            sums = np.zeros(n, np.int64)
            cnts = np.zeros(n, np.int64)
            if len(h1):
                i1 = np.searchsorted(self.vocab_h, h1)
                i2 = np.searchsorted(self.vocab_h, h2)
                key = i1 * len(self.vocab_h) + i2
                pos = np.searchsorted(self.pk, key)
                pos = np.minimum(pos, len(self.pk) - 1)
                c12 = np.where(self.pk[pos] == key, self.bn[pos], 0)
                lp = np.floor(np.log(
                    (c12 + 1).astype(np.float64)
                    / (self.ctx[i1] + self.V)) * 10000).astype(np.int64)
                np.add.at(sums, didx, lp)
                np.add.at(cnts, didx, 1)
            avg = np.zeros(n, np.int64)
            nz = cnts > 0
            avg[nz] = np.floor(sums[nz].astype(np.float64)
                               / cnts[nz]).astype(np.int64)
            return pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "sum_lp": pa.array(sums), "n_pairs": pa.array(cnts),
                "avg_lp": pa.array(avg)})

    return ds.map_batches(as_tasks(_Score), batch_format="pyarrow",
                          batch_size=4096)


CHUNK_ID_STRIDE = 4096       # cid = doc_id * STRIDE + chunk_idx


def chunk_near_dup(sf_dir: str, chunk: int = CHUNK_CHARS,
                   stride: int = CHUNK_STRIDE):
    """PASSAGE-level near-dup: every document chunk (the
    chunk_documents geometry) MinHash+LSH-flagged against every other
    chunk corpus-wide — the dedup granularity below the document (two
    long docs sharing one boilerplate passage are caught here and missed
    by whole-doc signatures).  Output: (doc_id, chunk_idx, is_dup).

    Scale shape: the chunk explode is the same zero-shuffle flat-buffer
    gather as chunk_documents; minhash_flags_for then moves only
    (band_key, cid) pairs.  cid = doc_id * 4096 + chunk_idx keeps the
    flag machinery int-keyed (chunk counts are bounded by doc length /
    stride, far under 4096).
    """
    from .dedup import minhash_flags_for

    def explode(t: pa.Table) -> pa.Table:
        doc_idx, starts_in_doc, _, _, bodies = \
            _chunk_explode_arrays(t["text"], chunk, stride)
        if not len(doc_idx):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        did = pc.cast(t["doc_id"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table({
            "doc_id": pa.array(did * CHUNK_ID_STRIDE + starts_in_doc),
            "text": bodies})

    chunks = _docs(sf_dir, columns=("doc_id", "text")).map_batches(
        explode, batch_format="pyarrow", batch_size=65536)

    def decode(t: pa.Table) -> pa.Table:
        cid = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(cid // CHUNK_ID_STRIDE, pa.int64()),
            "chunk_idx": pa.array(cid % CHUNK_ID_STRIDE, pa.int64()),
            "is_dup": t["is_dup"]})

    return minhash_flags_for(chunks).map_batches(
        decode, batch_format="pyarrow")


def corpus_report(sf_dir: str):
    """DATASET CARD: the one-row corpus summary a release ships —
    document/token/char volumes, language and source cardinalities,
    exact-duplicate rate in basis points, mean quality in basis points.
    Composes the existing streamed aggregates; each input streams once
    and only scalars reach the driver.

    Output: one row (n_docs, n_tokens, n_chars, n_langs, n_sources,
    dup_bp, mean_quality_bp)."""
    from .dedup import exact_dedup

    def vol(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        return pa.table({
            "n_docs": pa.array([t.num_rows], pa.int64()),
            "n_tokens": pa.array([len(toks)], pa.int64()),
            "n_chars": pa.array([int(pc.sum(
                pc.utf8_length(pc.replace_substring(
                    t["text"], " ", ""))).as_py() or 0)], pa.int64())})

    vols = _docs(sf_dir, columns=("text",)) \
        .map_batches(vol, batch_format="pyarrow", batch_size=262144) \
        .to_pandas()                       # O(blocks) scalar rows
    n_docs = int(vols["n_docs"].sum()) if "n_docs" in vols.columns else 0
    empty = pa.table({c: pa.array([], pa.int64()) for c in
                      ("n_docs", "n_tokens", "n_chars", "n_langs",
                       "n_sources", "dup_bp", "mean_quality_bp")})
    if n_docs == 0:
        return empty
    n_tokens = int(vols["n_tokens"].sum())
    n_chars = int(vols["n_chars"].sum())

    card = _docs(sf_dir, columns=("lang", "source")) \
        .map_batches(lambda t: pa.table({
            "lang": t["lang"], "source": t["source"]}),
            batch_format="pyarrow")
    n_langs = card.groupby("lang").count().count()
    n_sources = card.groupby("source").count().count()

    survivors = exact_dedup(sf_dir, hash_mode="md5").count()
    dup_bp = ((n_docs - survivors) * 10000) // n_docs

    q = text_quality(sf_dir).select_columns(["quality_q"]) \
        .map_batches(lambda t: pa.table({
            "s": pa.array([int(pc.sum(t["quality_q"]).as_py() or 0)],
                          pa.int64())}), batch_format="pyarrow") \
        .to_pandas()
    mean_q = int(q["s"].sum()) // n_docs

    return pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_tokens": pa.array([n_tokens], pa.int64()),
        "n_chars": pa.array([n_chars], pa.int64()),
        "n_langs": pa.array([int(n_langs)], pa.int64()),
        "n_sources": pa.array([int(n_sources)], pa.int64()),
        "dup_bp": pa.array([dup_bp], pa.int64()),
        "mean_quality_bp": pa.array([mean_q], pa.int64())})


ZIPF_BUCKETS = ((1, 10), (11, 100), (101, 1000))


def token_zipf_profile(sf_dir: str):
    """Zipf HEAD/TAIL profile of the corpus token distribution — the
    heavy-tail diagnostic a dataset card ships next to vocab coverage:
    how much of the token mass the rank-1..10, 11..100, 101..1000 heads
    carry versus the long tail.  All-integer (share in basis points via
    integer division), so the oracle pins every cell with zero float
    risk — unlike a log-log slope fit, whose ln() quantization differs
    across engines.

    Output: one row per bucket — (bucket, lo_rank, hi_rank, n_types,
    n_occ, share_bp); bucket 3 is the tail (rank > 1000, hi_rank =
    total type count).  Ranking ties break by token text ascending.

    Scale shape: per-batch value_counts combiner -> ONE token-keyed
    groupby sum (the only shuffle); the global top-1000 comes from
    per-block top-1000 partials merged on the driver (bounded:
    n_blocks x 1000 rows), and the totals from a per-block (types,
    occurrences) scalar reduce — the token table itself never leaves
    the cluster.
    """
    from ray.data.aggregate import Sum

    top_n = ZIPF_BUCKETS[-1][1]

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(t["text"], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        return pa.table({"token": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    counts = _docs(sf_dir, columns=("text",)) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=262144) \
        .groupby("token").aggregate(Sum("cnt", alias_name="n")) \
        .materialize()

    def block_top(t: pa.Table) -> pa.Table:
        df = pa.table({"token": t["token"],
                       "n": pc.cast(t["n"], pa.int64())}).to_pandas()
        df = df.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").head(top_n)
        return pa.Table.from_pandas(df, preserve_index=False)

    def block_tot(t: pa.Table) -> pa.Table:
        return pa.table({
            "types": pa.array([t.num_rows], pa.int64()),
            "occ": pa.array([int(pc.sum(t["n"]).as_py() or 0)],
                            pa.int64())})

    top = counts.map_batches(block_top, batch_format="pyarrow") \
        .to_pandas()
    tot = counts.map_batches(block_tot, batch_format="pyarrow") \
        .to_pandas()
    if "n" in top.columns:
        top = top.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").head(top_n)
        head_n = top["n"].to_numpy(np.int64)
    else:                                   # empty corpus: no batches
        head_n = np.empty(0, np.int64)
    n_types = int(tot["types"].sum()) if "types" in tot.columns else 0
    n_occ = int(tot["occ"].sum()) if "occ" in tot.columns else 0
    rows = []
    for b, (lo, hi) in enumerate(ZIPF_BUCKETS):
        seg = head_n[lo - 1:hi]
        rows.append((b, lo, hi, len(seg), int(seg.sum())))
    tail_occ = n_occ - int(head_n.sum())
    rows.append((len(ZIPF_BUCKETS), top_n + 1, n_types,
                 max(n_types - len(head_n), 0), tail_occ))
    return pa.table({
        "bucket": pa.array([r[0] for r in rows], pa.int64()),
        "lo_rank": pa.array([r[1] for r in rows], pa.int64()),
        "hi_rank": pa.array([r[2] for r in rows], pa.int64()),
        "n_types": pa.array([r[3] for r in rows], pa.int64()),
        "n_occ": pa.array([r[4] for r in rows], pa.int64()),
        "share_bp": pa.array(
            [(r[4] * 10000) // n_occ if n_occ else 0 for r in rows],
            pa.int64())})


def chunk_retrieval_topk(sf_dir: str, nq: int = HASH_EMBED_NQ,
                         k: int = HASH_EMBED_K, d: int = HASH_EMBED_D,
                         chunk: int = CHUNK_CHARS,
                         stride: int = CHUNK_STRIDE):
    """PASSAGE retrieval composite (the RAG indexing shape end to end):
    codepoint-exact chunk explode -> md5-bridge hash embed per CHUNK ->
    integer-dot top-k passages per query document (whole-doc embeddings
    of doc_id < nq), chunks of the query's own document excluded.
    Integer scores + (dot DESC, doc_id ASC, chunk_idx ASC) ties make
    rank AND score oracle-exact.

    Output: (query_id, doc_id, chunk_idx, rnk, dot).

    Scale shape: chunk+embed is ONE zero-shuffle map (the
    _chunk_explode_arrays gather + the hashing-trick scatter); the
    [nq, d] query matrix broadcasts once via ray.put; each batch emits
    its LOCAL top-k per query, so the final groupby(query_id) combine
    sees O(num_batches * nq * k) candidate rows and the chunk corpus
    never shuffles.  Chunks with no tokens carry no feature mass and
    are excluded (exactly the oracle's feature-spine membership).
    """
    import pandas as pd
    import pyarrow.parquet as pq_
    import ray

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "chunk_idx": pa.array([], pa.int64()),
                      "rnk": pa.array([], pa.int64()),
                      "dot": pa.array([], pa.int64())})
    qt = pq_.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"],
                        filters=[("doc_id", "<", nq)])
    qids, qv, qocc = HashEmbedStage(d=d).dense(qt)
    live_q = qocc.sum(axis=1) > 0      # token-less queries have no
    qids, qv = qids[live_q], qv[live_q]   # oracle feature rows
    if not len(qids):
        return ray.data.from_arrow(empty)
    q_ref = ray.put((qids, np.ascontiguousarray(qv)))

    class _Scan:
        def __init__(self):
            self.stage = HashEmbedStage(d=d)
            self.qids, self.qv = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            doc_idx, sid, _, _, bodies = _chunk_explode_arrays(
                t["text"], chunk, stride)
            out0 = pa.table({"query_id": pa.array([], pa.int64()),
                             "cid": pa.array([], pa.int64()),
                             "dot": pa.array([], pa.int64())})
            if not len(doc_idx):
                return out0
            did = pc.cast(t["doc_id"], pa.int64()) \
                .to_numpy(zero_copy_only=False)[doc_idx]
            cids = did * CHUNK_ID_STRIDE + sid
            vecs, occ = hash_embed_texts(bodies, self.stage.hasher, d)
            live = occ.sum(axis=1) > 0          # drop token-less chunks
            cids, vecs, did = cids[live], vecs[live], did[live]
            if not len(cids):
                return out0
            dots = vecs @ self.qv.T             # [B, nq] int64 exact
            out_q, out_c, out_d = [], [], []
            for j, qid in enumerate(self.qids):
                keep = did != qid               # own-doc chunks excluded
                cc, s = cids[keep], dots[keep, j]
                if not len(cc):
                    continue
                kk = min(k, len(cc))
                order = np.lexsort((cc, -s))[:kk]
                out_q.append(np.full(kk, qid, np.int64))
                out_c.append(cc[order])
                out_d.append(s[order])
            if not out_q:
                return out0
            return pa.table({"query_id": np.concatenate(out_q),
                             "cid": np.concatenate(out_c),
                             "dot": np.concatenate(out_d)})

    cand = _docs(sf_dir, columns=("doc_id", "text")).map_batches(
        as_tasks(_Scan), batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dot", "cid"],
                          ascending=[False, True]).head(k)
        cid = g["cid"].to_numpy(np.int64)
        return pd.DataFrame({
            "query_id": g["query_id"].to_numpy(),
            "doc_id": cid // CHUNK_ID_STRIDE,
            "chunk_idx": cid % CHUNK_ID_STRIDE,
            "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
            "dot": g["dot"].to_numpy()})

    return cand.groupby("query_id").map_groups(combine,
                                               batch_format="pandas")


WINNOW_K = 8                  # k-gram length (chars)
WINNOW_W = 4                  # winnowing window (grams)
_WINNOW_B = 1_000_003         # rolling-hash base (fast mode)
_WINNOW_P = (1 << 31) - 1     # Mersenne modulus (fast mode); small
#                               enough that hv*B + cp stays inside
#                               int64 (2^31 * 2^20 + 2^21 << 2^63) —
#                               the vectorized recurrence is then the
#                               EXACT polynomial mod P, no silent
#                               int64 wraparound


def winnow_fingerprints(sf_dir: str, k: int = WINNOW_K,
                        w: int = WINNOW_W, hash_mode: str = "fast"):
    """Winnowing DOCUMENT FINGERPRINTS (Schleimer, Wilkerson, Aiken —
    the MOSS scheme): hash every character k-gram, slide a window of
    ``w`` grams, keep the RIGHTMOST minimum of each window, emit the
    distinct (position, fingerprint) pairs.  The guarantee: every
    shared substring of length >= k + w - 1 yields at least one shared
    fingerprint — the local-dedup / plagiarism primitive between
    whole-doc hashing (too coarse) and all-grams (too big).

    Output: (doc_id, pos, fp) — pos = gram start (codepoints), fp =
    int60/int61 gram hash.  Docs shorter than k + w - 1 chars emit
    nothing (no complete window).

    ``hash_mode='fast'`` (production): true ROLLING polynomial hash —
    one vectorized pass builds every gram hash over the batch's flat
    codepoint array (k shifted multiply-adds mod 2^61-1), window
    minima via a stride-view min, rightmost tie via reversed argmin;
    no per-gram Python.  ``'md5'``: per-distinct-gram md5 int60 (the
    SQL-oracle bridge, worker-cached), same selection rule.

    Scale shape: pure zero-shuffle map (like chunk_documents); the
    fingerprint set is ~2/(w+1) of gram count, streamed out per batch.
    """
    def select(hv: np.ndarray) -> np.ndarray:
        """Positions of winnowed fingerprints for ONE doc's gram-hash
        array (len g >= w): rightmost min per window, deduped."""
        g = len(hv)
        swv = np.lib.stride_tricks.sliding_window_view(hv, w)
        # rightmost min: argmin of the REVERSED window
        j_right = w - 1 - np.argmin(swv[:, ::-1], axis=1)
        pos = np.unique(np.arange(g - w + 1) + j_right)
        return pos

    def fp_batch(t: pa.Table) -> pa.Table:
        out_d, out_p, out_f = [], [], []
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        cache: dict = {}
        for did, s in zip(ids, texts):
            n = len(s)
            if n < k + w - 1:
                continue
            if hash_mode == "md5":
                hv = np.empty(n - k + 1, np.int64)
                for i in range(n - k + 1):
                    gram = s[i:i + k]
                    h = cache.get(gram)
                    if h is None:
                        h = int(hashlib.md5(
                            gram.encode()).hexdigest()[:15], 16)
                        cache[gram] = h
                    hv[i] = h
            else:
                cp = np.frombuffer(s.encode("utf-32-le"),
                                   np.uint32).astype(np.int64)
                hv = np.zeros(n - k + 1, np.int64)
                for j in range(k):
                    hv = (hv * _WINNOW_B
                          + cp[j:j + n - k + 1]) % _WINNOW_P
            pos = select(hv)
            out_d.append(np.full(len(pos), did, np.int64))
            out_p.append(pos.astype(np.int64))
            out_f.append(hv[pos])
        if not out_d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(out_d)),
                         "pos": pa.array(np.concatenate(out_p)),
                         "fp": pa.array(np.concatenate(out_f))})

    return _docs(sf_dir, columns=("doc_id", "text")).map_batches(
        fp_batch, batch_format="pyarrow", batch_size=4096)
