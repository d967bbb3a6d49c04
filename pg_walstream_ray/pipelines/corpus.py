"""Fused corpus-cleaning pipeline — the composed training-data flagship:
quality scoring + language ID + content fingerprinting in ONE actor pass,
then quality/lang filters, then exact dedup in ONE grouped reduction.

This is the shape a 100 TB cleaning job wants: a single scan computes all
per-document features (no re-reads per operator), filters prune before the
shuffle, and the only exchange is the (hash -> keeper) reduction over
(hash, doc_id) pairs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (worker_token_hasher,
                                 TokenHasher, content_hash60,
                                 distinct_doc_tokens,
                                 md5_int60, tokenize_column)
from ..functions.scale import coarse_npart
from ..stages.taskmode import as_tasks
from .textops import LANG_ORDER, STOPWORDS

QUALITY_MIN_Q = 5500          # basis points (mirrored in the oracle)
KEEP_LANG = "en"


class CorpusFeatureStage:
    """One pass: (doc_id, text) -> quality_q, pred_lang, content hash.
    ``hash_mode``: 'fast' = vectorized xxhash (default), 'md5' = SQL-oracle
    bridge (functions/hashing.content_hash60)."""

    def __init__(self, hash_mode: str = "fast"):
        self.hasher = worker_token_hasher()
        self.hash_mode = hash_mode
        self.stop_h60 = {lang: np.array(sorted(md5_int60(w) for w in ws),
                                        dtype=np.int64)
                         for lang, ws in STOPWORDS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        split = pc.split_pattern(text, " ")
        n_tokens = pc.list_value_length(split).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_chars = pc.utf8_length(pc.replace_substring(text, " ", "")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        offsets, tok = tokenize_column(text, self.hasher)
        n_distinct, u_doc, u_tok = distinct_doc_tokens(offsets, tok)

        nt = n_tokens.astype(np.float64)
        quality = (0.4 * np.minimum(1.0, nt / 100.0)
                   + 0.3 * (n_distinct / nt)
                   + 0.3 * np.minimum(1.0, (n_chars / nt) / 8.0))
        quality_q = np.floor(quality * 10000).astype(np.int64)

        h60 = self.hasher.h60_array[u_tok]
        n = t.num_rows
        hits = np.stack([
            np.bincount(u_doc[np.isin(h60, self.stop_h60[lang])],
                        minlength=n) for lang in LANG_ORDER])
        pred = np.array(LANG_ORDER, dtype=object)[np.argmax(hits, axis=0)]

        content_h = content_hash60(text, self.hash_mode)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "quality_q": pa.array(quality_q),
            "pred_lang": pa.array(pred, pa.string()),
            "h": pa.array(content_h),
        })


def corpus_clean(sf_dir: str, min_quality_q: int = QUALITY_MIN_Q,
                 lang: str = KEEP_LANG, concurrency: int = 4,
                 hash_mode: str = "fast"):
    """Kept documents after quality + language filters and exact dedup.
    Output: (doc_id, n_tokens, quality_q)."""
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    feat = ds.map_batches(as_tasks(CorpusFeatureStage, hash_mode=hash_mode),
                          batch_format="pyarrow", batch_size=4096)
    npart = coarse_npart()

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["quality_q"], min_quality_q),
                    pc.equal(t["pred_lang"], lang))
        kept = t.filter(m)
        part = kept["h"].to_numpy(zero_copy_only=False) % npart
        return kept.append_column("part", pa.array(part))

    filtered = feat.map_batches(keep, batch_format="pyarrow")

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        keepers = g.sort_values("doc_id").groupby("h", as_index=False).first()
        return keepers[["doc_id", "n_tokens", "quality_q"]].astype(np.int64)

    return filtered.groupby("part").map_groups(dedup_part,
                                               batch_format="pandas")
