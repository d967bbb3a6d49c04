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


AUDIT_VERDICTS = ("kept", "duplicate", "low_quality", "wrong_lang")


class AuditFeatureStage(CorpusFeatureStage):
    """CorpusFeatureStage + source passthrough (same single scan)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        out = super().__call__(t)
        return out.append_column("source", t["source"])


def corpus_filter_audit(sf_dir: str, min_quality_q: int = QUALITY_MIN_Q,
                        lang: str = KEEP_LANG, hash_mode: str = "fast"):
    """Filter-audit companion to corpus_clean — the observability surface
    a production cleaning job needs: per (source, verdict) document and
    token counts, where verdict is the FIRST filter that rejected the doc
    ('low_quality' then 'wrong_lang', mirroring corpus_clean's filter
    order) or 'duplicate' / 'kept' from the exact-dedup keeper rule
    (min doc_id per content hash among filter survivors).  A sudden
    verdict-mix shift per source is the data-quality alarm.

    Output: (source, verdict, n_docs, tok_total).

    Scale shape: ONE feature scan (same fused stage as corpus_clean);
    quality/lang rejections collapse to per-batch (source, verdict)
    partial counts that never shuffle; only survivor (source, h, doc_id,
    n_tokens) tuples take the hash exchange — text never moves — and the
    final groupby is bounded by |sources| x |verdicts| rows.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])
    feat = ds.map_batches(as_tasks(AuditFeatureStage, hash_mode=hash_mode),
                          batch_format="pyarrow", batch_size=4096)
    npart = coarse_npart()

    def classify(t: pa.Table) -> pa.Table:
        lowq = pc.less(t["quality_q"], min_quality_q).to_numpy(
            zero_copy_only=False)
        wrong = ~lowq & pc.not_equal(t["pred_lang"], lang).to_numpy(
            zero_copy_only=False)
        surv = ~lowq & ~wrong
        src = t["source"].to_numpy(zero_copy_only=False)
        ntok = t["n_tokens"].to_numpy(zero_copy_only=False)
        parts = []
        # rejected docs: per-batch (source, verdict) partials, no shuffle
        for verdict, m in (("low_quality", lowq), ("wrong_lang", wrong)):
            if m.any():
                d = pd.DataFrame({"source": src[m], "tok": ntok[m]})
                g = d.groupby("source", as_index=False).agg(
                    n_docs=("tok", "size"), tok=("tok", "sum"))
                parts.append(pa.table({
                    "part": pa.array(np.zeros(len(g), np.int64)),
                    "source": pa.array(g["source"], pa.string()),
                    "verdict": pa.array([verdict] * len(g), pa.string()),
                    "h": pa.array(np.full(len(g), -1, np.int64)),
                    "doc_id": pa.array(np.full(len(g), -1, np.int64)),
                    "n_docs": pa.array(g["n_docs"].to_numpy(np.int64)),
                    "tok": pa.array(g["tok"].to_numpy(np.int64))}))
        if surv.any():
            h = t["h"].to_numpy(zero_copy_only=False)[surv]
            parts.append(pa.table({
                "part": pa.array(h % npart),
                "source": pa.array(src[surv], pa.string()),
                "verdict": pa.array([""] * int(surv.sum()), pa.string()),
                "h": pa.array(h),
                "doc_id": pa.array(t["doc_id"].to_numpy(
                    zero_copy_only=False)[surv].astype(np.int64)),
                "n_docs": pa.array(np.ones(int(surv.sum()), np.int64)),
                "tok": pa.array(ntok[surv].astype(np.int64))}))
        if not parts:
            return pa.table({
                "part": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "verdict": pa.array([], pa.string()),
                "h": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
                "tok": pa.array([], pa.int64())})
        return pa.concat_tables(parts)

    def audit_part(g: pd.DataFrame) -> pd.DataFrame:
        out = [g[g["verdict"] != ""][["source", "verdict",
                                      "n_docs", "tok"]]]
        s = g[g["verdict"] == ""]
        if len(s):
            s = s.sort_values("doc_id", kind="mergesort")
            is_kept = ~s.duplicated("h", keep="first")
            s = s.assign(verdict=np.where(is_kept, "kept", "duplicate"))
            out.append(s.groupby(["source", "verdict"], as_index=False)
                       .agg(n_docs=("n_docs", "sum"), tok=("tok", "sum")))
        return pd.concat(out, ignore_index=True)

    return (feat.map_batches(classify, batch_format="pyarrow")
            .groupby("part").map_groups(audit_part, batch_format="pandas")
            .groupby(["source", "verdict"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("tok", alias_name="tok_total")))
