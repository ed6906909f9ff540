"""Composed training-data curation pipeline — the end-to-end shape a
100 TB corpus actually runs: quality gate → exact dedup → deterministic
sample, as ONE streaming Ray Data pipeline, oracle-checked end-to-end.

Stages (all over the ``documents`` table so DuckDB can replay them):
1. quality gate — vectorized per-batch predicate (min tokens, min
   distinct-token ratio);
2. exact dedup — md5(text) digest per row (the shuffle moves 32-byte
   digests + ids, never text), groupby digest keeping the smallest
   doc_id;
3. deterministic sample — md5 first-hex-digit buckets (50%);
4. re-attach metadata — the kept-id set is a broadcast filter over a
   second streaming pass (ids are the small side; text never travels).

At corpus scale the only exchange is the dedup groupby on digests;
everything else is map-side.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Min

from pd3f_ray.functions.textfns import md5_hex

MIN_TOKENS = 20
MIN_DISTINCT_RATIO = 0.3
SAMPLE_HEX = ("0", "1", "2", "3", "4", "5", "6", "7")  # 50%


def _docs(sf_dir: str, columns):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def curate_docs(sf_dir: str):
    """Documents surviving quality gate → exact dedup → 50% hash sample.
    Output (doc_id, lang, n_chars, n_tokens), oracle-checked."""

    def digest_quality(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_id, out_hash = [], []
        for did, t in zip(ids, texts):
            toks = [w for w in t.split(" ") if w]
            if len(toks) < MIN_TOKENS:
                continue
            if len(set(toks)) / len(toks) < MIN_DISTINCT_RATIO:
                continue
            h = md5_hex(t)
            if h[0] not in SAMPLE_HEX:
                continue
            out_id.append(did)
            out_hash.append(h)
        return pa.table(
            {
                "text_hash": pa.array(out_hash, pa.string()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )

    kept = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(digest_quality, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    keep_ids = {r["doc_id"] for r in kept.take_all()}  # ids only — small
    keep_ref = ray.put(keep_ids)

    def attach(batch: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        ids = batch.column("doc_id").to_pylist()
        mask = pa.array([i in keep for i in ids], pa.bool_())
        f = batch.filter(mask)
        texts = f.column("text").to_pylist()
        n_tokens = pa.array(
            [len([w for w in t.split(" ") if w]) for t in texts], pa.int64()
        )
        return pa.table(
            {
                "doc_id": f.column("doc_id"),
                "lang": f.column("lang"),
                "n_chars": f.column("n_chars"),
                "n_tokens": n_tokens,
            }
        )

    return _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"]).map_batches(
        attach, batch_format="pyarrow"
    )


CURATE_DOCS_SQL = f"""
WITH q AS (
  SELECT doc_id, lang, n_chars, text,
         len(list_filter(string_split(text, ' '), x -> x != ''))
             AS n_tokens,
         md5(text) AS text_hash
  FROM documents
),
g AS (
  SELECT *
  FROM q
  WHERE n_tokens >= {MIN_TOKENS}
    AND CAST(len(list_distinct(list_filter(string_split(text, ' '),
                                           x -> x != ''))) AS DOUBLE)
        / n_tokens >= {MIN_DISTINCT_RATIO}
    AND substring(text_hash, 1, 1) IN {SAMPLE_HEX!r}
),
d AS (
  SELECT *, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id)
            AS rn
  FROM g
)
SELECT doc_id, lang, n_chars, CAST(n_tokens AS BIGINT) AS n_tokens
FROM d WHERE rn = 1
"""
