"""Training-data chunking and tokenization over the ``documents`` table.

Two of the last steps of an LLM-data pipeline before examples leave the
engine:

- ``chunk_docs`` — fixed-size character windows with overlap (the
  context-window carving step). Map-only, exchange-free: output volume
  is size/stride × corpus, streamed block by block.
- ``tokenize_docs`` — encode every document against a corpus-level
  top-V vocabulary (the classic "hash the corpus once, broadcast the
  vocab, encode map-side" plan standing in for a learned BPE merge
  table). The vocabulary is built with the same per-block top-k partial
  plan as ``textstats.top_tokens`` (one token-keyed exchange over
  per-(block, token) partial counts, never raw occurrences), fetched
  block-wise to the driver (V rows — the justified small side) and
  ``ray.put`` ONCE; encoding is a stateless map.

Both are oracle-exact: chunk boundaries replicate DuckDB
``substring``/``generate_series`` semantics (character-based, 1-indexed)
and token ids replicate a ``row_number() OVER (ORDER BY n DESC, token)``
vocabulary with positional ``string_agg`` encoding.

Reference parity note: the reference (pd3f-core) has no chunking or
tokenization — these belong to the engine-level training-data op
families (SURVEY.md §8).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

CHUNK_SIZE = 512
CHUNK_STRIDE = 384  # 128-char overlap between consecutive chunks
VOCAB_SIZE = 256


def _docs(sf_dir: str, columns):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def chunk_docs(sf_dir: str, size: int = CHUNK_SIZE,
               stride: int = CHUNK_STRIDE):
    """Overlapping character windows: chunk ``i`` of a document covers
    ``[i*stride, i*stride + size)``; chunks are emitted while their
    start is inside the text, so every character lands in at least one
    chunk and consecutive chunks overlap by ``size - stride``. Output
    (doc_id, chunk_idx, chunk_text, n_chunk_chars).

    Python slicing and DuckDB ``substring`` agree on code-point
    semantics, so the oracle is exact. Scale: pure ``map_batches``, no
    exchange; a block's output is at most ``size/stride`` × its input
    characters, so block-size caps hold."""

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        n_chunks = np.array([(len(t) - 1) // stride + 1 if t else 0
                             for t in texts], np.int64)
        out_ids = np.repeat(ids, n_chunks)
        out_idx = np.concatenate(
            [np.arange(n) for n in n_chunks]) if len(texts) else \
            np.array([], np.int64)
        out_txt = [t[i * stride: i * stride + size]
                   for t, n in zip(texts, n_chunks) for i in range(n)]
        return pa.table({
            "doc_id": pa.array(out_ids, pa.int64()),
            "chunk_idx": pa.array(out_idx, pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string()),
            "n_chunk_chars": pa.array([len(c) for c in out_txt], pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk, batch_format="pyarrow")


def chunk_docs_sql(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    return f"""
SELECT doc_id,
       i AS chunk_idx,
       substring(text, i * {stride} + 1, {size}) AS chunk_text,
       length(substring(text, i * {stride} + 1, {size})) AS n_chunk_chars
FROM documents,
     unnest(generate_series(
         0, CAST(floor((n_chars - 1) / {stride}) AS BIGINT))) t(i)
WHERE n_chars > 0
"""


# ---------------------------------------------------------------------------
# vocabulary encoding
# ---------------------------------------------------------------------------


def _top_vocab(sf_dir: str, v: int):
    """Top-``v`` corpus tokens as an id map {token: 0..v-1}, ordered
    (count desc, token asc) — the ``top_tokens`` per-block-partial plan,
    resolved to a v-row table and fetched block-wise."""
    from pd3f_ray.pipelines.textstats import top_tokens

    vocab_ds = top_tokens(sf_dir, k=v)
    blocks = ray.get(vocab_ds.to_arrow_refs())  # v rows — tiny
    tbl = pa.concat_tables([b for b in blocks if b.num_rows],
                           promote_options="default")
    # the dataset is already sorted (n desc, token asc); re-apply the
    # order across concatenated blocks for safety
    import pyarrow.compute as pc

    order = pc.sort_indices(tbl, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
    toks = tbl.take(order).column("token").to_pylist()
    return {t: i for i, t in enumerate(toks)}


def tokenize_docs(sf_dir: str, v: int = VOCAB_SIZE):
    """Encode each document as the id sequence of its in-vocabulary
    whitespace tokens (out-of-vocabulary tokens dropped), ids assigned
    by corpus frequency rank (count desc, token asc — deterministic at
    the v-boundary ties). Output (doc_id, ids = comma-joined id string,
    n_ids); ids travel as a string so both engines emit one flat,
    hash-comparable column.

    Plan: one token-keyed exchange builds the vocab (per-block partial
    counts → per-block top-k → tiny resolve), the v-row id map is
    broadcast via ``ray.put`` once, and encoding is a stateless
    ``map_batches`` — the corpus never shuffles."""
    vocab_ref = ray.put(_top_vocab(sf_dir, v))

    def encode(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        ids_out, n_out = [], []
        for t in batch.column("text").to_pylist():
            enc = [vocab[w] for w in t.split(" ") if w in vocab]
            ids_out.append(",".join(map(str, enc)))
            n_out.append(len(enc))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "ids": pa.array(ids_out, pa.string()),
            "n_ids": pa.array(n_out, pa.int64()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow")


def tokenize_docs_sql(v: int = VOCAB_SIZE) -> str:
    return f"""
WITH counts AS (
  SELECT token, count(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token != ''
  GROUP BY token
),
vocab AS (
  SELECT token,
         row_number() OVER (ORDER BY n DESC, token ASC) - 1 AS tid
  FROM counts
  ORDER BY n DESC, token ASC
  LIMIT {v}
),
toks AS (
  SELECT d.doc_id, t.i,
         list_extract(string_split(d.text, ' '), CAST(t.i AS INTEGER))
             AS token
  FROM documents d,
       unnest(generate_series(1, len(string_split(d.text, ' ')))) t(i)
)
SELECT t.doc_id,
       COALESCE(string_agg(CAST(v.tid AS VARCHAR), ',' ORDER BY t.i), '')
           AS ids,
       CAST(count(v.tid) AS BIGINT) AS n_ids
FROM toks t LEFT JOIN vocab v USING (token)
GROUP BY t.doc_id
"""
