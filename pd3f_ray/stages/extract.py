"""The extraction stage: an actor-pool ``map_batches`` callable.

One actor == one long-lived worker process holding the scorer state
(with a real LM this is where weights load once; with the deterministic
scorer it holds the per-process score LRU). Batches arrive as zero-copy
Arrow tables; rows are independent documents, so the stage is
embarrassingly parallel and the batch loop only amortizes Python
dispatch. Replaces the reference's single-process, one-document-at-a-
time driver (/root/reference/pd3f/export.py:30-103) with a streaming,
horizontally scalable stage.
"""

from __future__ import annotations

import pyarrow as pa

from pd3f_ray.core.config import ExtractOptions
from pd3f_ray.core.kernel import extract_record
from pd3f_ray.core.scorer import get_scorer

# output schema of the extraction stage — large_string for text so very
# wide documents can't overflow 32-bit string offsets in a block
EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.large_string()),
        ("n_pages", pa.int32()),
        ("n_elements", pa.int32()),
        ("n_chars", pa.int64()),
        ("payload_bytes", pa.int64()),
        ("error", pa.string()),
    ]
)


class ExtractDocs:
    """Callable class for ``ds.map_batches(ExtractDocs(opts),
    batch_format="pyarrow", concurrency=N)``. Scorer state is built once
    per actor (in practice: on first use per language, cached in the
    worker process)."""

    def __init__(self, opts: ExtractOptions | None = None):
        self.opts = opts or ExtractOptions.experimental()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        tss = batch.column("warc_ts")
        htmls = batch.column("html")
        langs = batch.column("lang")

        texts: list[str | None] = []
        errors: list[str | None] = []
        n_pages: list[int] = []
        n_elements: list[int] = []
        n_chars: list[int] = []
        payload: list[int] = []

        base = self.opts
        for i in range(batch.num_rows):
            lang = langs[i].as_py()
            html = htmls[i].as_py()
            opts = base if base.lang == lang else base.with_(lang=lang)
            rec = extract_record(html, opts, scorer=get_scorer(lang))
            texts.append(rec["text"])
            errors.append(rec["error"])
            n_pages.append(rec["n_pages"])
            n_elements.append(rec["n_elements"])
            n_chars.append(len(rec["text"]) if rec["text"] is not None else 0)
            payload.append(len(html))

        return pa.table(
            {
                "url": urls,
                "warc_ts": tss,
                "lang": langs,
                "text": pa.array(texts, pa.large_string()),
                "n_pages": pa.array(n_pages, pa.int32()),
                "n_elements": pa.array(n_elements, pa.int32()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "payload_bytes": pa.array(payload, pa.int64()),
                "error": pa.array(errors, pa.string()),
            },
            schema=EXTRACT_SCHEMA,
        )
