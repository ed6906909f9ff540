"""Page-table → document-table assembly.

The page-table variant stores one row per page (SURVEY.md §1.2,
FIXTURES.md table 2): ``(url, warc_ts, page_idx, page_json, lang)``,
shuffled on disk. Reassembly is the engine's one real shuffle:
``groupby("url")`` co-locates a document's pages, an in-group sort on
``page_idx`` restores reading order (page order is array-position
semantics in the reference, README.md:115-119), and the group collapses
to a single document row ready for the extraction stage.

Partitioning assumption: one document's pages fit comfortably in one
group (documents are bounded; multi-GB single documents would need the
key salted by page-range with a second-stage merge).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc


def assemble_document(group: pa.Table) -> pa.Table:
    """One group = all pages of one url → one document row."""
    order = pc.sort_indices(group.column("page_idx"))
    group = group.take(order)
    pages = []
    fonts = None
    for blob in group.column("page_json"):
        payload = json.loads(blob.as_py().decode())
        pages.append(payload["page"])
        if fonts is None:
            fonts = payload.get("fonts", [])
    layout = {"pages": pages, "fonts": fonts or []}
    return pa.table(
        {
            "url": group.column("url").slice(0, 1),
            "warc_ts": group.column("warc_ts").slice(0, 1),
            "html": pa.array([json.dumps(layout, ensure_ascii=False).encode()],
                             pa.binary()),
            "text": pa.array([""], pa.string()),
            "lang": group.column("lang").slice(0, 1),
        }
    )


def assemble_pages_dataset(ds):
    """``Dataset`` of exploded page rows → ``Dataset`` of document rows
    (the input_hint schema)."""
    return ds.groupby("url").map_groups(assemble_document, batch_format="pyarrow")
