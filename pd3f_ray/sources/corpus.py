"""On-demand, disk-cached synthetic corpora keyed by scale factor.

The driver's testdata (/root/testdata/sf*) has no layout-document table,
so the extraction corpus (BASELINE.json input_hint shape) is synthesized
deterministically — in parallel with Ray Data itself (a ``range`` →
``map_batches`` generator pipeline) — and cached under /tmp keyed by
scale name + seed. Generation happens once; benches and queries then
read the cached parquet like any other input.

Doc-count rule: ``n_docs = 2_000_000 × sf`` (sf0.001 → 2k, sf0.01 → 20k,
sf0.1 → 200k), sized so the sf0.1 bench runs long enough to measure
scaling honestly.
"""

from __future__ import annotations

import json
import os
import re
import shutil

SEED = 42
CACHE_ROOT = os.environ.get("PD3F_RAY_CACHE", "/tmp/pd3f_ray_corpus")


def sf_name(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base else "sf0.01"


def n_docs_for(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_name(sf_dir))
    sf = float(m.group(1)) if m else 0.01
    return max(100, int(2_000_000 * sf))


def _gen_doc_batch(batch):
    """range-id batch → corpus rows (deterministic per id)."""
    import pyarrow as pa

    from pd3f_ray.sources.synth import _LANGS, BASE_TS, build_layout, doc_url

    ids = batch["id"].to_pylist()
    urls, tss, htmls, langs = [], [], [], []
    for i in ids:
        layout, _ = build_layout(i, SEED)
        urls.append(doc_url(i))
        tss.append(BASE_TS + i * 1_000_000)
        htmls.append(json.dumps(layout, ensure_ascii=False).encode())
        langs.append(_LANGS[i % len(_LANGS)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([""] * len(ids), pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def _gen_page_batch(batch):
    """range-id batch → exploded page rows."""
    import pyarrow as pa

    from pd3f_ray.sources.synth import _LANGS, BASE_TS, build_layout, doc_url

    ids = batch["id"].to_pylist()
    urls, tss, idxs, blobs, langs = [], [], [], [], []
    for i in ids:
        layout, _ = build_layout(i, SEED)
        for p_idx, page in enumerate(layout["pages"]):
            payload = {"page": page, "fonts": layout["fonts"]}
            if p_idx == 0 and layout.get("tables"):
                payload["tables"] = layout["tables"]
            urls.append(doc_url(i))
            tss.append(BASE_TS + i * 1_000_000)
            idxs.append(p_idx)
            blobs.append(json.dumps(payload, ensure_ascii=False).encode())
            langs.append(_LANGS[i % len(_LANGS)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "page_idx": pa.array(idxs, pa.int32()),
            "page_json": pa.array(blobs, pa.binary()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def ensure_corpus(sf_dir: str, kind: str = "docs", n_docs: int | None = None) -> str:
    """Return the path of the cached corpus for this scale, generating it
    (Ray-parallel) on first use. ``kind``: "docs" or "pages"."""
    import ray.data as rd

    from pd3f_ray.sources.synth import GEN_VERSION

    n = n_docs if n_docs is not None else n_docs_for(sf_dir)
    dest = os.path.join(
        CACHE_ROOT, f"{sf_name(sf_dir)}-{kind}-{n}-s{SEED}-g{GEN_VERSION}"
    )
    marker = os.path.join(dest, "_SUCCESS")
    if os.path.exists(marker):
        return dest
    if os.path.exists(dest):
        shutil.rmtree(dest)
    tmp = dest + ".__tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    gen = _gen_doc_batch if kind == "docs" else _gen_page_batch
    blocks = max(4, n // 2000)
    (
        rd.range(n, override_num_blocks=blocks)
        .map_batches(gen, batch_format="pyarrow", batch_size=500)
        .write_parquet(tmp)
    )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(tmp, dest)
    with open(marker, "w") as f:
        f.write("ok\n")
    return dest
