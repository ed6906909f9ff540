"""The per-row invariant from BASELINE.json input_hint: the Ray pipeline's
extracted text is byte-identical per url to the single-process oracle
(the kernel run directly). Also: page-table variant parity and
parallelism invariance."""

import json

import pytest

from pd3f_ray.core.config import ExtractOptions
from pd3f_ray.core.kernel import extract_record
from pd3f_ray.core.scorer import DeterministicScorer
from pd3f_ray.sources.synth import build_layout, doc_url, generate_pages_exploded

N_DOCS = 100


def _oracle_texts(n_docs=N_DOCS, seed=42):
    """Fresh scorer per call so no cross-test cache state is shared."""
    out = {}
    for i in range(n_docs):
        layout, _ = build_layout(i, seed)
        lang = ["multi", "de", "en"][i % 3]
        rec = extract_record(
            json.dumps(layout, ensure_ascii=False).encode(),
            ExtractOptions.experimental(lang=lang),
            scorer=DeterministicScorer(lang),
        )
        out[doc_url(i)] = (rec["text"], rec["error"])
    return out


@pytest.fixture(scope="module")
def oracle():
    return _oracle_texts()


def _collect(ds):
    tbl = ds.to_arrow_refs()
    import ray
    import pyarrow as pa

    parts = [t for t in ray.get(tbl) if t.num_rows]
    t = pa.concat_tables(parts, promote_options="default")
    return {
        r["url"]: (r["text"], r["error"]) for r in t.to_pylist()
    }


def test_doc_table_parity(ray_session, small_corpus_dir, oracle):
    from pd3f_ray.pipelines.extraction import extract_from_parquet

    got = _collect(extract_from_parquet(small_corpus_dir, batch_size=7))
    assert len(got) == N_DOCS
    for url, (text, error) in oracle.items():
        g_text, g_error = got[url]
        assert g_text == text, f"text mismatch for {url}"
        assert (g_error is None) == (error is None), f"error mismatch for {url}"


def test_page_table_parity(ray_session, tmp_path, oracle):
    import pyarrow.parquet as pq

    from pd3f_ray.pipelines.extraction import extract_from_pages_parquet

    tbl = generate_pages_exploded(N_DOCS, seed=42)
    pq.write_table(tbl, tmp_path / "pages.parquet")
    got = _collect(extract_from_pages_parquet(str(tmp_path / "pages.parquet")))
    assert len(got) == N_DOCS
    for url, (text, _) in oracle.items():
        assert got[url][0] == text, f"page-variant text mismatch for {url}"


def test_dead_letters_present_not_fatal(ray_session, small_corpus_dir):
    from pd3f_ray.pipelines.extraction import extract_from_parquet

    got = _collect(extract_from_parquet(small_corpus_dir))
    errors = [e for (_, e) in got.values() if e]
    # the corpus contains degenerate docs by construction
    assert errors, "expected dead-letter rows in the synthetic corpus"
    assert all(t is None for (t, e) in got.values() if e)


def test_batch_size_invariance(ray_session, small_corpus_dir, oracle):
    """Different batching/actor splits must not change any byte."""
    from pd3f_ray.pipelines.extraction import extract_from_parquet

    got = _collect(extract_from_parquet(small_corpus_dir, batch_size=3,
                                        concurrency=(1, 2)))
    for url, (text, _) in oracle.items():
        assert got[url][0] == text


def test_markdown_variant(ray_session, small_corpus_dir):
    """Markdown render prefixes headings with '#'*level and otherwise
    matches the kernel's markdown output per url."""
    import json

    from pd3f_ray.pipelines.extraction import extract_markdown_from_parquet

    got = _collect(extract_markdown_from_parquet(small_corpus_dir))
    assert len(got) == N_DOCS
    for i in range(N_DOCS):
        layout, _ = build_layout(i, 42)
        lang = ["multi", "de", "en"][i % 3]
        rec = extract_record(
            json.dumps(layout, ensure_ascii=False).encode(),
            ExtractOptions.experimental(lang=lang),
            scorer=DeterministicScorer(lang),
            markdown=True,
        )
        assert got[doc_url(i)] == (rec["text"], rec["error"])


def test_elements_explode(ray_session, small_corpus_dir):
    """Element rows concatenate back to the document text (body section,
    in elem_idx order), and dead-letter docs yield error rows."""
    import pandas as pd

    from pd3f_ray.pipelines.extraction import (
        extract_elements_from_parquet,
        extract_from_parquet,
    )

    el = extract_elements_from_parquet(small_corpus_dir).to_pandas()
    docs = extract_from_parquet(small_corpus_dir).to_pandas()
    assert set(el["section"]) <= {"header", "body", "footer", "error"}
    ok_docs = docs[docs["error"].isnull()]
    for _, d in ok_docs.head(20).iterrows():
        mine = el[(el["url"] == d["url"]) & (el["section"] != "error")]
        assert (mine["error"].isnull()).all()
        # every element's rendered text must appear in the document text
        for t in mine["text"]:
            assert t.strip() == "" or t.strip("\n") in d["text"] or t in d["text"]
    err_docs = docs[docs["error"].notnull()]
    if len(err_docs):
        err_el = el[el["section"] == "error"]
        assert set(err_docs["url"]) == set(err_el["url"])


def test_tables_side_channel(ray_session, small_corpus_dir):
    """Table CSVs ride next to the text (reference: extract() returns
    (text, tables)) and are never merged into it."""
    from pd3f_ray.pipelines.extraction import extract_from_parquet

    df = extract_from_parquet(small_corpus_dir).to_pandas()
    with_tables = df[df["n_tables"] > 0]
    assert len(with_tables) > 0, "corpus should include docs with tables"
    for _, r in with_tables.iterrows():
        tables = r["tables_csv"].split("\x1d")
        assert len(tables) == r["n_tables"]
        for t in tables:
            assert t.startswith("item,qty,price")
            if r["text"]:
                assert t not in r["text"]
    without = df[(df["n_tables"] == 0) & df["error"].isnull()]
    assert (without["tables_csv"] == "").all()


def test_skewed_giant_doc_pages_path(ray_session, tmp_path):
    """Skew: one 300-page document among 1-page docs, shuffled page rows,
    through the fused page-table path — output byte-identical to the
    kernel run on the assembled layout."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pd3f_ray.pipelines.extraction import extract_from_pages_parquet
    from pd3f_ray.sources.synth import BASE_TS, build_layout

    # giant doc: replicate a plain scenario page 300×, each page with
    # distinct element content ids don't matter for the kernel
    giant, _ = build_layout(0, 42, scenario="plain")
    giant_pages = [giant["pages"][0]] * 300
    giant_layout = {"pages": giant_pages, "fonts": giant["fonts"]}

    rows = []
    for p_idx, page in enumerate(giant_pages):
        payload = {"page": page, "fonts": giant["fonts"]}
        rows.append(("https://example.org/giant", BASE_TS, p_idx,
                     json.dumps(payload, ensure_ascii=False).encode(), "en"))
    for i in range(1, 40):
        lay, _ = build_layout(i, 42, scenario="plain")
        payload = {"page": lay["pages"][0], "fonts": lay["fonts"]}
        rows.append((f"https://example.org/small/{i}", BASE_TS + i, 0,
                     json.dumps(payload, ensure_ascii=False).encode(), "en"))
    random.Random(7).shuffle(rows)
    urls, tss, idxs, blobs, langs = zip(*rows)
    tbl = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "page_idx": pa.array(idxs, pa.int32()),
        "page_json": pa.array(blobs, pa.binary()),
        "lang": pa.array(langs, pa.string()),
    })
    path = tmp_path / "pages"
    path.mkdir()
    pq.write_table(tbl, path / "part0.parquet")

    got = _collect(extract_from_pages_parquet(str(path)))
    assert len(got) == 40

    oracle_rec = extract_record(
        json.dumps(giant_layout, ensure_ascii=False).encode(),
        ExtractOptions.experimental(lang="en"),
        scorer=DeterministicScorer("en"),
    )
    text, err = got["https://example.org/giant"]
    assert err is None
    assert text == oracle_rec["text"]
