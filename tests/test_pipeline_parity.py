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

N_DOCS = 60


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
