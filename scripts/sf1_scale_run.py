"""One-shot sf1 (10x sf0.1) scale demonstration.

The sandbox testdata stops at sf0.1 (200k-doc headline corpus, 5k-row
``documents`` table). The banded exchange plans have been oracle-
verified at sf0.1; this script retires the last in-sandbox "holds at
scale" doubt by stepping everything 10x:

1. Synthesizes ``/tmp/testdata_sf1/documents.parquet`` — the sf0.1
   documents table replicated 10x with remapped ``doc_id``s and a
   deterministic per-replica text suffix (so every row is distinct and
   dedup/digest paths see real work), ``n_chars`` recomputed. The
   other 9 tables are symlinked from sf0.1 (unused by the two flagship
   queries; present so the DuckDB view setup is uniform). The dir name
   contains "sf1" so ``ensure_corpus`` sizes the headline corpus at
   n_docs_for(sf1) = 2,000,000 documents (~4.6 GB parquet).
2. Runs the headline extraction pipeline over the 2M-doc corpus
   (generation excluded from timing, same contract as bench.py).
3. Runs ``extract_roundtrip`` and ``web_corpus_pipeline`` at sf1 and
   compares them to their DuckDB oracles exactly the way
   ``scripts.check_oracle`` does (columns, rows, values, serialized
   representation).

Prints one JSON line; record it in BASELINE.md. Usage:

    python -m scripts.sf1_scale_run
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/testdata_sf1"
REPLICAS = 10
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "embeddings"
).split()


def build_sf1_documents() -> int:
    os.makedirs(SF1, exist_ok=True)
    dest = os.path.join(SF1, "documents.parquet")
    if not os.path.exists(dest):
        src = pq.read_table(os.path.join(SF01, "documents.parquet"))
        ids = src.column("doc_id").to_pylist()
        texts = src.column("text").to_pylist()
        langs = src.column("lang").to_pylist()
        sources = src.column("source").to_pylist()
        out = {"doc_id": [], "text": [], "lang": [], "source": [],
               "n_chars": []}
        for k in range(REPLICAS):
            # k=0 keeps sf0.1 rows byte-identical; k>0 rows are
            # distinct in both key and content, deterministically
            suffix = "" if k == 0 else f" replica{k}"
            for did, text, lang, source in zip(ids, texts, langs, sources):
                t = text + suffix
                out["doc_id"].append(did + k * 10_000_000)
                out["text"].append(t)
                out["lang"].append(lang)
                out["source"].append(source)
                out["n_chars"].append(len(t))
        pq.write_table(
            pa.table({
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
            }),
            dest,
        )
    for t in TABLES:
        link = os.path.join(SF1, t + ".parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF01, t + ".parquet"), link)
    return pq.read_metadata(dest).num_rows


def run_headline() -> dict:
    from pd3f_ray.pipelines.extraction import extract_dataset, read_documents
    from pd3f_ray.sources.corpus import ensure_corpus

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _consume  # the same distributed-stats sink

    t_gen = time.perf_counter()
    corpus = ensure_corpus(SF1, kind="docs")  # 2M docs; cached, untimed
    gen_sec = time.perf_counter() - t_gen

    t0 = time.perf_counter()
    stats = _consume(extract_dataset(read_documents(corpus)))
    wall = time.perf_counter() - t0
    return {"headline_sec": round(wall, 3),
            "corpus_gen_or_cache_sec": round(gen_sec, 3),
            "rows": stats["rows"],
            "docs_per_sec": round(stats["rows"] / wall, 1),
            "mb_per_sec": round(stats["payload_bytes"] / wall / 1e6, 1),
            "dead_letters": stats["errors"]}


def check_flagships() -> dict:
    import importlib.util

    from scripts.check_oracle import canon, to_pandas

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(repo, "__ray_entry__.py"))
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)

    con = duckdb.connect()
    for t in TABLES + ["documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF1, t + '.parquet')}')")

    oracles = entrymod.oracle_sql()
    qs = entrymod.queries()
    out = {}
    for name in ("extract_roundtrip", "web_corpus_pipeline"):
        t0 = time.perf_counter()
        got = canon(to_pandas(qs[name](SF1)))
        ray_sec = round(time.perf_counter() - t0, 3)
        want = canon(con.execute(oracles[name]).df())
        ok = (list(got.columns) == list(want.columns)
              and len(got) == len(want)
              and got.to_csv(index=False) == want.to_csv(index=False))
        out[name] = {"rows": len(got), "sec": ray_sec,
                     "oracle": "OK" if ok else "FAIL"}
        if not ok:
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows",
                  file=sys.stderr)
    return out


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    n_docs_table = build_sf1_documents()
    head = run_headline()
    flags = check_flagships()
    result = {"metric": "sf1 scale demonstration", "sf": SF1,
              "documents_rows": n_docs_table, "num_cpus": 32,
              **head, "flagships": flags}
    print(json.dumps(result))
    ray.shutdown()
    return 0 if all(v["oracle"] == "OK" for v in flags.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
