#!/usr/bin/env python
"""Benchmark harness.

Plain run: one Ray session at ``RAY_GRAFT_CPUS`` (default 32), extraction
pipeline over the ``$GRAFT_SF_DIR``-scale synthetic corpus (cached on
disk; generation is excluded from timing), plus per-query timings.
Prints ONE JSON line:
    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ..., "mb_per_sec": ...}

``--scaling``: runs the headline pipeline in two fresh subprocesses
(8 and 32 CPUs) on the same input and reports both throughputs plus the
scaling efficiency (the in-sandbox stand-in for the N-vs-4N-node
cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def _consume(ds) -> dict:
    """Stream the dataset to completion, returning row/byte counts
    without materializing it on the driver."""
    rows = 0
    payload = 0
    chars = 0
    errors = 0
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        rows += batch.num_rows
        cols = batch.column_names
        if "payload_bytes" in cols:
            import pyarrow.compute as pc

            payload += pc.sum(batch.column("payload_bytes")).as_py() or 0
            errors += batch.column("error").null_count * 0 + (
                batch.num_rows - batch.column("error").null_count
            )
        if "n_chars" in cols:
            import pyarrow.compute as pc

            chars += pc.sum(batch.column("n_chars")).as_py() or 0
    return {"rows": rows, "payload_bytes": payload, "chars": chars,
            "errors": errors}


def run_headline() -> dict:
    """Extraction over the cached corpus for SF_DIR; returns timings."""
    from pd3f_ray.pipelines.extraction import extract_from_parquet
    from pd3f_ray.sources.corpus import ensure_corpus

    corpus = ensure_corpus(SF_DIR, kind="docs")  # cached; not timed
    # warm OS page cache so we measure compute, not first disk read
    import glob

    for f in glob.glob(os.path.join(corpus, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass

    t0 = time.perf_counter()
    stats = _consume(extract_from_parquet(corpus))
    wall = time.perf_counter() - t0
    return {"sec": wall, **stats}


def run_queries() -> dict[str, float]:
    import __ray_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        # consume lazily-returned datasets
        if hasattr(res, "iter_batches"):
            for _ in res.iter_batches(batch_size=8192):
                pass
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main_plain():
    _init_ray(NUM_CPUS)
    head = run_headline()
    qtimes = run_queries()
    result = {
        "metric": "extraction pipeline wall time (synthetic corpus, "
                  "docs table, experimental config)",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows": head["rows"],
        "docs_per_sec": round(head["rows"] / head["sec"], 1),
        "mb_per_sec": round(head["payload_bytes"] / head["sec"] / 1e6, 1),
        "dead_letters": head["errors"],
    }
    print(json.dumps(result))
    import ray

    ray.shutdown()


def _headline_subprocess(num_cpus: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus),
               GRAFT_BENCH_HEADLINE_ONLY="1")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main_scaling():
    lo, hi = 8, 32
    r_lo = _headline_subprocess(lo)
    r_hi = _headline_subprocess(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(json.dumps({
        "metric": "scaling efficiency (fresh sessions, same input)",
        "sf": SF_DIR,
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }))


def main_headline_only():
    _init_ray(NUM_CPUS)
    head = run_headline()
    print(json.dumps({
        "metric": "headline",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "num_cpus": NUM_CPUS,
        "rows": head["rows"],
        "docs_per_sec": round(head["rows"] / head["sec"], 1),
        "mb_per_sec": round(head["payload_bytes"] / head["sec"] / 1e6, 1),
    }))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        main_headline_only()
    else:
        main_plain()
