"""Job entry point: ``python -m pd3f_ray.cli <command> ...``.

This is the ``ray job submit`` surface — the one place (besides bench.py
and the test fixture) that owns a Ray session. Library code never calls
``ray.init()``.

Commands:
  extract IN OUT   resumable sharded extraction of a document table
                   (--pages for page-table input, --markdown for the
                   markdown render, --shards/--buckets for layout)
  synth OUT        write a deterministic synthetic corpus (--docs N,
                   --pages for the exploded page-table variant)
  query NAME SF    run any registered pipeline (the ``queries()``
                   registry: dedup/similarity/textstats/joins/windows/
                   sketches/curation/...) over an sf-dir of parquet
                   tables; ``--out DIR`` writes parquet, else prints
                   the row count. ``query list`` prints the registry.
  compact IN OUT   coalesce a small-files parquet directory into
                   ~target-MB files (--target-mb, default 128) —
                   the operational follow-up to K-way sharded runs
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False,
              "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)


def cmd_extract(args) -> dict:
    from pd3f_ray.core.config import ExtractOptions
    from pd3f_ray.pipelines.extraction import (
        extract_from_pages_parquet,
        run_resumable,
    )

    _init_ray(args.cpus)
    opts = ExtractOptions.experimental(lang=args.lang, fast=args.fast)
    if args.pages:
        ds = extract_from_pages_parquet(args.input, opts)
        ds.write_parquet(args.output)
        import pyarrow.dataset as pads

        written = pads.dataset(args.output, format="parquet")
        return {"rows": written.count_rows(), "out": args.output}
    return run_resumable(args.input, args.output, opts,
                         num_shards=args.shards, num_buckets=args.buckets,
                         markdown=args.markdown)


def cmd_synth(args) -> dict:
    from pd3f_ray.sources.synth import generate_pages_exploded, write_corpus

    if args.pages:
        import os

        import pyarrow.parquet as pq

        os.makedirs(args.output, exist_ok=True)
        tbl = generate_pages_exploded(args.docs, seed=args.seed)
        pq.write_table(tbl, f"{args.output}/pages.parquet")
        return {"rows": tbl.num_rows, "out": args.output, "kind": "pages"}
    files = write_corpus(args.output, n_docs=args.docs, seed=args.seed)
    return {"files": len(files), "docs": args.docs, "out": args.output,
            "kind": "docs"}


def _registry():
    """The queries() registry without importing the driver-contract
    module by path tricks: rebuilt from the pipeline modules."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_pd3f_ray_entry", os.path.join(root, "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.queries()


def cmd_query(args) -> dict:
    reg = _registry()
    if args.name == "list":
        return {"queries": sorted(reg)}
    if args.name not in reg:
        raise SystemExit(f"unknown query {args.name!r}; try 'query list'")
    _init_ray(args.cpus)
    ds = reg[args.name](args.sf_dir)
    if args.out:
        if hasattr(ds, "write_parquet"):
            ds.write_parquet(args.out)
            import pyarrow.dataset as pads

            n = pads.dataset(args.out, format="parquet").count_rows()
        else:  # pandas result
            import os

            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(args.out, exist_ok=True)
            t = pa.Table.from_pandas(ds, preserve_index=False)
            pq.write_table(t, os.path.join(args.out, "result.parquet"))
            n = t.num_rows
        return {"query": args.name, "rows": n, "out": args.out}
    # branch on the same capability as the --out path: pandas DataFrames
    # also have .count(), but it returns a per-column Series
    n = ds.count() if hasattr(ds, "write_parquet") else len(ds)
    return {"query": args.name, "rows": int(n)}


def cmd_compact(args) -> dict:
    from pd3f_ray.pipelines.extraction import compact_parquet

    _init_ray(args.cpus)
    return compact_parquet(args.input, args.output,
                           target_mb=args.target_mb)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pd3f_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract", help="resumable sharded extraction")
    e.add_argument("input")
    e.add_argument("output")
    e.add_argument("--pages", action="store_true")
    e.add_argument("--markdown", action="store_true")
    e.add_argument("--lang", default="multi")
    e.add_argument("--fast", action="store_true")
    e.add_argument("--shards", type=int, default=8)
    e.add_argument("--buckets", type=int, default=16)
    e.add_argument("--cpus", type=int, default=None)
    e.set_defaults(fn=cmd_extract)

    s = sub.add_parser("synth", help="write a synthetic corpus")
    s.add_argument("output")
    s.add_argument("--docs", type=int, default=2000)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--pages", action="store_true")
    s.set_defaults(fn=cmd_synth)

    q = sub.add_parser("query", help="run a registered pipeline")
    q.add_argument("name")
    q.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None)
    q.add_argument("--cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser("compact", help="coalesce small parquet files")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--target-mb", type=int, default=128)
    c.add_argument("--cpus", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    result = args.fn(args)
    print(json.dumps(result))
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
