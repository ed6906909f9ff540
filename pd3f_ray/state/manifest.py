"""Resumable sharded output: per-shard lineage manifest + metrics.

"Resumable from checkpoint with per-partition lineage + metrics"
(BASELINE.json north_rule) for a batch pipeline means: the output is
laid out as one directory per input shard, each written atomically
(temp dir + rename), with an append-only manifest recording which
shards finished, their input lineage (the exact input files) and their
row/error counts. A rerun reads the manifest, skips finished shards,
and reprocesses only the rest. The reference has no equivalent — it is
one process per document with a best-effort disk cache
(/root/reference/pd3f/dehyphen_wrapper.py:13-15).
"""

from __future__ import annotations

import json
import os
import shutil
import time


MANIFEST_NAME = "_MANIFEST.jsonl"


def shard_dir(out_dir: str, shard_id: int) -> str:
    return os.path.join(out_dir, f"shard={shard_id:05d}")


def load_completed(out_dir: str) -> dict[int, dict]:
    """shard_id → manifest record for every completed shard."""
    path = os.path.join(out_dir, MANIFEST_NAME)
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["shard_id"]] = rec
    return done


def commit_shard(
    out_dir: str,
    shard_id: int,
    tmp_dir: str,
    input_files: list[str],
    metrics: dict,
) -> dict:
    """Atomically promote a finished shard: rename its temp dir into
    place, then append the manifest record. Crash between the two leaves
    a completed dir without a record — the rerun rewrites it, which is
    idempotent because the rename target is replaced."""
    final = shard_dir(out_dir, shard_id)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp_dir, final)
    rec = {
        "shard_id": shard_id,
        "input_files": input_files,
        "completed_at": time.time(),
        **metrics,
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "a", encoding="utf-8") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def plan_shards(files: list[str], num_shards: int) -> list[list[str]]:
    """Contiguous, deterministic assignment of input files to shards."""
    files = sorted(files)
    num_shards = max(1, min(num_shards, len(files)))
    out: list[list[str]] = [[] for _ in range(num_shards)]
    for i, f in enumerate(files):
        out[i % num_shards].append(f)
    return out
