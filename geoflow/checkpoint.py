"""Checkpointed, resumable partitioned sink (★S6) with per-partition
lineage + metrics (★A3).

Layout: ``out_dir/part=<p>/data.parquet`` + ``out_dir/part=<p>/manifest.json``
written atomically (tmp + rename, manifest last).  A partition with a valid
manifest is skipped on resume — the driver filters finished partitions out
of the input stream BEFORE the shuffle, so a rerun only moves unfinished
data.  Manifests carry lineage (input id, stage version) and metrics
(row/byte counts); ``summarize`` folds them into one summary dict.

Retry-safety: group tasks are idempotent — a retried task sees the
manifest (or rewrites the same content-keyed file) and cannot duplicate a
partition (SURVEY.md §4 checkpoint/resume row).
"""

from __future__ import annotations

import json
import os
import pathlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from .shuffle import read_parquet_clean


def _manifest_path(out_dir: str, part: int) -> pathlib.Path:
    return pathlib.Path(out_dir) / f"part={part}" / "manifest.json"


def finished_partitions(out_dir: str) -> set[int]:
    out = set()
    root = pathlib.Path(out_dir)
    if not root.exists():
        return out
    for m in root.glob("part=*/manifest.json"):
        try:
            meta = json.loads(m.read_text())
            if meta.get("complete"):
                out.add(int(meta["part"]))
        except (ValueError, KeyError):
            continue
    return out


def checkpointed_write(ds, out_dir: str, partition_col: str = "part",
                       stage_version: str = "v1",
                       input_id: str = "") -> dict:
    """Write ``ds`` partitioned by ``partition_col`` with resume-by-skip.

    Returns the manifest summary.  ``ds`` must already carry the partition
    column (small cardinality, e.g. a hash bucket)."""
    done = finished_partitions(out_dir)
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)

    if done:
        done_arr = sorted(done)

        def drop_done(batch: pa.Table) -> pa.Table:
            import numpy as np
            part = batch[partition_col].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(part, done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _metrics_row(-1, 0, 0, skipped=True)
        part = int(group[partition_col][0].as_py())
        pdir = pathlib.Path(out_dir) / f"part={part}"
        mpath = pdir / "manifest.json"
        if mpath.exists():  # retried task: already complete
            return _metrics_row(part, group.num_rows, group.nbytes,
                                skipped=True)
        pdir.mkdir(parents=True, exist_ok=True)
        tmp = pdir / ".data.parquet.tmp"
        pq.write_table(group, tmp)
        os.replace(tmp, pdir / "data.parquet")
        mtmp = pdir / ".manifest.json.tmp"
        mtmp.write_text(json.dumps({
            "part": part, "rows": group.num_rows, "bytes": group.nbytes,
            "stage_version": stage_version, "input_id": input_id,
            "complete": True,
        }))
        os.replace(mtmp, mpath)
        return _metrics_row(part, group.num_rows, group.nbytes,
                            skipped=False)

    from .shuffle import collect_pandas
    metrics = collect_pandas(ds.groupby(partition_col).map_groups(
        write_group, batch_format="pyarrow"))
    return summarize(out_dir, metrics)


def _metrics_row(part: int, rows: int, nbytes: int,
                 skipped: bool) -> pa.Table:
    return pa.table({"part": pa.array([part], type=pa.int64()),
                     "rows": pa.array([rows], type=pa.int64()),
                     "bytes": pa.array([nbytes], type=pa.int64()),
                     "skipped": pa.array([skipped])})


def streamed_write(ds, out_dir: str, key_cols=("url",)) -> dict:
    """No-shuffle streaming sink: every map task writes its own block as
    one parquet file named by a deterministic content key, plus a
    per-file manifest — nothing is exchanged between workers.

    Use when pure write throughput matters and downstream reads don't
    need key-range layout; ``checkpointed_write`` remains the
    key-partitioned, resume-by-skip sink (the shuffle pays for layout).
    Task retries are idempotent: a retried block rewrites the same
    content-keyed file.  Returns {files, rows, bytes}."""
    import hashlib

    root = pathlib.Path(out_dir)
    root.mkdir(parents=True, exist_ok=True)
    keys = list(key_cols)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64()),
                             "bytes": pa.array([], type=pa.int64())})
        # content key = digest of EVERY key value (not just endpoints):
        # two blocks sharing first/last key + row count must not collide,
        # or one silently overwrites the other (ADVICE r1)
        h = hashlib.sha1()
        for c in keys:
            vals = pc.cast(batch[c], pa.large_string()).to_pylist()
            h.update("\x1f".join("" if v is None else v
                                 for v in vals).encode())
            h.update(b"\x00")
        h.update(str(batch.num_rows).encode())
        name = f"block-{h.hexdigest()[:16]}"
        tmp = root / f".{name}.parquet.tmp"
        final = root / f"{name}.parquet"
        pq.write_table(batch, tmp)
        os.replace(tmp, final)
        m = root / f"._{name}.manifest.json.tmp"
        m.write_text(json.dumps({"file": f"{name}.parquet",
                                 "rows": batch.num_rows,
                                 "bytes": batch.nbytes,
                                 "complete": True}))
        # "_"-prefixed: ignored by parquet dataset discovery
        os.replace(m, root / f"_{name}.manifest.json")
        return pa.table({
            "file": pa.array([name], type=pa.string()),
            "rows": pa.array([batch.num_rows], type=pa.int64()),
            "bytes": pa.array([batch.nbytes], type=pa.int64())})

    metrics = ds.map_batches(write_block,
                             batch_format="pyarrow").to_pandas()
    summary = {"files": int(len(metrics)),
               "rows": int(metrics["rows"].sum()) if len(metrics) else 0,
               "bytes": int(metrics["bytes"].sum()) if len(metrics)
               else 0}
    (root / "_SUMMARY.json").write_text(json.dumps(summary,
                                                   sort_keys=True))
    return summary


def summarize(out_dir: str, metrics=None) -> dict:
    """Fold per-partition manifests into one summary (writes _SUMMARY.json)."""
    parts, rows, nbytes = [], 0, 0
    for m in pathlib.Path(out_dir).glob("part=*/manifest.json"):
        meta = json.loads(m.read_text())
        parts.append(meta["part"])
        rows += meta["rows"]
        nbytes += meta["bytes"]
    summary = {"partitions": len(parts), "rows": rows, "bytes": nbytes}
    if metrics is not None:
        summary["written_this_run"] = int(
            metrics[~metrics["skipped"]]["rows"].sum()) if len(metrics) \
            else 0
    (pathlib.Path(out_dir) / "_SUMMARY.json").write_text(
        json.dumps(summary, sort_keys=True))
    return summary


def read_checkpoint(out_dir: str, empty_schema: pa.Schema | None = None):
    """Read a checkpointed output back as a Ray Dataset.

    ``empty_schema``: schema to use for the valid empty dataset when no
    partition was ever written (zero-match pipelines are legal)."""
    import ray.data

    files = sorted(str(p) for p in
                   pathlib.Path(out_dir).glob("part=*/data.parquet"))
    if not files:
        return ray.data.from_arrow(
            pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in empty_schema],
                schema=empty_schema)
            if empty_schema is not None else pa.table({}))
    ds = read_parquet_clean(files)
    if "text_z" in pq.read_schema(files[0]).names:
        # the sink stores the carried page text zlib-compressed
        # (pipeline.add_part) — restore `text` transparently so readers
        # and the byte-identity invariant see the original column
        def inflate(batch: pa.Table) -> pa.Table:
            import zlib
            i = batch.schema.get_field_index("text_z")
            txt = pa.array(
                [zlib.decompress(bytes(z)).decode("utf-8")
                 for z in batch["text_z"].to_pylist()],
                type=pa.large_string())
            return batch.remove_column(i).append_column("text", txt)

        ds = ds.map_batches(inflate, batch_format="pyarrow")
    return ds
