"""Versioned parquet tables: snapshot isolation, time travel, and
file-stats data skipping over plain directories — the minimal shape of
what Delta/Iceberg/Hudi provide, built from two primitives that both
hold on any storage:

  * **Manifest-as-commit.** A version N is EXACTLY the file list in
    ``_versions/N.json``; the manifest lands by atomic single-file
    rename (``os.replace``), so readers see the old or the new version,
    never a half-written table. Data files are written FIRST and are
    invisible until a manifest references them — a crashed writer
    leaves dead files, never a corrupt table (the same
    write-then-rename commit as the streaming admission sink and
    ``compact_parquet``).
  * **Stats-in-manifest.** Per-file min/max for chosen columns are
    read once from the parquet footers of the files JUST written and
    stored in the manifest. Readers prune files from the manifest
    alone: at 100 TB this kills both the O(files) LIST storm (the
    manifest IS the listing) and the read amplification (a predicate
    on a range-clustered column touches only overlapping files —
    composing with ``write_zordered``'s clustering and the row-group
    pruning Spark already does inside each file).

Append never rewrites or re-stats old files — a new version's manifest
carries its parent's entries and adds the new ones, so commit cost
scales with the INCREMENT, not the table. Concurrent writers race on
the manifest name and the LOSER FAILS: the commit is a hard-link CAS
(``os.link`` of the fully-written temp manifest onto ``N.json`` —
atomic, and ``FileExistsError`` when another writer won), the same
compare-and-swap every real table format performs. Readers need no
coordination at all.

LIMITATION — driver-local POSIX filesystem only: manifests are
written/listed with ``os`` calls from the driver, so ``path`` must be
a filesystem the driver shares with Spark's writers (local mode, or a
cluster-wide NFS/Lustre mount). HDFS/S3 object paths need the commit
reimplemented on the store's own primitives (rename-if-absent /
conditional PUT) — out of scope for this sandbox, flagged here so the
failure is a documented contract, not a surprise.

Reference parity: the reference (373-line single-shot ETL) rewrites
its outputs wholesale and has no versioning surface; this extends the
sink side the same way SCD2/MERGE extend the semantics side.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _versions_dir(path: str) -> str:
    return os.path.join(path, "_versions")


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first; retry on the new
    latest version (optimistic concurrency, like Delta's commit loop)."""


def _commit_manifest(path: str, version: int, manifest: dict) -> None:
    """Atomically publish ``manifest`` as version ``version``.

    The temp file is fully written and fsync'd first, then hard-linked
    onto the final name — ``os.link`` is atomic AND fails with
    ``FileExistsError`` when the name is taken, so a concurrent writer
    that computed the same version number errors instead of silently
    clobbering the winner's commit (the old ``os.replace`` commit was
    atomic but last-writer-wins)."""
    vd = _versions_dir(path)
    os.makedirs(vd, exist_ok=True)
    tmp = os.path.join(vd, f".{version}.json.tmp.{os.getpid()}")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, os.path.join(vd, f"{version}.json"))  # THE commit
    except FileExistsError:
        raise ConcurrentWriteError(
            f"version {version} of {path} was committed by another "
            "writer; re-read table_versions() and retry") from None
    finally:
        os.unlink(tmp)


def table_versions(path: str) -> list[int]:
    """Committed versions, ascending. Uncommitted data dirs (crashed
    writers) are invisible — only manifests count."""
    vd = _versions_dir(path)
    if not os.path.isdir(vd):
        return []
    return sorted(int(f[:-5]) for f in os.listdir(vd)
                  if f.endswith(".json") and f[:-5].isdigit())


def _load_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_versions_dir(path), f"{version}.json"),
              encoding="utf-8") as fh:
        return json.load(fh)


def _json_scalar(v):
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return None  # timestamps/decimals: skip rather than mis-compare


def _file_stats(files: Sequence[str], stat_cols: Sequence[str]) -> dict:
    """{basename: {col: [min, max]}} from parquet footers — one bounded
    driver-side metadata read per NEW file (never the data pages, never
    old files). Columns whose stats are absent or non-JSON-scalar are
    omitted (pruning then conservatively keeps the file)."""
    import pyarrow.parquet as pq

    out = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        per: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name not in stat_cols:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    per[name] = None
                    continue
                mn, mx = _json_scalar(st.min), _json_scalar(st.max)
                if mn is None or mx is None:
                    per[name] = None
                    continue
                if name in per:
                    if per[name] is None:
                        continue
                    per[name] = [min(per[name][0], mn),
                                 max(per[name][1], mx)]
                else:
                    per[name] = [mn, mx]
        out[os.path.basename(f)] = {k: v for k, v in per.items()
                                    if v is not None}
    return out


def write_version(df: DataFrame, path: str, mode: str = "append",
                  stat_cols: Sequence[str] = (),
                  extra: dict | None = None) -> int:
    """Commit ``df`` as the table's next version. ``mode='append'``
    adds to the parent snapshot; ``'overwrite'`` replaces it (old
    versions stay readable — overwrite is logical, nothing is
    deleted). ``extra`` merges caller metadata (e.g. a streaming
    epoch id) into the manifest ATOMICALLY with the commit — it lands
    in the same hard-link CAS, so metadata and file list can never
    disagree after a crash. Returns the committed version number."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    prior = table_versions(path)
    version = (prior[-1] + 1) if prior else 1
    # Each commit ATTEMPT writes to its own unique directory (like the
    # tmp manifest): two writers racing on the same next version must
    # not share a data dir, or the CAS loser's mode('overwrite') write
    # deletes the winner's already-committed files and the winner's
    # manifest points at nothing. The winner's manifest references its
    # own dir; a loser's orphan dir is invisible (only manifests count)
    # and is garbage a vacuum can reclaim, exactly like crashed-writer
    # leftovers.
    attempt = f"v{version:05d}-{uuid.uuid4().hex[:8]}.{os.getpid()}"
    data_dir = os.path.join(path, "data", attempt)
    df.write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet") or f.endswith(".snappy.parquet"))
    rel_dir = os.path.relpath(data_dir, path)
    stats = _file_stats(files, tuple(stat_cols)) if stat_cols else {}
    entries = [{"file": os.path.join(rel_dir, os.path.basename(f)),
                "stats": stats.get(os.path.basename(f), {})}
               for f in files]
    if mode == "append" and prior:
        entries = _load_manifest(path, prior[-1])["entries"] + entries
    manifest = {"version": version, "mode": mode,
                "stat_cols": sorted(stat_cols), "entries": entries}
    if extra:
        for k in extra:
            if k in manifest:
                raise ValueError(f"extra key {k!r} collides with a "
                                 "reserved manifest field")
        manifest.update(extra)
    _commit_manifest(path, version, manifest)
    return version


def read_version(spark: SparkSession, path: str,
                 version: int | None = None,
                 prune: tuple[str, object, object] | None = None,
                 merge_schema: bool = False) -> DataFrame:
    """Read a snapshot (latest when ``version`` is None) from its
    manifest — never by listing the filesystem. ``prune=(col, lo, hi)``
    keeps only files whose manifest [min, max] for ``col`` overlaps
    [lo, hi] (files without stats are kept — pruning is always sound,
    filtering is still the caller's job). ``merge_schema=True`` unions
    the file schemas (schema evolution: versions appended with added
    columns read back with NULLs for files that predate the column —
    the Delta/Iceberg widening-read semantics via Spark's own
    ``mergeSchema``)."""
    vs = table_versions(path)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs}")
    entries = _load_manifest(path, v)["entries"]
    if prune is not None:
        col, lo, hi = prune
        entries = [e for e in entries
                   if (s := e["stats"].get(col)) is None
                   or (s[0] <= hi and s[1] >= lo)]
    files = [os.path.join(path, e["file"]) for e in entries]
    if not files:
        raise ValueError("pruning removed every file; read without "
                         "prune and filter instead")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*files)


def rollback(spark: SparkSession, path: str, to_version: int) -> int:
    """Non-destructive restore (Delta RESTORE shape): commit a NEW
    version whose file list is ``to_version``'s — history is preserved
    and the rollback itself is an atomic manifest rename."""
    vs = table_versions(path)
    if to_version not in vs:
        raise ValueError(f"version {to_version} not in {vs}")
    old = _load_manifest(path, to_version)
    version = vs[-1] + 1
    manifest = {"version": version, "mode": "rollback",
                "restores": to_version,
                "stat_cols": old.get("stat_cols", []),
                "entries": old["entries"]}
    _commit_manifest(path, version, manifest)
    return version
