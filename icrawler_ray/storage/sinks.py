"""Storage sinks (SURVEY.md K1-K4).

The reference's storage layer is a KV blob contract — write(id, data) /
exists(id) / max_file_idx() (/root/reference/icrawler/storage/base.py:4-38)
— with filesystem (filesystem.py:9-42) and GCS (google_storage.py:6-40)
backends, resolved from a dict config by class name or dotted module path
(/root/reference/icrawler/crawler.py:91-117).

This engine's primary sink is COLUMNAR: results tables written as
partitioned Parquet directories (one dir per round/shard — the resumable
layout), with Lance used transparently when the ``lance`` package is
available (not in this sandbox; import-gated). The KV contract survives as
``FileSystemSink`` for blob-per-file exports, including the reference's
``max_file_idx`` resume scan.

Remote object stores (gs://, s3://) ride on ``pyarrow.fs`` URI handling —
the same write path, no separate backend class.
"""

from __future__ import annotations

import importlib
import os
import os.path as osp

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance is not installed in this sandbox
    import lance  # type: ignore

    _HAVE_LANCE = True
except ImportError:
    _HAVE_LANCE = False


class BaseSink:
    """KV blob contract of the reference (base.py:4-38)."""

    def write(self, id: str, data) -> None:
        raise NotImplementedError

    def exists(self, id: str) -> bool:
        raise NotImplementedError

    def max_file_idx(self) -> int:
        raise NotImplementedError


class FileSystemSink(BaseSink):
    """Blob-per-file sink (filesystem.py:9-42 semantics): mkdir-p on
    write, text vs binary mode by data type, integer-stem scan for
    ``max_file_idx`` (the file_idx_offset='auto' resume path,
    downloader.py:53-58)."""

    def __init__(self, root_dir: str):
        self.root_dir = root_dir

    def write(self, id: str, data) -> None:
        path = osp.join(self.root_dir, id)
        os.makedirs(osp.dirname(path) or ".", exist_ok=True)
        mode = "w" if isinstance(data, str) else "wb"
        with open(path, mode) as f:
            f.write(data)

    def exists(self, id: str) -> bool:
        return osp.exists(osp.join(self.root_dir, id))

    def max_file_idx(self) -> int:
        if not osp.isdir(self.root_dir):
            return 0
        best = 0
        for name in os.listdir(self.root_dir):
            stem = osp.splitext(name)[0]
            try:
                best = max(best, int(stem))
            except ValueError:
                continue
        return best


class ParquetDirSink:
    """Columnar results sink: one directory per partition (round / shard),
    written atomically (tmp file + rename) so a resumed run can trust any
    visible file — the resumable layout of SURVEY.md §4. Uses Lance when
    available, Parquet otherwise (same logical schema)."""

    def __init__(self, root_dir: str):
        self.root_dir = root_dir

    def partition_dir(self, partition: str) -> str:
        return osp.join(self.root_dir, partition)

    def write_table(self, table: pa.Table, partition: str, name: str = "part-0") -> str:
        d = self.partition_dir(partition)
        os.makedirs(d, exist_ok=True)
        if _HAVE_LANCE:  # pragma: no cover
            path = osp.join(d, f"{name}.lance")
            lance.write_dataset(table, path, mode="overwrite")
            return path
        path = osp.join(d, f"{name}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return path

    def read_partition(self, partition: str) -> pa.Table | None:
        d = self.partition_dir(partition)
        if not osp.isdir(d):
            return None
        parts = [p for p in sorted(os.listdir(d)) if p.endswith(".parquet")]
        if not parts:
            return None
        return pa.concat_tables([pq.read_table(osp.join(d, p)) for p in parts])

    def finished_partitions(self) -> list[str]:
        if not osp.isdir(self.root_dir):
            return []
        return sorted(
            p for p in os.listdir(self.root_dir)
            if osp.isdir(osp.join(self.root_dir, p)) and os.listdir(osp.join(self.root_dir, p))
        )


def parse_bucket_uri(root_dir: str) -> tuple[str, str]:
    """Reference bucket/prefix arithmetic, mirrored exactly
    (google_storage.py:24-28): ``gs://<bucket>/<dir...>`` ->
    (bucket, dir-without-leading-slash)."""
    bucket = root_dir[5:].split("/")[0]
    folder = root_dir[6 + len(bucket):]
    if folder.startswith("/"):
        folder = folder[1:]
    return bucket, folder


class CloudStorageSink(BaseSink):
    """KV blob sink over any ``pyarrow.fs`` URI — ``gs://bucket/dir``
    (GcsFileSystem), ``s3://``, or a local path/``file://`` URI (the
    offline-testable instantiation: same code path, LocalFileSystem).

    Reference parity (google_storage.py:6-40): write(id, data) puts one
    blob under the prefix; exists probes it; ``max_file_idx`` returns the
    BLOB COUNT under the prefix — the reference's GCS quirk (it diverges
    from the filesystem backend's integer-stem max; google_storage.py:40)
    — mirrored so ``file_idx_offset='auto'`` resumes identically."""

    def __init__(self, root_dir: str):
        from pyarrow import fs as pafs

        self.root_dir = root_dir
        self.fs, self.base = pafs.FileSystem.from_uri(root_dir)

    def _path(self, id: str) -> str:
        return f"{self.base.rstrip('/')}/{id}"

    def write(self, id: str, data) -> None:
        path = self._path(id)
        parent = path.rsplit("/", 1)[0]
        self.fs.create_dir(parent, recursive=True)
        payload = data.encode() if isinstance(data, str) else bytes(data)
        with self.fs.open_output_stream(path) as f:
            f.write(payload)

    def exists(self, id: str) -> bool:
        from pyarrow import fs as pafs

        return self.fs.get_file_info(self._path(id)).type != pafs.FileType.NotFound

    def max_file_idx(self) -> int:
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(self.base, recursive=True, allow_not_found=True)
        return sum(1 for i in self.fs.get_file_info(sel)
                   if i.type == pafs.FileType.File)


SINK_REGISTRY = {
    "FileSystem": FileSystemSink,
    "ParquetDir": ParquetDirSink,
    # columnar corpus format scope: Lance when the package is available,
    # parquet otherwise — same logical schema, same sink class (the
    # in-sandbox TESTED format is parquet; see SURVEY §1.4 note)
    "Lance": ParquetDirSink,
    "GoogleStorage": CloudStorageSink,  # reference class-name resolution
    "CloudStorage": CloudStorageSink,
}


def resolve_sink(config):
    """Reference-style sink resolution (crawler.py:91-117): an instance
    passes through; a dict {"backend": name-or-dotted-path, "root_dir": ...}
    resolves from the registry, then by dotted module path."""
    if isinstance(config, (BaseSink, ParquetDirSink)):
        return config
    if not isinstance(config, dict):
        raise TypeError('"storage" must be a sink instance or a dict')
    backend = config.get("backend", "ParquetDir")
    kwargs = {k: v for k, v in config.items() if k != "backend"}
    if backend in SINK_REGISTRY:
        return SINK_REGISTRY[backend](**kwargs)
    if "." in backend:
        mod, cls = backend.rsplit(".", 1)
        return getattr(importlib.import_module(mod), cls)(**kwargs)
    raise ValueError(f"unknown storage backend: {backend}")


def write_results(ds, sink: ParquetDirSink, partition: str) -> int:
    """Write a results Dataset to one sink partition; returns rows written."""
    import ray

    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return 0
    t = pa.concat_tables(tables)
    sink.write_table(t, partition)
    return t.num_rows
