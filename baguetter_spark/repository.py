"""Named-index repository over any Hadoop-compatible filesystem.

Reference surface: baguetter persists indexes to the Hugging Face Hub
through an fsspec file repository (``utils/file_repository.py:16-125``)
and the ``HubPersistable`` mixin's ``push_to_hub`` / ``load_from_hub``
(``utils/persistable.py:96-165``) — i.e. "a remote place indexes live,
addressed by (repo_id, path)".

Spark's native equivalent of a remote file repository is a Hadoop
FileSystem URI — ``s3a://bucket/prefix``, ``hdfs://nn/path``,
``gs://bucket/prefix``, ``file:/dir`` — so this repository is a thin
catalog over ``<base_uri>/<name>`` index directories:

* every executor on every cluster with the URI can already read a pushed
  index directly (parquet row-group pruning keeps working over object
  stores) — there is no separate download step, unlike hub snapshots;
* pushes stay atomic the same way ``io.save_index`` is: the manifest is
  written LAST, so a half-pushed index is simply not listed.

The HF Hub backend itself needs network + hub credentials (absent in
this sandbox — the documented S6 gap); on a real deployment either point
``base_uri`` at an object store, or mount the hub as a Hadoop-compatible
filesystem and this class works unchanged.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

from pyspark.sql import SparkSession

from baguetter_spark.io import MANIFEST_NAME, load_index, save_index
from baguetter_spark.operators.indexer import BM25Index

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._\-]*$")


# ---------------------------------------------------------------------------
# Hadoop FileSystem helpers (py4j; no Python-side fs dependency).  These are
# driver-side control-plane calls (one manifest / listing per push or pull),
# never in the data path — tables move through Spark's own parquet IO.
# ---------------------------------------------------------------------------


def _fs_and_path(spark: SparkSession, uri: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    juri = jvm.java.net.URI(uri)
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(juri, conf)
    return fs, jvm.org.apache.hadoop.fs.Path(uri), jvm


def hadoop_write_text(spark: SparkSession, uri: str, text: str) -> None:
    """Atomic small-text write: create ``uri.tmp`` then rename over ``uri``.

    On object stores without atomic rename the manifest is still the LAST
    thing written, which is the property save_index's crash contract needs.
    """
    fs, path, jvm = _fs_and_path(spark, uri)
    tmp = jvm.org.apache.hadoop.fs.Path(uri + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(path):
        fs.delete(path, False)
    # Hadoop FileSystem.rename reports failure as False, not an exception
    # (e.g. tmp swept, destination-parent race on an object store); a silent
    # False here would return success with no manifest on disk
    if not fs.rename(tmp, path):
        msg = f"manifest rename failed: {uri}.tmp -> {uri}"
        raise IOError(msg)


def hadoop_read_text(spark: SparkSession, uri: str) -> str | None:
    """Read a small text file; None when it does not exist."""
    fs, path, jvm = _fs_and_path(spark, uri)
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    baos = jvm.java.io.ByteArrayOutputStream()
    # hadoop's own IOUtils (always on Spark's classpath); closes both streams
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return bytes(baos.toByteArray()).decode("utf-8")


def _list_dirs(spark: SparkSession, uri: str) -> list[str]:
    fs, path, _ = _fs_and_path(spark, uri)
    if not fs.exists(path):
        return []
    out = []
    for status in fs.listStatus(path):
        if status.isDirectory():
            out.append(status.getPath().getName())
    return out


# ---------------------------------------------------------------------------


@dataclass
class IndexRepository:
    """Catalog of named BM25 indexes under one filesystem URI.

    ``base_uri`` may be any Hadoop FS URI; a scheme-less local path is
    normalized to ``file:`` so the same code path serves tests and object
    stores.  Mirrors the reference's repository surface: push (save to the
    repository), pull (load from it), exists / list / delete.
    """

    spark: SparkSession
    base_uri: str
    fmt: str = "parquet"

    def __post_init__(self) -> None:
        from baguetter_spark.io import _has_fs_scheme

        if not _has_fs_scheme(self.base_uri):
            self.base_uri = "file:" + os.path.abspath(self.base_uri)
        self.base_uri = self.base_uri.rstrip("/")

    # ------------------------------------------------------------- addressing
    def index_uri(self, name: str) -> str:
        if not _NAME_RE.match(name):
            msg = (
                f"invalid index name {name!r}: use letters/digits/._- "
                "(it becomes a filesystem directory name)"
            )
            raise ValueError(msg)
        return f"{self.base_uri}/{name}"

    # ---------------------------------------------------------------- surface
    def push(self, index: BM25Index, name: str) -> str:
        """Save ``index`` into the repository (reference push_to_hub,
        ``utils/persistable.py:131-165``).  Returns the index URI."""
        uri = self.index_uri(name)
        save_index(index, uri, fmt=self.fmt)
        return uri

    def pull(self, name: str) -> BM25Index:
        """Load a named index (reference load_from_hub,
        ``utils/persistable.py:97-129``).  Tables stay lazy DataFrames —
        nothing is downloaded; executors scan the repository directly."""
        return load_index(self.spark, self.index_uri(name), fmt=self.fmt)

    def exists(self, name: str) -> bool:
        from baguetter_spark.io import read_manifest

        manifest = read_manifest(self.index_uri(name), spark=self.spark)
        return bool(manifest) and manifest.get("status") == "SUCCESS"

    def list_indexes(self) -> list[str]:
        """Names of completed (manifest = SUCCESS) indexes, sorted.

        One manifest read per directory is unavoidable (SUCCESS lives in
        the manifest body), but on an object store each read is a
        high-latency round-trip — so they run concurrently (py4j calls
        are thread-safe), bounding catalog latency by the slowest read
        instead of the sum."""
        from concurrent.futures import ThreadPoolExecutor

        names = _list_dirs(self.spark, self.base_uri)
        if not names:
            return []
        with ThreadPoolExecutor(max_workers=min(16, len(names))) as ex:
            flags = list(ex.map(self.exists, names))
        return sorted(n for n, ok in zip(names, flags) if ok)

    def delete(self, name: str) -> bool:
        """Remove a named index; False when it was not present."""
        fs, path, _ = _fs_and_path(self.spark, self.index_uri(name))
        if not fs.exists(path):
            return False
        return bool(fs.delete(path, True))

    def manifest(self, name: str) -> dict | None:
        from baguetter_spark.io import read_manifest

        return read_manifest(self.index_uri(name), spark=self.spark)


MANIFEST = MANIFEST_NAME  # re-export for callers inspecting repo layouts
