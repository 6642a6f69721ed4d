"""Object-store filesystem layer for the TileDirectory sidecars.

The reference driver reads and writes its zarr archives through
fsspec/FSStore, so ``s3://…`` paths work end to end
(``/root/reference/mapchete_xarray/_output.py:21,253,377``; S3 tests
``tests/test_driver.py:74-96``).  fsspec isn't in this sandbox, so the
equivalent here is ``pyarrow.fs`` — the same URI-dispatch surface
(``file://``, ``s3://``, HDFS…) with one behavioral contract:

- **Sidecar I/O** (metadata.json, manifest existence probes, overwrite
  truncation) goes through the resolved ``pyarrow.fs.FileSystem`` —
  never ``os.*`` — so any URI pyarrow can dial works.
- **Bulk I/O** (tile rows, manifest parquet) goes through Spark, which
  resolves the SAME URI via Hadoop (on a real cluster ``s3a://`` with
  hadoop-aws on the classpath; locally bare paths or ``file://``).

An explicit ``filesystem`` can be injected (e.g. pyarrow's in-memory
mock) for tests or exotic stores; then ``path`` is interpreted inside
that filesystem.
"""

from __future__ import annotations

from pyarrow import fs as pafs


def join(base: str, *parts: str) -> str:
    """Object-store-style path join (always '/'; no os.path)."""
    out = base.rstrip("/")
    for p in parts:
        out = f"{out}/{p.strip('/')}"
    return out


def resolve(path: str, filesystem: pafs.FileSystem | None = None):
    """path/URI → (FileSystem, in-filesystem path).

    Bare paths resolve to the local filesystem; URIs dispatch on
    scheme via ``pyarrow.fs.FileSystem.from_uri`` (s3://, file://,
    hdfs://, …)."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def exists(fs: pafs.FileSystem, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def mkdirs(fs: pafs.FileSystem, path: str) -> None:
    fs.create_dir(path, recursive=True)


def delete_tree(fs: pafs.FileSystem, path: str) -> None:
    if exists(fs, path):
        fs.delete_dir(path)


def read_text(fs: pafs.FileSystem, path: str) -> str:
    with fs.open_input_stream(path) as f:
        return f.read().decode("utf-8")


def write_text(fs: pafs.FileSystem, path: str, text: str) -> None:
    with fs.open_output_stream(path) as f:
        f.write(text.encode("utf-8"))


def has_files(
    fs: pafs.FileSystem, path: str, suffix: str = ".parquet", recursive: bool = False
) -> bool:
    """Any regular file under ``path`` with ``suffix``?  One listing
    call (object stores bill per request, not per byte)."""
    sel = pafs.FileSelector(path, recursive=recursive, allow_not_found=True)
    return any(
        fi.type == pafs.FileType.File and fi.path.endswith(suffix)
        for fi in fs.get_file_info(sel)
    )
