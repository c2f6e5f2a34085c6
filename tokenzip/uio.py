"""URI-aware storage IO (the multi-node storage contract).

Every persistent artifact the engine owns — the chunk sink, the resume
manifest, the shared-symbol sidecar (symbols.json), and the packing offset
sidecar — accepts either a local directory (the default, unchanged) or a
``scheme://`` URI resolved through ``pyarrow.fs.FileSystem.from_uri``
(s3://, gs://, hdfs://, ...). Parquet payloads already ride Arrow/Ray URI
support; this module covers the small JSON/listing/cleanup operations that
would otherwise assume a shared local /tmp.

Node-LOCAL scratch stays local on purpose and is env-parameterized instead:
the compiled-kernel cache (``TOKENZIP_NATIVE_DIR``, content+CPU addressed,
per node) and the synthetic benchmark corpus (``/tmp/tokenzip_corpus``,
regenerated deterministically per node).
"""

from __future__ import annotations

import os


def is_uri(path: str) -> bool:
    return "://" in path


# scheme -> pyarrow FileSystem instance. Normally empty (from_uri resolves
# s3://, gs://, hdfs://, file:// natively); tests and embedders register
# custom schemes here — e.g. mock:// onto pyarrow's in-memory
# _MockFileSystem, which is how the remote-storage contract is proven
# without network access (tests/test_uio.py).
_FS_REGISTRY: dict[str, object] = {}


def register_filesystem(scheme: str, fs) -> None:
    _FS_REGISTRY[scheme] = fs


def _fs(path: str):
    scheme, _, rest = path.partition("://")
    if scheme in _FS_REGISTRY:
        return _FS_REGISTRY[scheme], rest
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def read_bytes(path: str) -> bytes:
    if not is_uri(path):
        with open(path, "rb") as f:
            return f.read()
    fs, p = _fs(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def write_bytes_atomic(path: str, data: bytes) -> None:
    """Local writes are tmp+rename atomic; URI writes rely on the store's
    single-PUT atomicity (object stores never expose partial objects)."""
    if not is_uri(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return
    fs, p = _fs(path)
    parent = os.path.dirname(p)
    if parent:
        # object stores treat this as a no-op; file:// and hdfs:// need the
        # parent to exist before open_output_stream
        fs.create_dir(parent, recursive=True)
    with fs.open_output_stream(p) as f:
        f.write(data)


def exists(path: str) -> bool:
    if not is_uri(path):
        return os.path.exists(path)
    from pyarrow import fs as pafs

    fs, p = _fs(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def isdir(path: str) -> bool:
    if not is_uri(path):
        return os.path.isdir(path)
    from pyarrow import fs as pafs

    fs, p = _fs(path)
    return fs.get_file_info(p).type == pafs.FileType.Directory


def rmtree(path: str) -> None:
    if not is_uri(path):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        return
    fs, p = _fs(path)
    try:
        fs.delete_dir(p)
    except FileNotFoundError:
        pass


def listdir(path: str) -> list[str]:
    """Immediate child names (base names) of a directory; [] if absent."""
    if not is_uri(path):
        return os.listdir(path) if os.path.isdir(path) else []
    from pyarrow import fs as pafs

    fs, p = _fs(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except FileNotFoundError:
        return []
    return [i.base_name for i in infos]


def walk_files(path: str) -> list[tuple[str, int]]:
    """All (full_path, size) files under a directory tree; [] if absent.
    Full paths keep the caller's scheme so they feed straight back into
    read_parquet."""
    if not is_uri(path):
        out = []
        for r, _, fnames in os.walk(path):
            for f in fnames:
                fp = os.path.join(r, f)
                out.append((fp, os.path.getsize(fp)))
        return out
    from pyarrow import fs as pafs

    fs, p = _fs(path)
    scheme = path.split("://", 1)[0]
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=True))
    except FileNotFoundError:
        return []
    return [
        (f"{scheme}://{i.path}", int(i.size or 0))
        for i in infos
        if i.type == pafs.FileType.File
    ]


def file_size(path: str) -> int:
    if not is_uri(path):
        return os.path.getsize(path)
    fs, p = _fs(path)
    return int(fs.get_file_info(p).size or 0)


def join(base: str, *parts: str) -> str:
    """Path join that keeps URI schemes intact (os.path.join is fine for
    both cases on posix; kept as one named spot for the contract)."""
    return os.path.join(base, *parts)
