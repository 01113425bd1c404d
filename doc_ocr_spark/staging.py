"""Staging root + content-keyed cache for materialized tables.

Several operators materialize an intermediate table once per corpus and
re-read it across runs (curation signals, LSH pair list, media corpus,
stream source dirs).  Round-3 review flagged the original implementation
as a cluster scale-killer: the paths were hard-coded under ``/tmp``
(driver-local — invisible to executors the moment the job leaves
``local[*]``) and the cache keys used POSIX ``mtime`` (meaningless on
object stores) without folding in the upstream constants that shape the
tables' contents.  This module centralizes the fix:

- :func:`stage_root` resolves the staging directory once:
  ``SPARK_GRAFT_STAGE_DIR`` (on a cluster, point this at a shared
  filesystem or object-store mount that every executor can read) →
  ``XDG_CACHE_HOME/doc_ocr_spark`` → ``<tempdir>/doc_ocr_spark_stage_<uid>``.
  The uid suffix keeps a world-writable tempdir from being pre-created
  (or pre-planted with parquet) by another local user.
- :func:`content_key` builds the cache key from EVERY input that shapes
  the staged bytes: the source files' content fingerprint (size + a
  digest of head/tail bytes — not mtime) and the full tuple of upstream
  constants / generating-SQL strings, so changing a threshold or a
  shingle definition invalidates the cache without a manual version
  bump.
- :func:`ensure_staged` publishes atomically (build into a ``.tmp-*``
  sibling, ``os.rename``; the loser of a race cleans up) and sweeps
  stale ``.tmp-*`` leftovers from crashed builds.

Reference tie-in: the staged tables play the role of doc-ocr's
in-process caches (template registry, app.state singletons —
app/core/lifespan.py) lifted to a multi-process engine, where "cache"
must mean "table on shared storage", not "driver memory".
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time
from collections.abc import Callable

_FP_BYTES = 64 * 1024  # head+tail bytes digested per file
_TMP_STALE_S = 3600  # sweep .tmp- leftovers older than this


def stage_root() -> str:
    """Resolve (and create) the staging root directory."""
    root = os.environ.get("SPARK_GRAFT_STAGE_DIR")
    if not root:
        xdg = os.environ.get("XDG_CACHE_HOME")
        if xdg:
            root = os.path.join(xdg, "doc_ocr_spark")
        else:
            # world-writable tempdir fallback: the uid suffix alone is
            # NOT a defense (ADVICE r04 — any local user can pre-create
            # /tmp/doc_ocr_spark_stage_<victim_uid> and pre-plant
            # parquet), so mirror tempfile.mkdtemp's hardening: create
            # private (0o700) and refuse a directory we don't own.
            uid = os.getuid() if hasattr(os, "getuid") else 0
            root = os.path.join(
                tempfile.gettempdir(), f"doc_ocr_spark_stage_{uid}"
            )
            os.makedirs(root, mode=0o700, exist_ok=True)
            # lstat + islink (ADVICE r05): os.stat follows symlinks, so
            # a pre-planted link to a victim-owned writable directory
            # passed the ownership check; and makedirs' mode only
            # applies at creation, so re-chmod a pre-existing dir to
            # 0o700 — the full tempfile.mkdtemp discipline.
            if os.path.islink(root):
                raise RuntimeError(
                    f"staging fallback {root} is a symlink "
                    "(pre-planted?); set SPARK_GRAFT_STAGE_DIR or "
                    "XDG_CACHE_HOME to a directory you control"
                )
            st = os.lstat(root)
            if hasattr(os, "getuid") and st.st_uid != os.getuid():
                raise RuntimeError(
                    f"staging fallback {root} is owned by another user "
                    "(pre-planted?); set SPARK_GRAFT_STAGE_DIR or "
                    "XDG_CACHE_HOME to a directory you control"
                )
            if (st.st_mode & 0o777) != 0o700:
                os.chmod(root, 0o700)
            return root
    os.makedirs(root, exist_ok=True)
    return root


def file_fingerprint(path: str) -> str:
    """Content fingerprint of a data file or a directory of data files:
    per file ``name:size:md5(first 64 KiB + last 64 KiB)``.

    Replaces mtime keys: identical bytes at a new mtime (corpus re-sync,
    object-store copy) hit the cache; changed bytes at the same mtime
    (clock-skewed writers) miss it.  Parquet puts the schema + row-group
    index in the footer, so the tail digest alone catches any rewrite;
    the head digest additionally covers the first row group's data pages.
    """
    path = os.path.realpath(path)
    if os.path.isdir(path):
        # Recurse into subdirectories (ADVICE r04): a partitioned layout
        # (bucket=N/ subdirs) must contribute its nested data files to
        # the key, or a changed corpus silently hits a stale staged
        # table — the exact cache-poisoning failure this module exists
        # to prevent.  The subdir NAME is folded too (partition values
        # are data).
        parts = []
        for entry in sorted(os.scandir(path), key=lambda e: e.name):
            if entry.name.startswith((".", "_")):
                continue
            if entry.is_dir(follow_symlinks=False):
                parts.append(f"{entry.name}/{file_fingerprint(entry.path)}")
            elif entry.is_file():
                parts.append(file_fingerprint(entry.path))
        return "d:" + hashlib.md5("|".join(parts).encode()).hexdigest()
    # OSError (missing file, transient stat failure) PROPAGATES: a
    # content-independent fallback token would make the key stable
    # across corpus changes — fail loudly instead (ADVICE r04).
    size = os.path.getsize(path)
    h = hashlib.md5()
    with open(path, "rb") as f:
        h.update(f.read(_FP_BYTES))
        if size > _FP_BYTES:
            f.seek(max(_FP_BYTES, size - _FP_BYTES))
            h.update(f.read(_FP_BYTES))
    return f"{os.path.basename(path)}:{size}:{h.hexdigest()}"


def content_key(*parts: object) -> str:
    """16-hex cache key over an ordered tuple of key parts (constants,
    generating-SQL strings, file fingerprints).  Callers pass every
    upstream value whose change must invalidate the staged table."""
    blob = "\x1f".join(str(p) for p in parts)
    return hashlib.md5(blob.encode()).hexdigest()[:16]


def _sweep_stale_tmp(group_dir: str) -> None:
    """Remove crashed builds' ``.tmp-*`` leftovers (age-gated so an
    in-flight concurrent build is never swept)."""
    try:
        entries = list(os.scandir(group_dir))
    except OSError:
        return
    now = time.time()
    for e in entries:
        if ".tmp-" in e.name:
            try:
                if now - e.stat().st_mtime > _TMP_STALE_S:
                    if e.is_dir():
                        shutil.rmtree(e.path, ignore_errors=True)
                    else:
                        os.remove(e.path)
            except OSError:
                pass


def staged_path(group: str, key: str, suffix: str = ".parquet") -> str:
    """Path (existing or not) of a staged table in ``group``."""
    d = os.path.join(stage_root(), group)
    return os.path.join(d, f"{key}{suffix}")


def ensure_staged(
    group: str,
    key: str,
    build: Callable[[str], None],
    suffix: str = ".parquet",
) -> str:
    """Return the staged path, building it atomically if absent.

    ``build(tmp_path)`` must create ``tmp_path`` (file or directory);
    it is then renamed into place.  A concurrent loser's rename fails
    and its tmp is discarded — readers only ever see complete tables.
    """
    path = staged_path(group, key, suffix)
    if not os.path.exists(path):
        group_dir = os.path.dirname(path)
        os.makedirs(group_dir, exist_ok=True)
        _sweep_stale_tmp(group_dir)
        # pid + uuid: two THREADS of one process in the same millisecond
        # must not share a tmp dir (caught by the concurrent-builders
        # test — a time-based suffix collided)
        import uuid

        tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        build(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    return path
