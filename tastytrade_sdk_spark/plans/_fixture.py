"""Repo-local, code-versioned on-disk fixture cache for search-only
[Q]s (persisted index fixtures: k-NN graph, BM25 postings).

A search-only query prices the steady-state serving path, so its index
must be built OUTSIDE the timed run — but a cached index is only
honest if it can never go stale or be tampered with. The r10 advisor
found both failure modes in the first cut (tempdir cache keyed on data
fingerprint + literal params only): (a) a builder-code change silently
served an index built by the OLD algorithm, surfacing as a confusing
oracle hash-mismatch much later; (b) ``tempfile.gettempdir()`` is
world-writable and shared, so another local user could plant a
poisoned index at a predictable path; (c) unsorted ``os.walk`` order
could churn the key across runs.

This helper closes all three:

- the cache lives under the REPO (``<repo>/.fixture_cache/``,
  gitignored), not the global tempdir;
- the key folds in a CODE VERSION — the md5 of every builder module's
  source bytes — so editing the builder invalidates every index it
  ever built;
- data files are enumerated with sorted ``os.walk`` and keyed by
  relative path + size + mtime_ns, so the fingerprint is stable for
  unchanged data and changes whenever the corpus is rewritten.

Concurrency: builders stage under a pid-unique sibling and install
with one atomic ``os.rename``; losing the race to another process
means a byte-identical index (deterministic builders) is already in
place — use theirs.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Callable

_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".fixture_cache"
)


def _data_fingerprint(path: str) -> str:
    """size+mtime fingerprint of a file or directory tree (sorted
    walk — directory enumeration order must not churn the key)."""
    path = os.path.realpath(path)
    parts = [path]
    if os.path.isdir(path):
        for root, dirs, files in sorted(os.walk(path)):
            dirs.sort()
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                rel = os.path.relpath(os.path.join(root, f), path)
                parts.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
    else:
        st = os.stat(path)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def _code_version(modules) -> str:
    """md5 over the builder modules' SOURCE BYTES — any edit to the
    construction code invalidates every fixture it built."""
    h = hashlib.md5()
    for mod in modules:
        with open(mod.__file__, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def fixture_index(
    kind: str,
    data_paths: list[str],
    params: str,
    code_modules: list,
    build: Callable[[str], None],
    readable: Callable[[str], object],
) -> str:
    """Return the path of a cached index fixture, building it once.

    ``build(staging_path)`` constructs the index at the given path;
    ``readable(path)`` returns a truthy value iff a complete index
    exists there (e.g. streaming.sinks.readable_store_path).
    """
    key = hashlib.md5(
        "|".join(
            [
                kind,
                *[_data_fingerprint(p) for p in data_paths],
                params,
                _code_version(code_modules),
            ]
        ).encode()
    ).hexdigest()
    index = os.path.join(_CACHE_ROOT, kind, key, "index")
    if readable(index) is not None:
        return index
    os.makedirs(os.path.dirname(index), exist_ok=True)
    staging = f"{index}.__build-{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    build(staging)
    try:
        os.rename(staging, index)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if readable(index) is None:
            raise
    return index
