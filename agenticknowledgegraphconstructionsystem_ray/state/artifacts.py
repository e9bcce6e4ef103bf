"""Shared source-fingerprint helper for persisted artifact caches.

Every persisted layout under /tmp (ANN index, BPE merge table, SMB
buckets, link table, full-text index) records a contract in its _DONE
marker; the contract must include the *identity of the source data* so a
regenerated or swapped corpus at the same cache root invalidates the
artifact instead of silently serving stale results. This module is the
one implementation of that identity — the (abspath, size, mtime_ns)
scheme `stages/annindex.py` introduced, generalized to file sets and
hashed to a fixed-size digest so contracts stay O(1) regardless of how
many files the source spans (a 100-TB corpus is tens of thousands of
shards; the digest is computed from the same directory listing the read
already performs).

Reference parity: the reference tracks processed inputs in a Postgres
ledger keyed by content identity (db_init.py:150-159,
agents/src/database.ts:66-81); here the same contract is carried by the
artifact marker itself.
"""

from __future__ import annotations

import glob
import hashlib
import os


def source_fingerprint(*paths: str, pattern: str = "*.parquet") -> str:
    """Compact identity of a set of source files: sha1 over the sorted
    (abspath, size, mtime_ns) triples. Each path may be a file or a
    directory (fingerprints the ``pattern`` files inside). A missing path
    raises — a vanished source is an error, never an empty fingerprint
    (which would collide with a genuinely empty source)."""
    files: list[str] = []
    for p in paths:
        p = os.path.abspath(p)
        if os.path.isdir(p):
            files.extend(glob.glob(os.path.join(p, pattern)))
        else:
            os.stat(p)  # raise FileNotFoundError on a vanished source
            files.append(p)
    triples = []
    for f in sorted(files):
        st = os.stat(f)
        triples.append((f, st.st_size, st.st_mtime_ns))
    return hashlib.sha1(repr(triples).encode()).hexdigest()
