"""Shared-state helpers: union-find for entity canonicalization, lineage
manifests for resumable execution (the reference's ``extraction_logs`` analog,
``/root/reference/db_init.py:150-159``)."""
