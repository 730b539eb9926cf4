"""Source-fingerprint manifests for on-disk derived artifacts.

Every cache under ``/root/repo/data`` that is derived from another
parquet file (staged file-stream dirs, the materialized ANN store, the
postings catalogs, the docstore, the demo stream) used to key
freshness on the mere EXISTENCE of its own output (a sentinel file,
``meta.json``, a ``_READY`` marker). If a source file is regenerated
in place — e.g. the driver rewrites ``events.parquet`` between rounds
— those caches silently replay stale data behind a stale marker and
diverge from their batch twins / oracles.

The guard here records each source's ``(size, mtime_ns)`` next to the
staged output and wipes + restages whenever the recorded fingerprint
no longer matches the live file: the make-style freshness rule, chosen
over content hashing so the check stays O(1) at 100 TB source sizes.
Crash-safe by construction — the manifest is written LAST (atomic
rename), so an interrupted staging leaves no manifest and the next
call restages from scratch.

The manifest filename starts with ``_`` so Spark's file sources treat
it as hidden metadata and never read it as stream data.

Usage::

    if not staged_from(d, src, extra={"gap": gap_minutes}):
        ...write files into d...
        commit_staged(d)
"""

from __future__ import annotations

import json
import os
import shutil

MANIFEST = "_staged_manifest.json"

# fingerprints captured by staged_from, consumed by commit_staged, so
# the committed manifest always reflects the sources AS THEY WERE when
# staging began (a source rewritten mid-staging fails the next check)
_pending: dict[str, dict] = {}


def _fingerprint(sources: tuple[str, ...], extra) -> dict:
    fps = {}
    for s in sources:
        st = os.stat(s)
        fps[os.path.abspath(s)] = {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
    return {"sources": fps, "extra": extra}


def staged_from(d: str, *sources: str, extra=None) -> bool:
    """True if ``d`` already holds output staged from the CURRENT
    ``sources`` (manifest matches size+mtime of every source, plus the
    caller's ``extra`` parameters). Otherwise wipes ``d``, recreates it
    empty, and returns False — the caller restages into it and finishes
    with :func:`commit_staged`."""
    want = _fingerprint(sources, extra)
    try:
        with open(os.path.join(d, MANIFEST)) as f:
            if json.load(f) == want:
                return True
    except (OSError, ValueError):
        pass
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    _pending[d] = want
    return False


def commit_staged(d: str) -> None:
    """Atomically write the manifest captured by the matching
    :func:`staged_from` call, marking ``d`` fresh."""
    want = _pending.pop(d)
    tmp = os.path.join(d, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(want, f, sort_keys=True)
    os.replace(tmp, os.path.join(d, MANIFEST))
