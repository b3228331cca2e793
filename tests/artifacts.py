"""Shared machine-readable evidence-artifact writer (SOAK/INGEST).

One merge-and-atomically-write helper so the artifact formats cannot
silently diverge: load the existing JSON document (or start empty),
stamp the record with UTC time, replace the section under ``key``, and
atomically swap the file into place.
"""

import json
import os
import time


def artifact_path(env_var: str, default_name: str) -> str:
    """Resolve an artifact path: ``env_var`` override or repo root."""
    return os.environ.get(
        env_var,
        os.path.join(os.path.dirname(__file__), "..", default_name))


def record_artifact(path: str, key: str, rec: dict) -> None:
    import fcntl

    path = os.path.abspath(path)
    # flock across the read-modify-replace so concurrent gate runs
    # (pytest-xdist, an overlapping manual run) cannot drop each
    # other's sections
    lock = open(path + ".lock", "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            with open(path) as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            doc = {}
        rec["time_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                        time.gmtime())
        doc[key] = rec
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
        os.replace(tmp, path)
    finally:
        lock.close()
