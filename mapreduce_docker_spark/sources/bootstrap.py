"""Corpus bootstrap: fetch + unzip + enumerate (SURVEY §2 S1-S3 [REF]).

Reproduces the reference's ``download()`` (coordinator.py:20-44): fetch an
archive URL if the corpus directory is empty, extract it, and return the
sorted file list. Deliberately OUT of the query engine — it is one-time
driver-side staging, not a distributed operator (SURVEY S1) — but the
semantics are reference-exact and tested (via ``file://`` URLs, since the
build container has no network):

* skip the fetch entirely when the corpus dir already has files (the
  reference's cache check, coordinator.py:26-31);
* zip members are extracted flat into the corpus dir;
* returns ``sorted(glob)`` — the reference's deterministic scan order
  (coordinator.py:42), which `spark.read.text` then parallelizes.

At real scale this step disappears: data already sits on the object store
and the FileIndex does the enumeration.
"""

from __future__ import annotations

import glob
import os
import urllib.request
import zipfile


def fetch_corpus(url: str, dest_dir: str) -> list[str]:
    """Ensure ``dest_dir`` holds the corpus named by ``url``; return files.

    Idempotent: an already-populated directory short-circuits the fetch.
    Supports ``.zip`` archives and plain files; any URL scheme urllib
    handles (``file://`` in tests).
    """
    os.makedirs(dest_dir, exist_ok=True)
    existing = sorted(
        p for p in glob.glob(os.path.join(dest_dir, "*")) if os.path.isfile(p)
    )
    if existing:
        return existing

    name = url.rstrip("/").rsplit("/", 1)[-1] or "corpus"
    staged = os.path.join(dest_dir, name)
    with urllib.request.urlopen(url) as resp, open(staged, "wb") as out:
        while chunk := resp.read(1 << 20):
            out.write(chunk)

    if zipfile.is_zipfile(staged):
        with zipfile.ZipFile(staged) as zf:
            for member in zf.namelist():
                base = os.path.basename(member)
                if not base:
                    continue  # directory entry
                with zf.open(member) as src, open(
                    os.path.join(dest_dir, base), "wb"
                ) as dst:
                    dst.write(src.read())
        os.remove(staged)

    return sorted(
        p for p in glob.glob(os.path.join(dest_dir, "*")) if os.path.isfile(p)
    )
