"""End-to-end reference text flow: corpus dir -> word counts -> TSV sink.

The complete production behavior of the reference system (download/glob ->
chunked scan -> map/combine/merge -> full sort -> TSV; coordinator.py:42-134)
as one engine flow over real files, with the fox/dog golden from the
reference's own test fixture (test_mapreduce.py:47-50).
"""

from __future__ import annotations

import csv
import glob
import os

from mapreduce_docker_spark.operators import wordcount as wc
from mapreduce_docker_spark.sources.text import format_topk, read_text_corpus, write_tsv


def test_corpus_to_tsv_reference_flow(spark, tmp_path):
    src = tmp_path / "txt"
    os.makedirs(src)
    (src / "a.txt").write_text("The quick brown fox jumps over the lazy dog.\n")
    (src / "b.txt").write_text("The dog was really lazy, but the fox was quick!\n")

    lines = read_text_corpus(spark, str(src))
    ranked = wc.ranked(wc.word_counts(lines, "value"))
    out = str(tmp_path / "word_counts_tsv")
    write_tsv(ranked, out)

    parts = glob.glob(os.path.join(out, "part-*"))
    assert len(parts) == 1, "single_file=True must produce one part file"
    with open(parts[0]) as fh:
        rows = [(w, int(c)) for w, c in csv.reader(fh, delimiter="\t")]

    assert rows[0] == ("the", 4)
    assert dict(rows) == {
        "the": 4, "lazy": 2, "quick": 2, "fox": 2, "dog": 2, "was": 2,
        "brown": 1, "jumps": 1, "over": 1, "really": 1, "but": 1,
    }
    # frequency-descending with word-asc tiebreak, all the way down
    keys = [(-c, w) for w, c in rows]
    assert keys == sorted(keys)
    # console sink renders the same head
    text = format_topk(rows, k=3)
    assert text.splitlines()[0].startswith("   1. the")
