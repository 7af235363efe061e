"""Dedup pipelines: exact, minhash, simhash, ngram-jaccard vs brute force."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from h3ray.text import dedup


@pytest.fixture(scope="module")
def corpus():
    """Synthetic docs with planted near-duplicate groups."""
    rng = np.random.default_rng(11)
    words = [f"w{i:03d}" for i in range(300)]
    docs = []
    for i in range(60):
        docs.append(" ".join(rng.choice(words, 40)))
    # Plant near-dups: copies with 1-2 word edits.
    for base in (3, 17, 42):
        toks = docs[base].split()
        toks[5] = "edited"
        docs.append(" ".join(toks))
    # And exact dups.
    docs.append(docs[7])
    ids = np.arange(len(docs))
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(docs)], names=["doc_id", "text"])


def test_simhash_pairs_vs_bruteforce(ray_session, corpus):
    ds = rd.from_arrow(corpus)
    out = dedup.simhash_duplicate_pairs(ds, key_col="doc_id",
                                        max_hamming=3).to_pandas()
    got = set(zip(out.key_a, out.key_b))

    sh = dedup.simhash_batch(corpus["text"].to_pylist())
    n = sh.shape[0]
    exp = set()
    for i in range(n):
        for j in range(i + 1, n):
            if bin(int(sh[i]) ^ int(sh[j])).count("1") <= 3:
                exp.add((i, j))
    assert got == exp
    assert (7, 63) in got  # exact dup has Hamming 0
    assert len(exp) >= 2


def test_ngram_jaccard_pairs_verified(ray_session, corpus):
    ds = rd.from_arrow(corpus)
    out = dedup.ngram_jaccard_pairs(ds, key_col="doc_id",
                                    threshold=0.5).to_pandas()
    got = set(zip(out.key_a, out.key_b))
    texts = corpus["text"].to_pylist()
    # All reported pairs truly exceed the threshold (no false positives).
    for a, b in got:
        assert dedup.ngram_jaccard(texts[a], texts[b]) >= 0.5
    # The planted near-identical pairs must appear (LSH recall on
    # 0.95+-similar docs is ~1).
    for base, dup in ((3, 60), (17, 61), (42, 62)):
        assert (base, dup) in got
    assert (7, 63) in got  # exact dup


def test_exact_dedup_counts(ray_session, corpus):
    ds = rd.from_arrow(corpus)
    out = dedup.exact_dedup(ds, key_col="doc_id").to_pandas()
    texts = corpus["text"].to_pylist()
    assert len(out) == len(set(texts))
    # Survivor of the duplicated text is the min doc_id.
    assert 7 in set(out.doc_id) and 63 not in set(out.doc_id)
