"""Round-6 MinHash signature kernel: bit-parity with the reference
formula sig[i] = min over distinct crc32(shingle) of (a_i*h+b_i) mod p,
including the JVM tokenization corners the kernel must mirror (trim
strips 0x20 only; Java split('\\s+', -1) keeps a leading empty token
and trailing empties; ASCII \\s class), NULL-text row dropping, and
string-id corpora (the incremental-index shape)."""

import re
import zlib

import pytest

from scylla_cdc_java_spark.datapipe.dedup import (
    MERSENNE,
    _perm_params,
    minhash_signatures,
)

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _expected_sig(text, k=3, num_hashes=64, seed=42):
    toks = _WS.split(text.strip(" "))
    n = len(toks)
    if n < k:
        toks = toks + [""] * (k - n)
    hs = {zlib.crc32(" ".join(toks[i:i + k]).encode("utf-8"))
          for i in range(max(n - k + 1, 1))}
    a, b = _perm_params(num_hashes, seed)
    return tuple(
        min((int(ai) * h + int(bi)) % MERSENNE for h in hs)
        for ai, bi in zip(a, b)
    )


EDGE_TEXTS = [
    "", " ", "a", "a b", "a b c", "a b c d e",
    "  leading and trailing  ", "tab\tsep\ttokens", "line\nbreaks\nhere",
    "\tleads with tab", "ends with tab\t", "a\x0bb\x0cc\rd",
    "unicode café naïve 中文 words", "dup dup dup dup dup", "x " * 200,
]


def test_kernel_matches_reference_formula(spark):
    rows = [(i, t) for i, t in enumerate(EDGE_TEXTS)] + [(99, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: tuple(r["sig"])
           for r in minhash_signatures(docs).collect()}
    # NULL text yields no row (the old explode path dropped it too)
    assert 99 not in got
    assert set(got) == set(range(len(EDGE_TEXTS)))
    for i, t in enumerate(EDGE_TEXTS):
        assert got[i] == _expected_sig(t), f"doc {i!r}: {t!r}"


def test_kernel_string_ids(spark):
    rows = [(f"r{i}\x1fp{j}", f"text {i} tok {j} more words here")
            for i in range(5) for j in range(4)]
    docs = spark.createDataFrame(rows, "_doc_key string, _text string")
    got = {r["_doc_key"]: tuple(r["sig"]) for r in minhash_signatures(
        docs, text_col="_text", id_col="_doc_key").collect()}
    assert len(got) == 20
    for key, text in rows:
        assert got[key] == _expected_sig(text)


def test_kernel_sig_shape(spark):
    docs = spark.createDataFrame([(1, "one two three four")],
                                 "doc_id long, text string")
    row = minhash_signatures(docs, num_hashes=16).collect()[0]
    assert len(row["sig"]) == 16
    assert all(isinstance(v, int) and 0 <= v < MERSENNE for v in row["sig"])
