"""Multi-MB single-document axis (VERDICT r9 item 3, round-10 seed).

The fixture and adversarial documents are all SHORT (≤ a few hundred
chars). That masks two whole bug classes the text operators meet on a
real web corpus, where single documents run to megabytes:

1. Quadratic per-row engine paths — invisible at 300 chars, a hang at
   200 KB. This axis caught two on its first prototype run:
   - ``fingerprints``: the shingle lambda referenced the word-split
     EXPRESSION, which a higher-order function inlines per element —
     re-splitting the whole document once per position (243 s for ONE
     200 KB doc; 0.5 s after materializing the array as a column).
   - ``winnow_fingerprints``: same inlining for the ascii_fold chain,
     plus substr(j, 1) per position — UTF8String walks bytes from 0 to
     locate code point j, O(len²) at the byte level (110 s for one
     200 KB doc; linear via split-to-code-points after the fix).
2. Silent oracle truncation — several DuckDB oracles bounded their
   position series with a fixed GENERATE_SERIES cap (128/2048/4096)
   "because fixture docs are short". On a 36 000-word doc the oracle
   quietly dropped 95% of positions while the engine saw them all
   (q_text_rep_ngram / q_text_dup_ngram_frac diverged; the shingle
   oracles were latently wrong). All caps are now correlated
   ``unnest(generate_series(1, LEN(...)))`` — exact at any length.

Doc sizes are tiered by ORACLE cost (some DuckDB list pipelines are
quadratic; that bounds the test, not the engine): ~1 MB for the linear
oracles, ~200 KB for the quadratic-ish ones, ~5 KB for winnowing (its
oracle re-hashes every char k-gram via list ops).

Every tier also carries a tiny doc and a NULL doc so the per-row memory
path is proven alongside, not instead of, the usual edge contracts.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # soak/axis tier: run with `pytest -m slow`


import pandas as pd
from etl_open_source_spark.registry import get_registry
from tests.oracle_utils import assert_frames_match, run_oracle
from tests.test_random_differential import _write_documents

REGISTRY = get_registry()

# a deterministic ~1 KB paragraph with tokenizer-relevant variety
_PARA = (
    "the quick brown fox jumps over the lazy dog 0123456789 "
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed "
) * 9


def _docs_dir(tmp_path_factory, kb: int, tag: str) -> str:
    big = _PARA * kb  # ≈ kb KB of ASCII text
    df = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2], dtype="int64"),
            "text": [big, "tiny doc two words", None],
            "lang": ["en", "fr", None],
            "source": ["src0", "src1", ""],
        }
    )
    df["n_chars"] = df["text"].str.len().astype("Int64")
    d = str(tmp_path_factory.mktemp(f"bigdoc_{tag}"))
    _write_documents(df, d)
    return d


@pytest.fixture(scope="module")
def bigdoc_1mb(tmp_path_factory):
    return _docs_dir(tmp_path_factory, 1024, "1mb")


@pytest.fixture(scope="module")
def bigdoc_200kb(tmp_path_factory):
    return _docs_dir(tmp_path_factory, 200, "200kb")


@pytest.fixture(scope="module")
def bigdoc_5kb(tmp_path_factory):
    return _docs_dir(tmp_path_factory, 5, "5kb")


# linear engine AND oracle: run at ~1 MB
MB_QUERIES = [
    "q_text_stats",
    "q_text_tokens",
    "q_text_quality",
    "q_text_langid",
    "q_text_tf",
    "q_text_fingerprint",
    "q_text_normalize_ws",
    "q_text_hashvec",
    "q_text_tfidf",
    "q_pii_redact",
    "q_dedup_exact",
    "q_multimodal_meta",
]

# quadratic-ish DuckDB oracle (list pipelines): run at ~200 KB
KB200_QUERIES = [
    "q_doc_chunk",
    "q_text_entropy",
    "q_text_rep_ngram",
    "q_text_dup_ngram_frac",
    "q_dedup_ngram",
    "q_text_decontaminate",
    "q_multimodal_audio_chunks",
    "q_text_lm_score",
]

# winnowing's oracle re-hashes every char k-gram through nested list
# transforms — O(len²) in DuckDB; 5 KB is still ~16x the fixture docs
# and exercises the formerly-hanging engine path
KB5_QUERIES = [
    "q_text_winnowing",
    "q_dedup_winnowing",
]


def _check(spark, d: str, name: str) -> None:
    qd = REGISTRY[name]
    got = qd.fn(spark, d).toPandas()
    if qd.oracle is None:
        assert got.shape[1] > 0
        return
    want = run_oracle(qd.oracle, d)
    assert_frames_match(got, want)


@pytest.mark.parametrize("name", MB_QUERIES)
def test_bigdoc_1mb_parity(spark, bigdoc_1mb, name):
    _check(spark, bigdoc_1mb, name)


@pytest.mark.parametrize("name", KB200_QUERIES)
def test_bigdoc_200kb_parity(spark, bigdoc_200kb, name):
    _check(spark, bigdoc_200kb, name)


@pytest.mark.parametrize("name", KB5_QUERIES)
def test_bigdoc_5kb_parity(spark, bigdoc_5kb, name):
    _check(spark, bigdoc_5kb, name)
