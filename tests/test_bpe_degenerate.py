"""Degenerate-corpus differential for the BPE apply oracle.

The recursive-CTE oracle advances one merge per iteration; on a corpus
with FEWER distinct adjacent pairs than the merge budget the recursion
stops early, and a hardcoded-depth terminal would return zero rows while
the Spark side (which just applies the shorter merge list) returns a row
per document — the cross-engine divergence a round-6 review caught. The
MAX(r) terminal must keep the two sides hash-identical on tiny corpora.
"""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd

from tests.oracle import compare_query


def test_bpe_apply_parity_with_fewer_pairs_than_merges(spark, sf_dir, tmp_path):
    from kin_data_pipeline_spark.queries import QUERIES

    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        shutil.copy(f, tmp_path)
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            # two distinct pairs total ('ab', 'ba') — far below the
            # 12-merge budget, plus a single-char word and an overlap
            # chain to exercise the multi-pass replace
            "text": ["ab ab ab", "abab x", "abababab"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [8, 6, 8],
        }
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    spec = QUERIES["bpe_apply_token_counts"]
    compare_query(spark, str(tmp_path), spec.fn, spec.oracle)


def test_bpe_train_hand_worked_merges(spark):
    """The iterative trainer on a hand-worked histogram: {'abab': 2,
    'ab': 1} → round 1 counts 'a b':5 (2+2 inside 'abab'×2, 1 in 'ab'),
    'b a':2 → merge 'ab'; round 2 counts 'ab ab':2 → merge 'abab';
    round 3 finds no pairs and stops early. Also pins the lexicographic
    tiebreak and the length-1-word filter."""
    from kin_data_pipeline_spark.queries.llmops import bpe_train

    wf = spark.createDataFrame([("abab", 2), ("ab", 1)], "w string, n long")
    assert bpe_train(wf, k=10) == [
        (1, "a b", "ab", 5),
        (2, "ab ab", "abab", 2),
    ]
    # equal counts break lexicographically ('a b' < 'b a'); length-1
    # words contribute nothing
    wf2 = spark.createDataFrame(
        [("ba", 1), ("ab", 1), ("x", 7)], "w string, n long"
    )
    assert bpe_train(wf2, k=10) == [
        (1, "a b", "ab", 1),
        (2, "b a", "ba", 1),
    ]


def test_bpe_train_parity_on_degenerate_corpus(spark, sf_dir, tmp_path):
    """Oracle parity when the vocabulary exhausts its pairs before the
    merge budget: every m{r} CTE past exhaustion is empty, so both sides
    must return the same truncated merge table."""
    import glob
    import os
    import shutil

    import pandas as pd

    from kin_data_pipeline_spark.queries import QUERIES

    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        shutil.copy(f, tmp_path)
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["ab ab ba", "x ab"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [8, 4],
        }
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    spec = QUERIES["bpe_train_merges"]
    compare_query(spark, str(tmp_path), spec.fn, spec.oracle)
