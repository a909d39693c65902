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
