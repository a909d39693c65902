"""Differential test for the chunk-dedup substrate: the Spark operator
(`operators/dedup.py::chunk_hashes`), the DuckDB oracle fragment
(`queries/filtering.py::_SQL_CHUNKS`), and an independent pure-Python
reference must all produce the same chunk-hash arrays on generated word
lists covering the edges (empty doc, shorter than one chunk, exact
multiple of the chunk width, long docs with a ragged tail).

One Spark job / one DuckDB query over the whole generated batch — not a
job per example — so the sweep stays fast.
"""

from __future__ import annotations

import hashlib
import random

import duckdb
from pyspark.sql import functions as F

from kin_data_pipeline_spark.operators.dedup import CHUNK_W, chunk_hashes
from kin_data_pipeline_spark.queries.filtering import _sql_chunks


def _py_reference(words: list[str]) -> list[str]:
    out = []
    for j in range(len(words) // CHUNK_W):
        chunk = " ".join(words[j * CHUNK_W : (j + 1) * CHUNK_W])
        out.append(hashlib.md5(chunk.encode()).hexdigest())
    return out


def _gen_cases() -> list[tuple[int, list[str]]]:
    rng = random.Random(20260814)
    cases = [
        (0, []),  # empty doc
        (1, ["one"]),
        (2, [f"w{i}" for i in range(CHUNK_W - 1)]),  # one short of a chunk
        (3, [f"w{i}" for i in range(CHUNK_W)]),  # exactly one chunk
        (4, [f"w{i}" for i in range(3 * CHUNK_W)]),  # exact multiple
        (5, [f"w{i}" for i in range(3 * CHUNK_W + 5)]),  # ragged tail
        (6, ["dup"] * (2 * CHUNK_W)),  # identical chunks within one doc
    ]
    for i in range(7, 60):
        n = rng.randrange(0, 40)
        cases.append((i, [f"t{rng.randrange(0, 9)}x{j}" for j in range(n)]))
    return cases


def test_chunk_hashes_three_way_differential(spark):
    cases = _gen_cases()
    expected = {i: _py_reference(ws) for i, ws in cases}

    rows = [(i, " ".join(ws)) for i, ws in cases]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got_spark = {
        r["doc_id"]: r["chunks"]
        for r in df.select(
            "doc_id",
            chunk_hashes(F.split(F.trim(F.col("text")), " ")).alias("chunks"),
        ).collect()
    }
    # NOTE the reference quirk both engines share: split of an empty/blank
    # string yields [""] (one empty token), so a blank doc has 0 chunks
    # only because 1 < CHUNK_W — the Python reference must see the same
    # tokenization to agree.
    expected_tokenized = {
        i: _py_reference(" ".join(ws).strip().split(" ")) for i, ws in cases
    }
    assert got_spark == expected_tokenized

    con = duckdb.connect()
    try:
        con.register("docs", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
        got_duck = {
            int(i): list(c)
            for i, c in con.execute(
                "SELECT doc_id, "
                + _sql_chunks("string_split(trim(text), ' ')")
                + " AS chunks FROM docs ORDER BY doc_id"
            ).fetchall()
        }
    finally:
        con.close()
    assert got_duck == expected_tokenized

    # the pure reference agrees with the tokenized one except on blank docs
    for i, ws in cases:
        if ws:
            assert expected[i] == expected_tokenized[i], i
