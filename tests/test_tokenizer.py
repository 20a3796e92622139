"""Tokenizer golden tests + three-way (Spark / Python / DuckDB) lockstep."""

import duckdb
import pytest
from pyspark.sql import functions as F

from refimage_spark.tokenizer import duckdb_tokens_sql, py_tokens, spark_tokens

GOLDEN = [
    ("Red CAR", ["red", "car"]),
    ("  fast, car!  ", ["fast", "car"]),
    ("a-b_c 42x", ["a", "b", "c", "42x"]),
    ("", []),
    ("...", []),
    ("Tab\tand\nnewline", ["tab", "and", "newline"]),
    ("ünïcode stripped", ["n", "code", "stripped"]),
    ("UPPER lower 123", ["upper", "lower", "123"]),
]


@pytest.mark.parametrize("text,want", GOLDEN)
def test_py_tokens_golden(text, want):
    assert py_tokens(text) == want


def test_spark_matches_py(spark):
    texts = [t for t, _ in GOLDEN]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = df.select(spark_tokens("text").alias("toks")).collect()
    assert [r.toks for r in got] == [py_tokens(t) for t in texts]


def test_duckdb_matches_py():
    con = duckdb.connect()
    for text, want in GOLDEN:
        (got,) = con.execute(
            f"select {duckdb_tokens_sql('?')}", [text]
        ).fetchone()
        assert got == want, text
