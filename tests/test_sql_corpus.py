"""Golden-file SQL corpus runner (SURVEY §5 layer 4).

Replicates the reference's product-test format
(presto-product-tests/src/main/resources/sql-tests/testcases/: paired
.sql/.result files with `-- key: value;` headers) over the fixture
tables.  Queries are written in the Presto dialect and run through
Engine.sql(dialect="presto"), so the corpus also locks the dialect shim.
"""

from __future__ import annotations

import glob
import os

import pytest

CORPUS = os.path.join(os.path.dirname(__file__), "sql_corpus")
SQL_FILES = sorted(glob.glob(os.path.join(CORPUS, "*", "*.sql")))


def _load_case(sql_file: str):
    raw = open(sql_file).read().splitlines()
    sql = "\n".join(l for l in raw if not l.startswith("--"))
    result_file = sql_file[:-4] + ".result"
    lines = open(result_file).read().splitlines()
    header = lines[0]
    ignore_order = "ignoreOrder: true" in header
    expected = [tuple(l.split("|")) for l in lines[1:] if l]
    return sql, expected, ignore_order


@pytest.mark.parametrize("sql_file", SQL_FILES, ids=lambda f: os.path.relpath(f, CORPUS))
def test_corpus_case(engine, sql_file):
    sql, expected, ignore_order = _load_case(sql_file)
    rows = engine.sql(sql, dialect="presto").collect()
    got = [tuple("" if v is None else str(v) for v in r) for r in rows]
    if ignore_order:
        assert sorted(got) == sorted(expected), sql_file
    else:
        assert got == expected, sql_file


def test_corpus_is_nonempty():
    assert len(SQL_FILES) >= 5
    for f in SQL_FILES:
        assert os.path.exists(f[:-4] + ".result"), f"missing golden for {f}"
