"""Tokenizer vs a pure-Python oracle (SURVEY.md §7 stage 3)."""

from __future__ import annotations

import re
from collections import Counter

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.corpus import synth_corpus
from golr_loader_spark.functions.tokenize import tokenize
from golr_loader_spark.plans.documents import flatten_documents


def _py_code_tokens(text: str) -> Counter:
    out = Counter()
    for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+", text):
        subs = re.findall(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+", tok)
        for s in subs:
            out[s.lower()] += 1
        if len(subs) > 1:
            out[tok.lower()] += 1
    return out


def test_code_analyzer_identifier_splitting(spark):
    df = spark.createDataFrame(
        [(1, "getUserData user_data HTTPServer x42 42 foo")],
        "doc_id long, content string",
    )
    cfg = IndexConfig(fields={"content": ("code", 1.0)})
    got = {(r["term"]): r["tf"] for r in tokenize(df, cfg).collect()}
    assert got == {
        "get": 1, "user": 2, "data": 2, "getuserdata": 1, "user_data": 1,
        "http": 1, "server": 1, "httpserver": 1, "x42": 1, "42": 1, "foo": 1,
    }


def test_path_analyzer(spark):
    df = spark.createDataFrame(
        [(1, "src/main/netSock.py")], "doc_id long, path string"
    )
    cfg = IndexConfig(fields={"path": ("path", 1.0)})
    got = {r["term"]: r["tf"] for r in tokenize(df, cfg).collect()}
    assert got == {"src": 1, "main": 1, "net": 1, "sock": 1, "netsock": 1, "py": 1}


def test_tokenizer_matches_python_oracle_on_corpus(spark):
    docs = flatten_documents(synth_corpus(spark, 100, seed=42))
    cfg = IndexConfig(fields={"content": ("code", 1.0)})
    spark_tf = {
        (r["doc_id"], r["term"]): r["tf"] for r in tokenize(docs, cfg).collect()
    }
    oracle_tf = {}
    for row in docs.select("doc_id", "content").collect():
        for term, tf in _py_code_tokens(row["content"]).items():
            oracle_tf[(row["doc_id"], term)] = tf
    assert spark_tf == oracle_tf
