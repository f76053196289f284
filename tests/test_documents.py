"""Golden-doc style tests for the flattener (SURVEY.md §5 pattern 1:
the reference asserts full flat docs against JSON fixtures,
GolrLoaderTest.java:41-106; we assert the full flattened row,
multi-valued fields order-insensitively where unordered)."""

from __future__ import annotations

from golr_loader_spark.plans.documents import check_doc_id_collisions, flatten_documents


def _mk_corpus(spark):
    rows = [
        ("orgA/repo1", "src/main/userData.py", "a" * 40, "py", "def user_data(): return 1"),
        ("orgA/repo1", "README.md", "b" * 40, "md", "the docs"),
        ("orgB/repo2", "core/io/net_sock.c", "c" * 40, "c", "int main"),
    ]
    return spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")


def test_flatten_golden(spark):
    docs = {d["path"]: d for d in flatten_documents(_mk_corpus(spark)).collect()}

    d = docs["src/main/userData.py"]
    # closure fields: BFS/depth discovery order for the path chain
    assert d["path_closure"] == ["src", "src/main", "src/main/userData.py"]
    assert d["repo_closure"] == ["orgA", "orgA/repo1"]
    assert sorted(d["lang_closure"]) == ["py", "scripting"]
    # sha256 of known content (python hashlib oracle)
    import hashlib

    assert d["content_sha256"] == hashlib.sha256(b"def user_data(): return 1").hexdigest()
    assert d["content_len"] == len("def user_data(): return 1")

    d2 = docs["README.md"]
    assert d2["path_closure"] == ["README.md"]
    assert sorted(d2["lang_closure"]) == ["docs", "md"]


def test_doc_ids_unique_and_deterministic(spark):
    c = _mk_corpus(spark)
    a = flatten_documents(c).select("doc_id").collect()
    b = flatten_documents(c.repartition(3)).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert check_doc_id_collisions(flatten_documents(c)) == 0
