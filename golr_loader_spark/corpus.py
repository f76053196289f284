"""Deterministic synthetic source-code corpus.

Produces the engine's input table ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint) at any scale, fully
distributed: ``spark.range(n)`` → one Arrow-vectorized
``mapInPandas`` stage. Every value is a pure function of
``(seed, row_id)`` via splitmix64-style integer mixing — no RNG
state, so the output is bit-identical across runs, partitionings
and cluster sizes (the reproducibility analog of the reference's
fixed test graphs, GolrLoadSetup.java:37-114).

Skew is deliberate: repo sizes are Zipf-ish and a handful of
ultra-hot terms (``def``, ``return``, ``import``, ``the``) dominate
content so that posting-list construction exercises the salted
repartition path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

_LANGS = np.array(["py", "java", "scala", "c", "go", "rs", "js", "md"])
_EXT = {
    "py": ".py", "java": ".java", "scala": ".scala", "c": ".c",
    "go": ".go", "rs": ".rs", "js": ".js", "md": ".md",
}
_SEGMENTS = np.array(
    "src main test core util lib api impl internal common model service "
    "handler store index query plan exec runtime io net http json parse "
    "codec batch stream shard merge sort scan join agg".split()
)

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 → uint64 hash."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _u01(x: np.ndarray) -> np.ndarray:
    return _mix(x).astype(np.float64) / 2.0**64


def _build_vocab() -> tuple[np.ndarray, np.ndarray]:
    """~2,200-word code-ish vocabulary + Zipf CDF over it.

    First entries get the most mass (Zipf s=1.1); the leading four are
    the deliberately ultra-hot terms.
    """
    words: list[str] = ["def", "return", "import", "the"]
    kw = (
        "class if else for while try except with lambda yield pass break "
        "continue from as is in not and or None True False self int str "
        "float list dict set tuple print len range open type public static "
        "void final new this null var val fn let const struct enum match"
    ).split()
    words += kw
    stems = (
        "user data file line item node edge graph term doc index query "
        "result batch row col key val buf ptr ctx cfg arg opt err msg "
        "req resp conn sock addr path dir name id hash count total size "
        "len max min sum avg tmp src dst head tail next prev root leaf"
    ).split()
    # snake_case and camelCase compounds — exercises the identifier
    # splitter (subtokens + whole-identifier emission).
    for i, a in enumerate(stems):
        for j in (1, 3, 7):
            b = stems[(i * j + 5) % len(stems)]
            words.append(f"{a}_{b}")
            words.append(a + b.capitalize())
    # unique rare identifiers
    words += [f"zq{i:04d}" for i in range(400)]
    arr = np.array(words)
    ranks = np.arange(1, len(arr) + 1, dtype=np.float64)
    w = 1.0 / ranks**1.1
    cdf = np.cumsum(w / w.sum())
    cdf[-1] = 1.0
    return arr, cdf


_VOCAB, _VOCAB_CDF = _build_vocab()


def _gen_batch(ids: np.ndarray, seed: int, n_docs: int) -> pd.DataFrame:
    k = np.uint64(seed)
    n = len(ids)
    h_repo = _mix(ids * np.uint64(3) + k)
    h_lang = _mix(ids * np.uint64(5) + k)
    h_path = _mix(ids * np.uint64(7) + k)
    h_len = _mix(ids * np.uint64(11) + k)

    # Zipf-ish repo sizes: u^3 concentrates many docs in low repo ids.
    n_repos = max(8, n_docs // 64)
    repo_idx = np.minimum(
        (_u01(h_repo) ** 3 * n_repos).astype(np.int64), n_repos - 1
    )
    org = repo_idx % max(2, n_repos // 16)
    repo = np.char.add(
        np.char.add("org", org.astype(str)),
        np.char.add("/repo", repo_idx.astype(str)),
    )

    lang = _LANGS[(h_lang % np.uint64(len(_LANGS))).astype(np.int64)]

    # path: 1-6 segments + filename with lang-correlated extension
    n_seg = 1 + (h_path % np.uint64(6)).astype(np.int64)
    seg_parts = []
    for d in range(6):
        hd = _mix(ids * np.uint64(13) + np.uint64(d) * np.uint64(17) + k)
        s = _SEGMENTS[(hd % np.uint64(len(_SEGMENTS))).astype(np.int64)]
        seg_parts.append(np.where(d < n_seg, np.char.add(s, "/"), ""))
    fname_h = _mix(ids * np.uint64(19) + k)
    stem = _VOCAB[
        np.searchsorted(_VOCAB_CDF, _u01(fname_h), side="left").clip(0, len(_VOCAB) - 1)
    ]
    ext = np.array([_EXT[lg] for lg in lang])
    path = np.empty(n, dtype=object)
    acc = seg_parts[0]
    for p in seg_parts[1:]:
        acc = np.char.add(acc, p)
    path[:] = np.char.add(np.char.add(acc, stem), ext)

    c1 = _mix(ids * np.uint64(23) + k)
    c2 = _mix(ids * np.uint64(29) + k)
    commit = np.array(
        [f"{a:016x}{b:016x}{a & 0xFFFFFFFF:08x}" for a, b in zip(c1.tolist(), c2.tolist())]
    )

    # content: 8..600 Zipf-drawn tokens per doc (≈50..5000 chars)
    m = (8 + (h_len % np.uint64(593))).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(m)])
    total = int(offsets[-1])
    doc_rep = np.repeat(np.arange(n), m)
    pos = np.arange(total) - offsets[doc_rep]
    tok_h = _mix(ids[doc_rep] * np.uint64(31) + pos.astype(np.uint64) * np.uint64(37) + k)
    tok_idx = np.searchsorted(_VOCAB_CDF, _u01(tok_h), side="left").clip(
        0, len(_VOCAB) - 1
    )
    words = _VOCAB[tok_idx]
    content = (
        pd.Series(words)
        .groupby(doc_rep)
        .agg(" ".join)
        .reindex(np.arange(n), fill_value="")
        .to_numpy()
    )

    return pd.DataFrame(
        {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": content,
        }
    )


def synth_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus of ``n_docs`` rows."""
    base = spark.range(0, n_docs, numPartitions=partitions or max(8, n_docs // 50_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(np.uint64), seed, n_docs)

    return base.mapInPandas(gen, schema=CORPUS_SCHEMA)
