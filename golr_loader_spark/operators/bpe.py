"""Byte-pair-encoding tokenizer training + encoding over a corpus.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016; the HF-tokenizers training shape): BPE learns merges from WORD
FREQUENCIES, so the distributed work is exactly ONE explode +
map-side-combinable groupBy(word) count over the corpus — at 100 TB
that is the same shape as building a term dictionary. The merge loop
then runs over the bounded vocabulary table (top ``max_words`` by
frequency, rank-and-cut in the plan before the collect), never over
documents: its cost is O(vocab · merges), independent of corpus size.

Encoding applies the learned merge ranks per word inside an
Arrow-batched ``mapInPandas`` (per-batch Python over the word list —
the classic GPT-2 ``bpe()`` loop — with a per-batch word cache so each
distinct word is encoded once per batch), zero per-row UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def _word_freqs(
    df: DataFrame, text_col: str, max_words: int
) -> list[tuple[str, int]]:
    wf = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
    )
    return [(r["w"], int(r["n"])) for r in wf.collect()]


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 100,
    min_freq: int = 2,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Deterministic:
    the best pair each round is (count desc, pair lexicographic asc);
    training stops early when no pair reaches ``min_freq``. Returns
    the ordered merge list — the entire tokenizer state."""
    vocab = {
        tuple(w) + (_EOW,): n for w, n in _word_freqs(df, text_col, max_words)
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _n = best
        merges.append((a, b))
        merged = a + b
        out: dict[tuple, int] = {}
        for sym, n in vocab.items():
            new = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            key = tuple(new)
            out[key] = out.get(key, 0) + n
        vocab = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply learned merges → (id, tokens array<string>, n_bpe_tokens).
    Arrow-batched ``mapInPandas``; merges broadcast via task closure
    (the merge list is tokenizer-sized, never corpus-sized); each
    distinct word is encoded once per batch."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, tokens array<string>, n_bpe_tokens long"

    def _run(batches):
        import pandas as pd

        for pdf in batches:
            cache: dict[str, list[str]] = {}
            toks_col, n_col = [], []
            for text in pdf[text_col].astype(str):
                toks: list[str] = []
                for w in text.lower().split(" "):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "tokens": toks_col, "n_bpe_tokens": n_col}
            )

    return df.select(id_col, text_col).mapInPandas(_run, out_schema)
