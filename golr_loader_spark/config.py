"""Engine configuration.

``IndexConfig`` is the analog of the reference's YAML query spec
(`GolrCypherQuery`, /root/reference/src/main/java/org/monarch/golr/
beans/GolrCypherQuery.java:13-46): where golr-loader carried per-field
closure overrides, we carry per-field analyzers and boosts that the
tokenizer and scorer consume.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# BM25 constants fixed by the north rule (BASELINE.json).
BM25_K1 = 1.2
BM25_B = 0.75


@dataclass(frozen=True)
class IndexConfig:
    """Tokenization / index-layout / scoring knobs.

    fields: field name → (analyzer, boost). Analyzers:
      * ``code``  — code-aware: identifiers split on snake_case and
        camelCase, numbers kept, everything lowercased; compound
        identifiers are ALSO emitted whole (the base-field +
        closure-field convention of SolrDocUtil.java:25-44 collapsed
        into one term space).
      * ``path``  — like ``code`` but also splits on ``/ . -``.
      * ``simple`` — whitespace split + lowercase (the DuckDB-oracle
        -friendly analyzer).
    """

    fields: dict[str, tuple[str, float]] = field(
        default_factory=lambda: {"content": ("code", 1.0), "path": ("path", 2.0)}
    )
    k1: float = BM25_K1
    b: float = BM25_B
    # Posting blocks: docs per compressed block (power of two keeps
    # numpy reshape cheap).
    block_size: int = 128
    # Doc-space range buckets (2**bucket_bits). Buckets are a monotone
    # function of doc_id, so per-(term,bucket) posting blocks are
    # globally doc_id-ordered — this is what makes hot-term ("def",
    # "return") posting construction parallel instead of a single
    # giant reduce task: the salt that the north rule mandates.
    bucket_bits: int = 4
    # Minimum term length kept by analyzers.
    min_term_len: int = 1
    # Bit width of the doc_id space: 64 for xxhash64 ids (default);
    # ceil(log2 N) when documents carry dense ids (assign_dense_ids),
    # so range-bucketing splits the dense space evenly.
    id_space_bits: int = 64

    @property
    def n_buckets(self) -> int:
        return 1 << self.bucket_bits
