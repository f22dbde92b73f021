"""Entity-link scoring beyond exact alias match.

The pipeline links in three tiers (BASELINE.json north_star: "vectorized
entity-link scoring (alias + context embedding similarity)"):

  1. exact alias match            (broadcast dict — extract kernel)
  2. decoration-stripping probe   (two-stage fallback, reference semantics)
  3. embedding similarity         (THIS module, optional): unresolved
                                  mentions vs the gazetteer name embeddings,
                                  cosine top-1 above a threshold.

Tier 3 is recall-over-precision and is NOT part of the P/R-gated reference
contract (the reference simply drops unresolved mentions and counts them —
extract_prescription_herb_relation.py:88-101), so it is off by default and
surfaced as a separate operator: feed it `unlinked_mentions(mentions)` and
join the results back if the use case wants the extra recall.

Scale shape: gazetteer embeddings are a small broadcast matrix; unresolved
tokens stream through one mapInPandas (numpy matmul per Arrow batch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unlinked_mentions(mentions: DataFrame) -> DataFrame:
    """-> (token, anchor_formula, n): the reference's unrecorded-herb
    counter as a table (diagnostics + soft-link input)."""
    return (
        mentions.filter(F.col("kind") == "unlinked")
        .groupBy(F.col("subj").alias("token"), F.col("obj").alias("anchor_formula"))
        .agg(F.sum("n").cast("long").alias("n"))
    )


_NAME_DIM = 64


def _encode_names(names: pd.Series, dim: int = _NAME_DIM) -> np.ndarray:
    """Deterministic short-name encoder: character unigram+bigram hash
    features, L2-normalized. Herb/symptom names are 2-5 chars, so bigram
    overlap (not trigram windows) carries the similarity signal. Swap for a
    real embedding model on a GPU cluster — the operator shape is unchanged."""
    out = np.zeros((len(names), dim), dtype=np.float64)
    for r, s in enumerate(names):
        s = s or ""
        grams = list(s) + [s[i : i + 2] for i in range(len(s) - 1)]
        for g in grams:
            h = 2166136261
            for ch in g:
                h = ((h ^ ord(ch)) * 16777619) & 0xFFFFFFFF
            out[r, h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
    norms = np.sqrt((out * out).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return out / norms


def soft_link(
    spark,
    tokens: DataFrame,
    alias_map: dict[str, str],
    token_col: str = "token",
    threshold: float = 0.75,
    encoder=None,
) -> DataFrame:
    """-> (token, canonical_id, matched_alias, sim): embedding-cosine top-1
    link for unresolved mentions, kept only above `threshold`.

    `encoder(names: pd.Series) -> np.ndarray` (rows L2-normalized) is
    injectable: the gazetteer side is encoded driver-side and broadcast;
    the token side inside the kernel — BOTH use the same callable, so a
    real-model swap cannot desynchronize the two spaces."""
    enc = encoder or _encode_names
    aliases = sorted(alias_map)
    gaz_vecs = enc(pd.Series(aliases))
    gaz_canon = [alias_map[a] for a in aliases]
    b = spark.sparkContext.broadcast((gaz_vecs, gaz_canon, aliases))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vecs, canon, alias_names = b.value
        for pdf in batches:
            toks = pdf[token_col]
            m = enc(toks)
            sims = m @ vecs.T  # both sides L2-normalized
            best = sims.argmax(axis=1)
            best_sim = sims[np.arange(len(toks)), best]
            keep = best_sim >= threshold
            yield pd.DataFrame(
                {
                    "token": toks[keep],
                    "canonical_id": [canon[i] for i in best[keep]],
                    "matched_alias": [alias_names[i] for i in best[keep]],
                    "sim": best_sim[keep],
                }
            )

    return tokens.select(token_col).distinct().mapInPandas(
        kernel,
        schema="token string, canonical_id string, matched_alias string, sim double",
    )
