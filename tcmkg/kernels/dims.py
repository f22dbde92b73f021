"""Dimension-clause parser: the text-side analogue of the reference's
per-herb attribute columns (extract_herb.py:587-651 emits herb→dimension
edges by `;`-splitting attribute strings and dict-looking-up each token).

In transcripts the attributes arrive as a clause after a herb statement:

    其性温，味甘淡，归脾、肺经，无毒。
    ("its property is warm, flavour sweet+tasteless, tropism spleen and
      lung meridians, nontoxic")

Slot semantics (each mirrors a reference lookup shape):
  property  其性<P>        exact lookup (single-valued)
  flavour   味<F...>       CONTAINMENT tokenization against the flavour
                           vocabulary in vocabulary order — the P13
                           fixed-vocab tokenizer (same semantics as
                           functions/standardize.tokenize_against_vocab,
                           shared constant FLAVOUR_VOCAB)
  tropism   归<T、T...>经   `、`-split then exact lookup per token (the
                           reference's Meridians split, extract_herb.py:625)
  toxicity  <X>。          exact lookup; a MULTI-valued toxicity collapses
                           to 毒/toxic (the reference's rule,
                           extract_herb.py:640-646)

Unknown tokens are skipped (the reference's dict lookups would KeyError;
in a 10^12-turn corpus unparseable clauses must degrade, not abort).
"""

from __future__ import annotations

from ..fixtures.dimensions import FLAVOUR_VOCAB, dim_maps

_DIMS = dim_maps()
_FLAVOUR_ORDER = [zh for zh, _en in FLAVOUR_VOCAB]


def parse_dim_clause(seg: str) -> list[tuple[str, str]]:
    """seg: the text AFTER the 其性 marker, e.g. '温，味甘，归脾经，无毒。'
    -> [(mention_kind, dimension_id)] in deterministic slot/vocab order."""
    out: list[tuple[str, str]] = []
    # the clause is ONE sentence: stop at the first 。 (later sentences in
    # the same turn are unrelated prose). The kernel sees Q2B-normalized
    # text (text_norm maps full-width ， to ASCII ',' but leaves 。 and 、
    # alone); accept both comma forms so the parser also works on raw text.
    clause = seg.partition("。")[0]
    parts = [p for p in clause.replace("，", ",").split(",") if p]
    if not parts:
        return out
    pid = _DIMS["property"].get(parts[0])
    if pid is not None:
        out.append(("has_property", pid))
    for part in parts[1:]:
        if part.startswith("味"):
            raw = part[1:]
            for zh in _FLAVOUR_ORDER:
                if zh in raw:
                    out.append(("has_flavour", _DIMS["flavour"][zh]))
        elif part.startswith("归") and part.endswith("经"):
            for tok in part[1:-1].split("、"):
                tid = _DIMS["tropism"].get(tok)
                if tid is not None:
                    out.append(("tropism_of", tid))
        else:
            if "、" in part:  # multi-valued toxicity -> toxic
                out.append(("toxicity_of", _DIMS["toxicity"]["毒"]))
            else:
                xid = _DIMS["toxicity"].get(part)
                if xid is not None:
                    out.append(("toxicity_of", xid))
    return out
