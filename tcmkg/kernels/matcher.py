"""Mention detection kernels.

Two distinct matching semantics, mirroring the reference:

1. **Substring gazetteer scan** — "does any dictionary name occur anywhere in
   this text" (reference: processed_code/add_more_prescription_symptom_map.py:22-28
   loops every gazetteer word per row — O(rows × dict)). We implement a
   from-scratch Aho-Corasick automaton so one pass over the text finds all
   names: O(text_len + matches) per row, independent of dictionary size.
   This is the scale path: at 10^12 turns the per-row cost must not grow
   with the gazetteer.

2. **Prescription herb-token probe** — split a prescription line into herb
   tokens, peel the dose, then a two-stage dictionary probe with decoration
   stripping (reference: extract_prescription_herb_relation.py:24-37, 63-93).

Both are pure-Python over strings; the Spark pipeline invokes them inside
`mapInPandas` Arrow batches (never per-row Spark UDFs), and the oracle calls
them directly — shared kernels make P/R parity a property, not a hope.
"""

from __future__ import annotations

import re
from collections import deque

from .dose import DANGLING_PAREN_RE, DOSE_RE, NOISE_RE, PAREN_RE, TOKEN_SPLIT_RE

# two-stage probe regexes (extract_prescription_herb_relation.py:71, 79-81)
_CJK_PREFIX_RE = re.compile(r"^[一-龥]+(?<![（(])")
_DECOR_STRIP_RE = re.compile(r"(?![川吴姜干炒煨醋熟制炙真])[一-龥]+(?<![粉末屑梢汁])")


class AhoCorasick:
    """Multi-pattern substring matcher (classic Aho-Corasick, dict-of-dicts).

    Built once per executor from a broadcast gazetteer; `find_all` returns
    every (start, pattern) occurrence. Deterministic: patterns are stored in
    sorted order and match emission order is scan order.
    """

    __slots__ = ("goto", "fail", "out")

    def __init__(self, patterns) -> None:
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[str]] = [[]]
        for pat in sorted(set(p for p in patterns if p)):
            node = 0
            for ch in pat:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(pat)
        # BFS failure links
        self.fail = [0] * len(self.goto)
        q: deque[int] = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0)
                if self.fail[child] == child:
                    self.fail[child] = 0
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def find_all(self, text: str) -> list[tuple[int, str]]:
        """All (start_offset, pattern) matches in text (overlaps included)."""
        res: list[tuple[int, str]] = []
        node = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while node and ch not in goto[node]:
                node = fail[node]
            node = goto[node].get(ch, 0)
            if out[node]:
                for pat in out[node]:
                    res.append((i - len(pat) + 1, pat))
        return res

    def find_set(self, text: str) -> set[str]:
        """Distinct matched patterns (the reference's `word in text` semantics)."""
        return {pat for _, pat in self.find_all(text)}


# per-process automaton cache, keyed by caller-supplied version token
_AC_CACHE: dict[str, AhoCorasick] = {}


def get_automaton(key: str, patterns) -> AhoCorasick:
    ac = _AC_CACHE.get(key)
    if ac is None:
        ac = AhoCorasick(patterns)
        _AC_CACHE[key] = ac
    return ac


def clause_window(text: str, marker: str) -> tuple[str, str]:
    """Sentence-bounded clause split at the FIRST occurrence of `marker`:
    -> (subject text, object text), where the subject side runs from the
    last 。 before the marker and the object side stops at the first 。
    after it. The relation-statement handlers added for the gene-side
    families (gene↔gene, disease→gene, gene→GO/pathway, anatomy→gene) use
    this bounded window so multiple statement clauses can share one turn
    without cross-contaminating each other's AC scans — the P11
    split-at-first-delimiter shape applied on both sides of the marker.
    Returns ("", "") when the marker is absent."""
    left, hit, right = text.partition(marker)
    if not hit:
        return "", ""
    return left.rpartition("。")[2], right.partition("。")[0]


def split_prescription_tokens(text: str) -> list[str]:
    """Prescription line → herb tokens (parenthetical/noise removal + split).

    Mirrors extract_prescription_herb_relation.py:24-27 exactly, including
    the `[^五]加` split branch that consumes the character before 加.
    """
    s = PAREN_RE.sub("", text)
    s = DANGLING_PAREN_RE.sub("", s)
    s = NOISE_RE.sub("", s)
    return [t for t in TOKEN_SPLIT_RE.split(s) if t]


def extract_herb_dose_pairs(text: str) -> list[tuple[str, str | None]]:
    """Prescription line → [(herb_token, dose_str|None)].

    Token-level dose peeling per extract_prescription_herb_relation.py:28-37:
    a token whose dose mention starts at offset 0 is dropped entirely.
    """
    pairs: list[tuple[str, str | None]] = []
    for tok in split_prescription_tokens(text):
        m = DOSE_RE.search(tok)
        if m and tok[: m.start()]:
            pairs.append((tok[: m.start()], m.group()))
        elif m is None:
            pairs.append((tok, None))
    return pairs


def probe_herb(herb: str, herb_map: dict[str, str]) -> str | None:
    """Two-stage dictionary probe with decoration stripping.

    Stage 1: leading CJK run, exact lookup.
    Stage 2: strip decoration prefixes (川吴姜干炒煨醋熟制炙真) and material
    suffixes (粉末屑梢汁), retry. Mirrors
    extract_prescription_herb_relation.py:69-91.
    """
    herb = herb.strip()
    m = _CJK_PREFIX_RE.search(herb)
    if not m:
        return None
    sub = m.group()
    hit = herb_map.get(sub)
    if hit is not None:
        return hit
    m2 = _DECOR_STRIP_RE.search(sub)
    if not m2:
        return None
    return herb_map.get(m2.group())
