"""Deterministic stopword-profile language identification (SPEC.md §5).

Replaces the reference's langdetect calls
(/root/reference/text_extractor.py:480-488,751-759,1076-1084) — langdetect
is seed-unstable, so the engine and the test oracle share this SPEC (not
this code) to make the equality gate meaningful. ``'unknown'`` fallback
semantics preserved from text_extractor.py:1076-1084.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r"[a-zA-ZÀ-ɏ]+")

# Disjoint marker sets — SPEC.md §5 (no word in two languages).
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and is are was were this that with for have has not you "
        "they from but what all can".split()
    ),
    "es": frozenset(
        "el los las una por con para como pero más este esta ser hay "
        "muy sin sobre también hasta donde".split()
    ),
    "fr": frozenset(
        "le les des une est dans qui pas sur vous nous avec être cette "
        "mais ont aux ses fait aussi".split()
    ),
    "de": frozenset(
        "der die das und ist nicht ein eine mit auf sich auch werden "
        "wird bei nach aber aus durch dem".split()
    ),
}

_MIN_HITS = 2


def detect_language(text: str) -> str:
    """argmax of marker hits, ties alphabetical, <2 hits → 'unknown'."""
    if not text:
        return "unknown"
    tokens = _TOKEN_RE.findall(text.lower())
    if not tokens:
        return "unknown"
    best_lang, best_hits = "unknown", 0
    for lang in sorted(STOPWORDS):
        hits = sum(1 for tok in tokens if tok in STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= _MIN_HITS else "unknown"
