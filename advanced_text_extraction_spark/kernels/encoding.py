"""Encoding detection for binary text ingest — SURVEY.md §2.8 F3.

The reference detects a text file's encoding with chardet before decoding
(/root/reference/text_extractor.py:933-935: ``chardet.detect(raw)
['encoding'] or 'utf-8'``, then decode). This is the from-scratch
stand-in: a deterministic detector (BOM sniff → strict UTF-8 validation →
UTF-16 zero-byte heuristic → latin-1 fallback) that covers the encodings
a transcript/web corpus actually carries. chardet's full model (language
frequency tables) is deliberately NOT reproduced — the contract is
"name an encoding that round-trips the bytes", and every branch below
guarantees the returned codec decodes the input without error.

Scale shape: pure per-row byte inspection — embarrassingly parallel map
work with no shuffle; the Spark wrapper is an Arrow-batched pandas UDF
(see functions/binary.py). Cost is O(len) for the UTF-8 validation pass
(C-speed ``bytes.decode``), the same asymptotics the reference pays.
"""

from __future__ import annotations

# C0 control characters that never occur in real text. \t \n \r \x0b \x0c
# are legitimate whitespace and \x1b (ESC) opens ANSI color sequences —
# normal in the terminal/agent transcripts this pipeline ingests.
_BAD_CONTROLS = frozenset(
    chr(c) for c in range(0x20)
    if chr(c) not in "\t\n\r\x0b\x0c\x1b") | {"\x7f"}


def _plausible_text(text: str, sample: int = 4096) -> bool:
    """Does a decoded string look like LANGUAGE rather than an accident
    of byte values? Two gates over a bounded sample: no forbidden
    control characters, and a ≥60% ratio of letters/digits/whitespace/
    sentence punctuation (any script — CJK/Cyrillic letters count)."""
    s = text[:sample]
    if not s:
        return True
    good = 0
    for ch in s:
        if ch in _BAD_CONTROLS:
            return False
        if ch.isalnum() or ch.isspace() or ch in ".,;:'\"!?()-/":
            good += 1
    return good >= 0.6 * len(s)

_BOMS: list[tuple[bytes, str]] = [
    # order matters: the UTF-32-LE BOM contains the UTF-16-LE BOM as a
    # prefix. Labels are Python's BOM-AWARE codecs ('utf-16', 'utf-32',
    # 'utf-8-sig'): they consume the BOM and resolve byte order on
    # decode, so the marker never leaks into the text as U+FEFF.
    (b"\xff\xfe\x00\x00", "utf-32"),
    (b"\x00\x00\xfe\xff", "utf-32"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
]


def detect_encoding(data: bytes | None) -> tuple[str, float]:
    """Return ``(encoding, confidence)`` for raw text bytes.

    Deterministic decision ladder:
    1. BOM present → that codec, confidence 1.0.
    2. NUL-free and strict UTF-8 decode succeeds → 'ascii' if
       7-bit-pure else 'utf-8' (0.99 — valid multi-byte UTF-8 is a
       near-certain signal; the NUL gate keeps BOM-less UTF-16 Latin
       text, which is byte-wise valid UTF-8, out of this branch).
       Full confidence additionally requires the DECODED text to pass
       a plausibility gate (no C0 control chars, ≥60% wordlike — see
       ``_plausible_text``), else 0.6: BOM-less UTF-16 CJK can be
       byte-wise valid ASCII ('你好' → b'``O}Y``') or even valid
       multi-byte UTF-8, and the gate is what keeps that mojibake from
       sailing through at full confidence — implausible code units
       surface as stray symbols and control characters. chardet's
       frequency models remain the answer where provenance is truly
       unknown; here the codec always round-trips and the CONFIDENCE
       carries the doubt.
    3. ≥30% NUL bytes concentrated on one parity → BOM-less UTF-16
       (0.7): Latin-script UTF-16 text is ~every-other-byte NUL.
    4. latin-1 (0.5): total function — every byte string decodes — the
       same "always answer something" contract as chardet-or-utf-8.

    Empty/None → ('utf-8', 0.0) like chardet's None → utf-8 default.
    """
    if not data:
        return "utf-8", 0.0
    for bom, name in _BOMS:
        if data.startswith(bom):
            return name, 1.0
    if b"\x00" not in data:
        # NUL never occurs in real text, but IS valid UTF-8 — a BOM-less
        # UTF-16 Latin-script string would pass a strict UTF-8 decode.
        # Gating on its absence keeps the ladders disjoint.
        try:
            decoded = data.decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            pass
        else:
            plausible = _plausible_text(decoded)
            if data.isascii():
                return "ascii", 1.0 if plausible else 0.6
            return "utf-8", 0.99 if plausible else 0.6
    n = len(data)
    even_nul = data[0::2].count(0)
    odd_nul = data[1::2].count(0)
    if n >= 4 and (even_nul + odd_nul) / n >= 0.3:
        if odd_nul > even_nul * 2:
            return "utf-16-le", 0.7
        if even_nul > odd_nul * 2:
            return "utf-16-be", 0.7
    return "latin-1", 0.5


def decode_bytes(data: bytes | None) -> tuple[str, str, float]:
    """F3 + read step fused (reference detects, then re-reads with the
    detected codec): returns ``(text, encoding, confidence)``. Decode
    errors cannot occur — every detector branch names a codec that
    accepts the bytes (UTF-16 with an odd trailing byte falls back to
    latin-1 so the total-function contract survives truncated input)."""
    if not data:
        return "", "utf-8", 0.0
    enc, conf = detect_encoding(data)
    try:
        return data.decode(enc), enc, conf
    except UnicodeDecodeError:
        # reachable only on torn UTF-16/32 input (odd byte lengths)
        return data.decode("latin-1"), "latin-1", 0.5
