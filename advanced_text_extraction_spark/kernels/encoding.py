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

# Unicode blocks a correctly-decoded East-Asian text actually lands in:
# Han, kana, Hangul (syllables + jamo), CJK punctuation, full/half-width
# forms. A WRONG multi-byte decode scatters code units across random BMP
# blocks (symbols, unassigned, stray Latin-extended) — the script-purity
# gate below is what separates the two.
_CJK_RANGES = ((0x3000, 0x303F), (0x3040, 0x30FF), (0x4E00, 0x9FFF),
               (0xAC00, 0xD7AF), (0x1100, 0x11FF), (0xFF00, 0xFFEF))


def _script_profile(text: str, sample: int = 2048) -> dict[str, float]:
    """One-pass script census over a bounded sample: fraction of chars
    ASCII-or-CJK (purity), non-ASCII fraction (multi-byte evidence),
    per-script fractions AMONG non-ASCII chars, and the ASCII-space
    fraction (Korean eojeol spacing — see _sniff_cjk)."""
    s = text[:sample]
    n = len(s)
    if not n:
        return {"purity": 0.0, "nonascii": 0.0, "hangul": 0.0,
                "han": 0.0, "kana": 0.0, "space": 0.0}
    good = nonascii = hangul = han = kana = space = 0
    for ch in s:
        o = ord(ch)
        if o < 0x80:
            good += 1
            if ch == " ":
                space += 1
            continue
        nonascii += 1
        if any(lo <= o <= hi for lo, hi in _CJK_RANGES):
            good += 1
        if 0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF:
            hangul += 1
        elif 0x4E00 <= o <= 0x9FFF:
            han += 1
        elif 0x3040 <= o <= 0x30FF:
            kana += 1
    na = max(nonascii, 1)
    return {"purity": good / n, "nonascii": nonascii / n,
            "hangul": hangul / na, "han": han / na, "kana": kana / na,
            "space": space / n}


def _sniff_cjk(data: bytes) -> tuple[str, float] | None:
    """Deterministic CJK-encoding ladder for bytes that are neither valid
    UTF-8 nor parity-NUL UTF-16 (chardet breadth parity for the
    shift-jis/gbk/euc-kr family, reference text_extractor.py:933). Each
    candidate must (a) strict-decode, (b) read ≥95% ASCII-or-CJK with
    ≥5% non-ASCII (a multi-byte claim over pure-ASCII bytes is vacuous —
    these are ASCII supersets), (c) pass the wordlike plausibility gate,
    and (d) pass a PER-CODEC script gate — script purity alone cannot
    separate the family because the code spaces overlap (GBK Chinese
    strict-decodes as euc-kr HANGUL, Korean bytes as GBK Han):

    - shift_jis: some kana among the non-ASCII chars (Japanese prose
      always carries kana; a wrong decode of Chinese/Korean yields
      kana-free Han/Hangul soup)
    - euc-kr: Hangul-majority non-ASCII AND ≥3% ASCII spaces — Korean
      spaces between eojeol, Chinese-mis-decoded-as-Hangul does not
    - gbk: Han-majority non-ASCII
    - BOM-less UTF-16 (CJK text carries few NULs, so the parity
      heuristic upstream can't see it): the global purity gate only

    Order is most-restrictive first; GBK's dense lead/trail space
    accepts most byte pairs, so it goes last among the multi-byte three;
    UTF-16 last of all (any even-length byte string decodes). First
    passing candidate wins at 0.8 (0.6 for the UTF-16 tail — an
    even-length gate is weaker evidence than a multi-byte decode)."""
    gates = (
        ("shift_jis", lambda p: p["kana"] >= 0.05),
        ("euc-kr", lambda p: p["hangul"] >= 0.5 and p["space"] >= 0.03),
        ("gbk", lambda p: p["han"] >= 0.5),
        ("utf-16-le", lambda p: True),
        ("utf-16-be", lambda p: True),
    )
    sample = data[:8192]
    for enc, gate in gates:
        try:
            # decode the FULL data only after the sample passes — the
            # sample must end on a code-unit boundary, so retry a
            # 1-3-byte-shorter sample before giving up on a candidate
            decoded = None
            for trim in (0, 1, 2, 3):
                try:
                    decoded = sample[:len(sample) - trim].decode(enc)
                    break
                except UnicodeDecodeError:
                    continue
            if decoded is None:
                continue
            p = _script_profile(decoded)
            if p["purity"] >= 0.95 and p["nonascii"] >= 0.05 \
                    and gate(p) and _plausible_text(decoded):
                data.decode(enc)  # the contract: the codec round-trips
                return enc, 0.8 if not enc.startswith("utf-16") else 0.6
        except UnicodeDecodeError:
            continue
    return None


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
    4. CJK ladder (``_sniff_cjk``): shift_jis → euc-kr → gbk → BOM-less
       UTF-16 (CJK text carries few NULs, so parity can't see it); each
       candidate must strict-decode to ≥95% ASCII-or-CJK text with real
       multi-byte content — 0.8 (0.6 for the UTF-16 tail).
    5. latin-1 (0.5): total function — every byte string decodes — the
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
    cjk = _sniff_cjk(data)
    if cjk is not None:
        return cjk
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
