"""F3 encoding detection: kernel ladder + Spark binary-ingest wrapper
(reference chardet-then-decode, /root/reference/text_extractor.py:933-938).
"""

from __future__ import annotations

import pytest

from advanced_text_extraction_spark.kernels.encoding import (
    decode_bytes,
    detect_encoding,
)

SAMPLE = "Zoë piñata — 北京 transcript №7"


def test_bom_wins():
    cases = [
        (b"\xef\xbb\xbf" + SAMPLE.encode("utf-8"), "utf-8-sig"),
        (b"\xff\xfe" + SAMPLE.encode("utf-16-le"), "utf-16"),
        (b"\xfe\xff" + SAMPLE.encode("utf-16-be"), "utf-16"),
        (b"\xff\xfe\x00\x00" + SAMPLE.encode("utf-32-le"), "utf-32"),
        (b"\x00\x00\xfe\xff" + SAMPLE.encode("utf-32-be"), "utf-32"),
    ]
    for raw, want in cases:
        got, conf = detect_encoding(raw)
        assert (got, conf) == (want, 1.0), (want, got)
        text, used, _ = decode_bytes(raw)
        # BOM-aware codecs consume the marker — no U+FEFF leaks
        assert text == SAMPLE, (used, text[:4])


def test_ascii_and_utf8():
    assert detect_encoding(b"plain ascii transcript") == ("ascii", 1.0)


def test_symbol_heavy_ascii_is_low_confidence():
    """Short BOM-less UTF-16 CJK whose code units all land below 0x80 is
    byte-wise perfect ASCII mojibake ('你好' -> b'`O}Y'); the wordlike
    gate must keep it from claiming full confidence. Longer CJK UTF-16
    carries bytes >= 0x80 and already lands in the flagged fallback."""
    raw = "你好".encode("utf-16-le")
    enc, conf = detect_encoding(raw)
    assert enc == "ascii" and conf < 1.0      # flagged, still roundtrips
    long_raw = ("你好世界欢迎光临" * 4).encode("utf-16-le")
    _enc2, conf2 = detect_encoding(long_raw)
    assert conf2 <= 0.7                        # never full confidence
    # real prose keeps full confidence
    assert detect_encoding(b"Normal English sentence.")[1] == 1.0
    enc, conf = detect_encoding(SAMPLE.encode("utf-8"))
    assert enc == "utf-8" and conf == 0.99
    assert decode_bytes(SAMPLE.encode("utf-8"))[0] == SAMPLE


def test_bomless_utf16_heuristic():
    # the -le/-be codecs write NO BOM — exactly the heuristic's case
    raw = ("latin script text long enough to vote" * 3).encode("utf-16-le")
    assert detect_encoding(raw) == ("utf-16-le", 0.7)
    assert decode_bytes(raw)[0].startswith("latin script")
    raw_be = ("latin script text long enough to vote" * 3).encode("utf-16-be")
    assert detect_encoding(raw_be) == ("utf-16-be", 0.7)


def test_latin1_fallback_total():
    raw = "café à côté".encode("latin-1")
    enc, conf = detect_encoding(raw)
    assert enc == "latin-1" and conf == 0.5
    assert decode_bytes(raw)[0] == "café à côté"
    # arbitrary binary never raises
    junk = bytes(range(256))
    text, enc, _ = decode_bytes(junk)
    assert isinstance(text, str) and len(text) > 0


def test_empty_and_none_default_utf8():
    assert detect_encoding(b"") == ("utf-8", 0.0)
    assert detect_encoding(None) == ("utf-8", 0.0)
    assert decode_bytes(None) == ("", "utf-8", 0.0)


def test_torn_utf16_falls_back_without_raising():
    raw = "abcdefghij".encode("utf-16-le") + b"\x41"  # odd length
    text, enc, conf = decode_bytes(raw)
    assert enc == "latin-1" and conf == 0.5  # total-function contract


def test_with_decoded_text_spark(spark):
    import pandas as pd
    from advanced_text_extraction_spark.functions.binary import (
        with_decoded_text,
    )

    rows = pd.DataFrame({
        "doc_id": ["a", "b", "c", "d"],
        "raw": [SAMPLE.encode("utf-8"),
                b"pure ascii",
                "café à côté".encode("latin-1"),
                b"\xef\xbb\xbf" + b"bom text"],
    })
    df = spark.createDataFrame(rows)
    out = with_decoded_text(df, "raw").orderBy("doc_id").collect()
    assert [r.text for r in out] == [SAMPLE, "pure ascii",
                                     "café à côté", "bom text"]
    assert [r.encoding for r in out] == ["utf-8", "ascii",
                                         "latin-1", "utf-8-sig"]
    assert "raw" not in {f for r in out for f in r.asDict()}
    # drop_bytes=False keeps the binary column
    kept = with_decoded_text(df, "raw", drop_bytes=False)
    assert "raw" in kept.columns


# ---------------------------------------------------------------------------
# CJK multi-byte + BOM-less UTF-16 CJK ladder (r3 — chardet breadth
# parity for the shift-jis/gbk/euc-kr family, reference
# text_extractor.py:933)
# ---------------------------------------------------------------------------

JP = "これは日本語のテキストです。改行もあります。\n天気は良いです。"
KO = "이것은 한국어 텍스트입니다. 날씨가 좋습니다."
ZH = "这是一段中文文本。今天天气很好。我们在测试编码检测。"


@pytest.mark.parametrize("text,enc", [
    (JP, "shift_jis"),
    ("日本語の漢字だらけの文、仮名も少し入ります。", "shift_jis"),
    (KO, "euc-kr"),
    (ZH, "gbk"),
    ("mixed 中文 with english words 测试", "gbk"),
])
def test_cjk_multibyte_families(text, enc):
    data = text.encode(enc)
    got, conf = detect_encoding(data)
    assert got == enc and conf == 0.8
    decoded, e, _ = decode_bytes(data)
    assert decoded == text and e == enc


def test_cjk_family_confusion_gates():
    """The code spaces overlap: GBK Chinese strict-decodes as euc-kr
    Hangul and Korean bytes as GBK Han — the per-codec script gates
    (kana presence, Hangul+space, Han majority) must keep each family
    in its own lane (roundtrip via the detected codec)."""
    for text, enc in ((ZH, "gbk"), (KO, "euc-kr"), (JP, "shift_jis")):
        decoded, got, _ = decode_bytes(text.encode(enc))
        assert (got, decoded) == (enc, text)


@pytest.mark.parametrize("text,enc", [
    (ZH[:16], "utf-16-le"),
    (JP, "utf-16-be"),
])
def test_bomless_utf16_cjk(text, enc):
    """CJK UTF-16 carries almost no NUL bytes, so the parity heuristic
    cannot see it — the ladder's UTF-16 tail must."""
    data = text.encode(enc)
    assert data.count(0) / len(data) < 0.3  # parity branch blind here
    got, conf = detect_encoding(data)
    assert got == enc and conf == 0.6
    assert decode_bytes(data)[0] == text


def test_cjk_ladder_leaves_latin1_alone():
    data = "Café déjà vu, naïve façade, à bientôt très tôt.".encode("latin-1")
    got, conf = detect_encoding(data)
    assert got == "latin-1"
