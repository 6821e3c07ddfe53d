"""Office-document kernels (SURVEY §2.1 S6/S7/S8): reference format
contracts (/root/reference/text_extractor.py:612-749) verified on
hand-built OOXML payloads, plus engine↔oracle parity on generated ones,
plus the config-file model (reference :778-803)."""

from __future__ import annotations

import base64
import random

import pytest

from advanced_text_extraction_spark.operators.extract import extract_one
from fixtures.gen import (
    _ooxml_zip,
    gen_docx_payload,
    gen_pptx_payload,
    gen_xlsx_payload,
)
from oracle.extractor import extract_payload

_CT = '<?xml version="1.0"?><Types/>'
_W_NS = ('xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/'
         '2006/main"')


def _docx(body: str) -> str:
    return _ooxml_zip({
        "[Content_Types].xml": _CT,
        "word/document.xml":
            f"<w:document {_W_NS}><w:body>{body}</w:body></w:document>",
    })


def test_docx_paragraphs_and_table_contract():
    """Reference :620-633: non-empty paragraphs '\\n'-joined; stripped
    cells ' | '-joined; tables under the '\\n\\nTables:\\n' banner."""
    payload = _docx(
        "<w:p><w:r><w:t>First para</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>   </w:t></w:r></w:p>"          # blank → dropped
        "<w:p><w:r><w:t>Second</w:t></w:r>"
        "<w:r><w:t xml:space=\"preserve\"> half</w:t></w:r></w:p>"  # runs concat
        "<w:tbl><w:tr>"
        "<w:tc><w:p><w:r><w:t> a </w:t></w:r></w:p></w:tc>"  # cell stripped
        "<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>")
    out = extract_one(payload)
    assert out["content_type"] == "docx"
    assert out["confidence"] == 0.95  # text_extractor.py:639
    assert out["extracted_text"] == "First para\nSecond half\n\nTables:\na | b"
    assert out["metadata"]["paragraphs"] == "2"
    assert out["metadata"]["tables"] == "1"
    # spans: block per paragraph + per table row, binary src offsets
    spans = out["spans"]
    assert [s["src_start"] for s in spans] == [-1, -1, -1]
    text = out["extracted_text"]
    assert [text[s["start"]:s["end"]] for s in spans] == [
        "First para", "Second half", "a | b"]


def test_xlsx_sheet_headers_and_empty_sheet_skip():
    """Reference :666-682: 'Sheet: name' headers, ' | ' rows, empty
    sheets skipped, empty line after every included sheet (trailing
    newline included), total_cells counts every non-null cell."""
    rng = random.Random(0)
    # hand-build: sheet1 has data, sheet2 empty
    from fixtures.gen import _RELS_NS, _S_NS
    payload = _ooxml_zip({
        "[Content_Types].xml": _CT,
        "xl/workbook.xml": (
            f'<workbook {_S_NS}><sheets>'
            '<sheet name="Alpha" sheetId="1" r:id="rId1"/>'
            '<sheet name="Empty" sheetId="2" r:id="rId2"/>'
            "</sheets></workbook>"),
        "xl/_rels/workbook.xml.rels": (
            f'<Relationships {_RELS_NS}>'
            '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>'
            "</Relationships>"),
        "xl/worksheets/sheet1.xml": (
            f'<worksheet {_S_NS}><sheetData>'
            "<row><c><v>7</v></c><c><v>2.5</v></c></row>"
            "<row><c t=\"s\"><v>0</v></c></row>"
            "</sheetData></worksheet>"),
        "xl/worksheets/sheet2.xml":
            f'<worksheet {_S_NS}><sheetData/></worksheet>',
        "xl/sharedStrings.xml":
            f'<sst {_S_NS.split(" xmlns:r")[0]}><si><t>hello</t></si></sst>',
    })
    out = extract_one(payload)
    assert out["content_type"] == "excel"
    assert out["extracted_text"] == "Sheet: Alpha\n7 | 2.5\nhello\n"
    assert out["metadata"]["sheets"] == "2"       # ALL sheets counted
    assert out["metadata"]["total_cells"] == "3"
    assert out["confidence"] == 0.95


def test_pptx_slide_headers_and_numbering():
    """Reference :716-727: 1-based 'Slide {i}:' headers keep presentation
    numbering even when an empty slide in between is skipped."""
    from fixtures.gen import _P_NS, _RELS_NS
    def slide(shapes: str) -> str:
        return (f'<p:sld {_P_NS}><p:cSld><p:spTree>{shapes}'
                "</p:spTree></p:cSld></p:sld>")
    payload = _ooxml_zip({
        "[Content_Types].xml": _CT,
        "ppt/presentation.xml": (
            f'<p:presentation {_P_NS}><p:sldIdLst>'
            '<p:sldId id="256" r:id="rId1"/><p:sldId id="257" r:id="rId2"/>'
            '<p:sldId id="258" r:id="rId3"/>'
            "</p:sldIdLst></p:presentation>"),
        "ppt/_rels/presentation.xml.rels": (
            f'<Relationships {_RELS_NS}>'
            '<Relationship Id="rId1" Type="t" Target="slides/slide1.xml"/>'
            '<Relationship Id="rId2" Type="t" Target="slides/slide2.xml"/>'
            '<Relationship Id="rId3" Type="t" Target="slides/slide3.xml"/>'
            "</Relationships>"),
        "ppt/slides/slide1.xml": slide(
            "<p:sp><p:txBody><a:p><a:r><a:t>Title</a:t></a:r></a:p>"
            "<a:p><a:r><a:t>sub</a:t></a:r></a:p></p:txBody></p:sp>"),
        "ppt/slides/slide2.xml": slide(""),   # empty → skipped
        "ppt/slides/slide3.xml": slide(
            "<p:sp><p:txBody><a:p><a:r><a:t>End</a:t></a:r></a:p>"
            "</p:txBody></p:sp>"),
    })
    out = extract_one(payload)
    assert out["content_type"] == "powerpoint"
    # slide 2 skipped but slide 3 keeps its presentation index
    assert out["extracted_text"] == "Slide 1:\nTitle\nsub\n\nSlide 3:\nEnd\n"
    assert out["metadata"]["slides"] == "2"  # INCLUDED slides (:729)


def test_office_errors_are_data():
    for payload in (
        "UEsDB" + "%%not-base64%%",                 # broken base64
        _ooxml_zip({"other/x.xml": "<x/>"}),        # zip but not OOXML
        base64.b64encode(b"PK\x03\x04garbage").decode(),  # corrupt zip
    ):
        out = extract_one(payload)
        assert out["status"] == "error"
        assert out["content_type"] == "office"
        assert out["extracted_text"] == ""
        assert out["error"]


@pytest.mark.parametrize("gen", [gen_docx_payload, gen_xlsx_payload,
                                 gen_pptx_payload])
def test_engine_oracle_parity(gen):
    rng = random.Random(7)
    for _ in range(25):
        p = gen(rng)
        e, o = extract_one(p), extract_payload(p)
        for k in ("content_type", "extracted_text", "confidence",
                  "language", "status"):
            assert e[k] == o[k], k
        es = [(d["block_idx"], d["start"], d["end"], d["src_start"],
               d["src_end"]) for d in e["spans"]]
        assert es == [tuple(s) for s in o["spans"]]


# ---------------------------------------------------------------------------
# config-file model (reference text_extractor.py:778-803)
# ---------------------------------------------------------------------------

def test_config_defaults_and_shallow_merge(tmp_path):
    from advanced_text_extraction_spark.sources.config import (
        DEFAULT_CONFIG,
        load_config,
    )

    assert load_config(None) == DEFAULT_CONFIG
    # missing file → defaults, no raise (reference warns only)
    assert load_config(str(tmp_path / "nope.json")) == DEFAULT_CONFIG
    # bad JSON → defaults, no raise
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert load_config(str(bad)) == DEFAULT_CONFIG
    # shallow merge: a user section replaces the default section wholesale
    user = tmp_path / "cfg.json"
    user.write_text('{"job": {"n_buckets": 64}}')
    cfg = load_config(str(user))
    assert cfg["job"] == {"n_buckets": 64}          # wholesale (shallow)
    assert cfg["extract"] == DEFAULT_CONFIG["extract"]  # untouched
