"""HTML main-content extraction kernel (SPEC.md §3).

Boilerpipe/Readability-style boilerplate stripping: DOM event stream →
block segmentation → word-level link-density scoring + chrome-subtree
classification → kept blocks joined ``'\\n\\n'`` with char-span offsets
into both the extracted text and the raw markup.

The reference only *claims* HTML support (bs4/selenium imported but never
called — /root/reference/text_extractor.py:76-86, README.md:400); this tier
is the primary payload type mandated by BASELINE.json:north_star. The
``'\\n\\n'`` block-join contract mirrors the reference's page join
(/root/reference/text_extractor.py:573).

Implementation: streaming ``html.parser`` handler (stdlib; exposes
``getpos()`` for source offsets). ``convert_charrefs=False`` so entity and
character references are separate events with known raw extents — spans
stay byte-accurate. One pass, O(n); no DOM tree is materialized — this
runs vectorized over Arrow batches in the extract UDF.
"""

from __future__ import annotations

import html as _html
import re
from html.parser import HTMLParser

from .normalize import normalize_inline

EXCLUDE_TAGS = frozenset(
    "script style head title noscript template svg iframe object embed".split()
)
CHROME_TAGS = frozenset("nav header footer aside".split())
BLOCK_TAGS = frozenset(
    "address article aside blockquote body button canvas caption dd div dl dt "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr html "
    "li main nav ol option p pre section table tbody td tfoot th thead tr ul".split()
)
VOID_TAGS = frozenset(
    "br hr img input meta link area base col embed source track wbr".split()
)
CHROME_ATTR_RE = re.compile(
    r"(?:^|[\s_-])(nav|menu|header|footer|sidebar|cookie|banner|related|promo"
    r"|ads?|advert|share|social|breadcrumbs?|popup|modal)(?:$|[\s_-])",
    re.IGNORECASE,
)


class _Extractor(HTMLParser):
    """Single-pass block segmenter with chrome / link-density accounting."""

    def __init__(self, raw: str) -> None:
        super().__init__(convert_charrefs=False)
        # line-start offsets for getpos()→absolute-offset conversion
        self._line_starts = [0]
        for m in re.finditer("\n", raw):
            self._line_starts.append(m.end())
        # element stack entries: (tag, is_chrome, is_exclude)
        self._stack: list[tuple[str, bool, bool]] = []
        self._exclude_depth = 0
        self._chrome_depth = 0
        self._anchor_depth = 0
        # current block accumulator
        self._parts: list[str] = []
        self._words = 0
        self._link_words = 0
        self._chrome_hit = False
        self._src_start = -1
        self._src_end = -1
        self.blocks: list[tuple[str, int, int, int, int, bool]] = []
        # (text, words, link_words, src_start, src_end, chrome_hit)

    def _abs_pos(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    def _flush(self) -> None:
        if not self._parts:
            return
        text = normalize_inline("".join(self._parts))
        if text:
            self.blocks.append(
                (text, self._words, self._link_words, self._src_start,
                 self._src_end, self._chrome_hit)
            )
        self._parts = []
        self._words = 0
        self._link_words = 0
        self._chrome_hit = False
        self._src_start = -1
        self._src_end = -1

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            if tag == "br" and not self._exclude_depth:
                self._parts.append(" ")
            if tag in BLOCK_TAGS:  # hr
                self._flush()
            return
        if tag in BLOCK_TAGS:
            self._flush()
        chrome = tag in CHROME_TAGS or any(
            k in ("class", "id") and v and CHROME_ATTR_RE.search(v)
            for k, v in attrs
        )
        exclude = tag in EXCLUDE_TAGS
        self._stack.append((tag, chrome, exclude))
        if chrome:
            self._chrome_depth += 1
        if exclude:
            self._exclude_depth += 1
        if tag == "a":
            self._anchor_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag == "br" and not self._exclude_depth:
            self._parts.append(" ")
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        # pop to the nearest matching open tag (tolerates mismatched markup)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for _tag, chrome, exclude in self._stack[i:]:
                    if chrome:
                        self._chrome_depth -= 1
                    if exclude:
                        self._exclude_depth -= 1
                    if _tag == "a":
                        self._anchor_depth -= 1
                del self._stack[i:]
                break

    def _add_text(self, decoded: str, raw_len: int) -> None:
        if self._exclude_depth or not decoded:
            return
        pos = self._abs_pos()
        if self._src_start < 0:
            self._src_start = pos
        self._src_end = pos + raw_len
        self._parts.append(decoded)
        n = len(decoded.split())
        self._words += n
        if self._anchor_depth > 0:
            self._link_words += n
        if self._chrome_depth > 0:
            self._chrome_hit = True

    def handle_data(self, data):
        self._add_text(data, len(data))

    def handle_entityref(self, name):
        self._add_text(_html.unescape(f"&{name};"), len(name) + 2)

    def handle_charref(self, name):
        try:
            cp = int(name[1:], 16) if name[0] in "xX" else int(name)
            decoded = chr(cp)
        except (ValueError, OverflowError):
            decoded = ""
        self._add_text(decoded, len(name) + 3)

    def close(self):
        super().close()
        self._flush()


def extract_html(raw: str) -> tuple[str, list[tuple[int, int, int, int, int]]]:
    """Return ``(extracted_text, spans)`` per SPEC.md §3.

    spans: list of (block_idx, start, end, src_start, src_end); start/end
    offsets into extracted_text, src_* into the raw markup.
    """
    parser = _Extractor(raw)
    parser.feed(raw)
    parser.close()

    out_parts: list[str] = []
    spans: list[tuple[int, int, int, int, int]] = []
    offset = 0
    idx = 0
    for text, words, link_words, src_start, src_end, chrome in parser.blocks:
        # KEEP rule (SPEC.md §3): non-chrome and link density <= 1/3
        if chrome or 3 * link_words > words:
            continue
        if out_parts:
            offset += 2  # '\n\n'
        out_parts.append(text)
        spans.append((idx, offset, offset + len(text), src_start, src_end))
        offset += len(text)
        idx += 1
    return "\n\n".join(out_parts), spans
