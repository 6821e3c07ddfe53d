"""File-path column functions (reference F8/F13).

The reference dispatches on ``Path(file_path).suffix.lower()``
(/root/reference/text_extractor.py:849-866) and reports
``Path(file_path).stem`` (/root/reference/cli.py:102-110 previews,
gui file lists). A table pipeline has no file paths for the *payload*
(it IS a column), but ingest manifests and object-store listings carry a
path/URI column — these are the native column expressions for it, all
JVM-side regexp (codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pathlib semantics, checked case-by-case against PurePath: dotfiles like
# '.gitignore' have NO extension and keep the dot in the stem; 'x.tar.gz'
# → ext 'gz', stem 'x.tar'. Applied to the NAME (last segment); a
# trailing-slash path has name '' (the one divergence from pathlib, which
# ignores trailing slashes).
_EXT_RE = r"^.+\.([^.]+)$"
_STEM_RE = r"^(.+?)(?:\.[^.]+)?$"
_NAME_RE = r"([^/\\]*)$"


def path_name(col: Column | str) -> Column:
    """Final path segment (``Path(p).name``)."""
    return F.regexp_extract(F.col(col) if isinstance(col, str) else col,
                            _NAME_RE, 1)


def path_ext(col: Column | str) -> Column:
    """Lower-cased extension WITHOUT the dot (F8 —
    ``Path(p).suffix.lower().lstrip('.')``); '' when none."""
    name = path_name(col)
    return F.lower(F.regexp_extract(name, _EXT_RE, 1))


def path_stem(col: Column | str) -> Column:
    """Filename without its last extension (F13 — ``Path(p).stem``)."""
    return F.regexp_extract(path_name(col), _STEM_RE, 1)


def method_for_ext(ext: Column) -> Column:
    """Extension → extraction-method dispatch (reference P1 table,
    text_extractor.py:773-774,849-866)."""
    return (
        F.when(ext.isin("png", "jpg", "jpeg", "bmp", "tiff", "pgm", "ppm"),
               F.lit("ocr"))
        .when(ext == "pdf", F.lit("pdf"))
        .when(ext == "docx", F.lit("docx"))
        .when(ext.isin("xlsx", "xls"), F.lit("excel"))
        .when(ext.isin("pptx", "ppt"), F.lit("powerpoint"))
        .when(ext.isin("html", "htm"), F.lit("html"))
        .otherwise(F.lit("text"))
    )
