"""html -> text extraction as a vectorized pandas/Arrow UDF.

The reference's analogue is the opaque image->embedding encoder
(/root/reference/src/refimage/models/clip_model.py:96-142); here the
per-row invariant (BASELINE.json input_hint) is that the extracted
text is **byte-identical per url** to the pages table's ``text``
column. The function is a pure, version-pinned transform of the bytes:

    1. decode utf-8 (errors=replace — charset edge cases stay deterministic)
    2. take the <article>...</article> span (the corpus' content region;
       everything else is boilerplate)
    3. drop <script>/<style> blocks and <!-- comments -->
    4. strip remaining tags
    5. unescape HTML entities (&#32; &amp; ...)

Runs Arrow-batched (pandas_udf), never per-row Python UDF.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1>", re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_py(raw: bytes) -> str:
    """Pure-python reference implementation (golden-tested)."""
    m = _ARTICLE_RE.search(raw)
    body = m.group(1) if m else raw
    s = body.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub("", s)
    s = _COMMENT_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _html.unescape(s)


@pandas_udf(T.StringType())
def extract_text_udf(html_bytes: pd.Series) -> pd.Series:
    return html_bytes.map(extract_text_py)


def extract_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return extract_text_udf(c)
