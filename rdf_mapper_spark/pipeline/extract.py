"""HTML -> text extraction with a per-url byte-identity invariant.

`extract_text` is the single reference implementation (pure Python); the
Spark path wraps the SAME function in an Arrow-vectorized pandas UDF, so the
distributed result is byte-identical to the reference extractor by
construction (BASELINE.json input_hint invariant). Tests assert equality
per url against driver-side application.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SCRIPT_RX = re.compile(rb"<(script|style)\b[^>]*>.*?</\1>", re.DOTALL | re.IGNORECASE)
_COMMENT_RX = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RX = re.compile(rb"<[^>]+>")
_WS_RX = re.compile(r"\s+")


def extract_text(html: bytes | None) -> str | None:
    """The reference extractor: drop script/style/comments/tags, collapse
    whitespace. Deterministic; used verbatim on both driver and executors."""
    if html is None:
        return None
    raw = _SCRIPT_RX.sub(b" ", html)
    raw = _COMMENT_RX.sub(b" ", raw)
    raw = _TAG_RX.sub(b" ", raw)
    text = raw.decode("utf-8", errors="replace")
    return _WS_RX.sub(" ", text).strip()


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def with_extracted_text(df, html_col: str = "html",
                        out_col: str = "extracted_text"):
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
