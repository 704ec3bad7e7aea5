"""Python UDTF surface (net-new Spark 4 API; no analog in the reference).

A UDTF is the extension point for one-row → many-rows logic that built-in
generators (``explode``/``posexplode``/``stack``/``inline``) can't express —
e.g. parsers that carry state across emitted rows. The demo UDTF here IS
expressible with explode+filter (and its oracle twin proves the outputs
match); real use cases are custom tokenizers, document segmenters, and
format parsers.

Scale notes: a UDTF is a Python-process boundary (slowest path in the
engine's hierarchy: builtin expr > pandas UDF > UDTF ≈ Python UDF). Arrow
transfer is enabled per-UDTF via ``useArrow=True``. Keep them off hot paths;
when the logic fits a higher-order function or explode, use that instead.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="tok string, tok_len int", useArrow=True)
class LongTokens:
    """Emit (token, length) for each whitespace token of ``text`` with at
    least ``min_len`` characters. One eval() call per input row; yields any
    number of output rows — the table-function contract."""

    def eval(self, text: str, min_len: int):  # noqa: D102
        if text is None:
            return
        for tok in text.lower().split():
            if len(tok) >= min_len:
                yield tok, len(tok)


def register_udtfs(spark: SparkSession) -> None:
    """Make the UDTFs addressable from SQL (``LATERAL long_tokens(...)``)."""
    spark.udtf.register("long_tokens", LongTokens)
