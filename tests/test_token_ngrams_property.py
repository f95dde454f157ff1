"""Property test for token_ngrams (operators/decontaminate.py): for
arbitrary texts and every sweep setting, the Spark expression — in BOTH
its literal-n and Column-n forms (the r10 flatten depends on their
equivalence) — must equal the obvious pure-Python reference. Catches
empty tokens from repeated spaces, texts shorter than n, the boundary
text of exactly n tokens, and empty strings, which example-based tests
under-sample.

Hypothesis drives the CASE GENERATION only; each batch of cases executes
as ONE Spark job (a local createDataFrame), keeping runtime bounded.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# words of 0-3 chars (empty words model repeated spaces when joined)
_WORD = st.text(alphabet="abÄ五", min_size=0, max_size=3)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


def _py_ngrams(text: str, n: int) -> list[str]:
    toks = [t for t in text.split(" ") if t != ""]
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@given(texts=st.lists(_TEXT, min_size=1, max_size=8), n=st.integers(1, 9))
@settings(max_examples=25, deadline=None)
def test_token_ngrams_matches_python_reference(spark, texts, n):
    from log_agent_spark.operators.decontaminate import token_ngrams

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    rows = df.select(
        "i",
        token_ngrams(F.col("text"), n).alias("lit_form"),
        token_ngrams(F.col("text"), F.lit(n)).alias("col_form"),
    ).collect()
    for r in rows:
        expect = _py_ngrams(texts[r.i], n)
        assert r.lit_form == expect, (texts[r.i], n, r.lit_form, expect)
        assert r.col_form == expect, (texts[r.i], n, r.col_form, expect)
