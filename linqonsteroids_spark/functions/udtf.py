"""Python user-defined TABLE functions (Spark 4 `@udtf`): the one-to-many
row generator surface, applied via LATERAL in SQL.

Reference parity: the reference's `flatMap` over a user function
(`expressiontree/FlatMap`, SURVEY §2.2) is the comprehension form of a
table function; the Spark-4 native equivalent for OPAQUE Python logic is
a registered UDTF consumed as `FROM t, LATERAL my_udtf(t.col)`. The
Arrow-optimized path (`useArrow=True`) batches rows through Arrow rather
than pickling one row at a time — the same slow-path discipline as the
pandas UDFs in functions/udf.py.

Kept deliberately small: UDTFs are for logic neither the built-in
generators (explode/posexplode/inline/sequence) nor SQL can express —
everything expressible stays JVM-side (the bigram tables in
queries/text.py build the SAME relation with split+transform+explode;
the UDTF here exists to gate the surface itself, oracle-matched against
the declarative construction).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, w1 string, w2 string", useArrow=True)
class BigramsUDTF:
    """(pos, w1, w2) for every adjacent whitespace-token pair — one
    output row per bigram, zero rows for texts with < 2 tokens.
    Tokenization matches regexp_split_to_array(trim(s), '\\s+') with
    empties filtered (Python str.split splits on any whitespace run)."""

    def eval(self, text):
        toks = [t for t in (text or "").split() if t]
        for i in range(len(toks) - 1):
            yield i, toks[i], toks[i + 1]


def register_udtfs(spark) -> None:
    """Idempotent registration of the UDTF surface on a session."""
    spark.udtf.register("linq_bigrams", BigramsUDTF)
