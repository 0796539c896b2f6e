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
from pyspark.sql.types import IntegerType, StringType, StructType
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult


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


@udtf
class NgramsUDTF:
    """POLYMORPHIC table function: the output schema is COMPUTED at plan
    time by ``analyze()`` from the constant ``n`` — (pos, w1..wn). This
    is the Spark-4 dynamic-schema UDTF surface, for table functions
    whose arity a static ``returnType`` cannot express (the planner
    calls ``analyze`` once per call site; a non-constant ``n`` is
    rejected there, before execution). Tokenization contract matches
    BigramsUDTF; ``linq_ngrams(text, 2)`` emits exactly the bigram
    relation under different column names."""

    @staticmethod
    def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
        if (
            not n.isConstantExpression
            or n.value is None
            or int(n.value) < 1
        ):
            raise ValueError(
                "linq_ngrams(text, n): n must be a constant positive integer"
            )
        schema = StructType().add("pos", IntegerType())
        for i in range(int(n.value)):
            schema = schema.add(f"w{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text, n):
        toks = [t for t in (text or "").split() if t]
        for i in range(len(toks) - n + 1):
            yield (i, *toks[i : i + n])


def register_udtfs(spark) -> None:
    """Idempotent registration of the UDTF surface on a session."""
    spark.udtf.register("linq_bigrams", BigramsUDTF)
    spark.udtf.register("linq_ngrams", NgramsUDTF)
