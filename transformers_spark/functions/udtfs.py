"""Python UDTFs (table functions) — the engine's mapping for
BigQuery ``CREATE TEMP TABLE FUNCTION`` statements (the table-valued
sibling of the JS scalar temp functions in
reference: samples/tasks/select/federated_table/query.sql:1-6).

Like the scalar registry, SQL/JS bodies are not portable: the engine
maps the function NAME to a registered Python UDTF class. PySpark
UDTFs run Arrow-batched on executors and are invoked directly in the
FROM clause (``SELECT * FROM splitToWords(col, ' ')``) or via
LATERAL joins.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["SplitToWords", "TopNTokens", "DEFAULT_UDTF_REGISTRY"]


@udtf(returnType="word string, pos int")
class SplitToWords:
    """Explode a string into (word, position) rows."""

    def eval(self, text: str | None, delim: str = " "):
        if text is None:
            return
        pos = 0
        for token in text.split(delim):
            if token:
                yield token, pos
                pos += 1


@udtf(returnType="token string, n_occurrences int")
class TopNTokens:
    """Most frequent whitespace tokens of a string, ties broken
    alphabetically."""

    def eval(self, text: str | None, n: int = 3):
        if text is None:
            return
        counts: dict[str, int] = {}
        for token in text.split():
            counts[token] = counts.get(token, 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        # clamp at 0: a negative n would slice from the END
        # (ranked[:-2] = everything but the two rarest) instead of
        # yielding nothing
        for token, count in ranked[: max(0, n or 0)]:
            yield token, count


# Ready-to-use registry for Engine(udtf_registry=...): name → UDTF class
DEFAULT_UDTF_REGISTRY: dict[str, object] = {
    "splitToWords": SplitToWords,
    "topNTokens": TopNTokens,
}
