"""Python ports of the JS temp functions appearing in the reference
corpus. BigQuery runs user JS via ``CREATE TEMP FUNCTION ... LANGUAGE
js``; the engine maps the function NAME to a registered Python UDF
(reference: samples/tasks/select/federated_table/query.sql:1-6 uses
``standardRule(fieldContent, rules)`` from a private gs:// library —
semantics reconstructed as a cleanup-style normalizer).
"""

from __future__ import annotations

__all__ = ["standard_rule", "DEFAULT_UDF_REGISTRY"]


def standard_rule(field_content: str | None, rules: list[str] | None) -> str | None:
    """Apply named cleanup rules to a string field. The only rule the
    corpus exercises is 'cleanup' (trim + collapse whitespace +
    lowercase); unknown rules pass the value through."""
    if field_content is None:
        return None
    out = field_content
    for rule in rules or []:
        if rule == "cleanup":
            out = " ".join(out.split()).strip().lower()
    return out


# Ready-to-use registry for Engine(udf_registry=...): name → (fn, ddl)
DEFAULT_UDF_REGISTRY: dict[str, tuple] = {
    "standardRule": (standard_rule, "string"),
}
