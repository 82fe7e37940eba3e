"""The router rule bank.

Reference analog: ``make_changes_list()`` returns rows of
``(rule_name, significance, matcher, triple_emitter)`` — 59 named Java rules
at /root/reference/src/ast/analyzing/langs/java/java_change.ml:519-782, with
per-language banks (Fortran f_change.ml:146-245, C++ cpp_change.ml:81-103).
The bank is *data*: rules are rows, not code.

Here each rule is ``(rule_id, sink, pattern, significance)``; patterns are
kept in the common subset of Python ``re`` and RE2 (no backreferences, no
lookaround) so the DuckDB oracle can evaluate the identical pattern with
``regexp_extract``. ``[\\s\\S]`` is used instead of DOTALL flags for
portability.

Unmatched turns route nowhere (only turn-level facts); rows can match
multiple rules and emit one routed fact per match — exactly the reference's
"edit used / unclassified" split
(/root/reference/src/ast/analyzing/common/change_base.ml:951-956).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Rule:
    rule_id: str
    sink: str
    pattern: str  # RE2-and-Python-re compatible
    significance: int  # 1-4, reference change_base.ml:72-78
    anchor: str  # literal substring every match contains — cheap prefilter


RULES: list[Rule] = [
    Rule(
        "r_tool_call",
        "tool_invocation",
        r"TOOL_CALL: name=(\w+) args=(\{[^\n]*\})",
        3,
        "TOOL_CALL: name=",
    ),
    Rule(
        "r_code_fence",
        "code_span",
        r"```(\w+)\n([\s\S]*?)\n```",
        2,
        "```",
    ),
    Rule(
        "r_traceback",
        "error_signature",
        r"Traceback \(most recent call last\):\n[\s\S]*?(\w+Error): ([^\n]*)",
        4,
        "Traceback (most recent call last):",
    ),
    Rule(
        "r_error_code",
        "error_signature",
        r"ERROR (\d+): ([^\n]*)",
        3,
        "ERROR ",
    ),
]

SINKS = ["tool_invocation", "code_span", "error_signature"]
DEAD_LETTER_SINK = "dead_letter"


def rules_df(spark):
    return spark.createDataFrame(
        [(r.rule_id, r.sink, r.pattern, r.significance) for r in RULES],
        "rule_id string, sink string, pattern string, significance int",
    )


def rules_values_sql() -> str:
    """Inline VALUES relation (rule metadata only; patterns are applied
    engine-side, not stored as SQL strings, to avoid double-escaping)."""
    rows = ", ".join(
        f"('{r.rule_id}', '{r.sink}', {r.significance})" for r in RULES
    )
    return f"(VALUES {rows}) AS rules(rule_id, sink, significance)"
