"""The router rule bank.

Reference analog: ``make_changes_list()`` returns rows of
``(rule_name, significance, matcher, triple_emitter)`` — 59 named Java rules
at /root/reference/src/ast/analyzing/langs/java/java_change.ml:519-782, with
per-language banks (Fortran f_change.ml:146-245, C++ cpp_change.ml:81-103).
The bank is *data*: rules are rows, not code.

Here each rule is ``(rule_id, sink, pattern, significance, anchor,
tool_scope)``; patterns are kept in the common subset of Python ``re`` and
RE2 (no backreferences, no lookaround) so the DuckDB oracle can evaluate the
identical pattern with ``regexp_extract``. ``[\\s\\S]`` is used instead of
DOTALL flags for portability.

``tool_scope`` implements per-tool sub-banks — the analog of the
reference's per-language rule banks (the Java bank only runs on Java pairs;
here the ``bash`` sub-bank only runs on ``tool='bash'`` turns). A scoped
rule is evaluated only on rows whose ``tool`` column equals the scope, in
all three evaluation paths (pandas kernel, Spark SQL strategy, DuckDB
oracle).

Unmatched turns route nowhere (only turn-level facts); rows can match
multiple rules and emit one routed fact per match — exactly the reference's
"edit used / unclassified" split
(/root/reference/src/ast/analyzing/common/change_base.ml:951-956).

Invariants every rule must hold (pinned by tests/test_rules_unit.py):
- every match contains ``anchor`` verbatim (the cheap literal prefilter);
- at most ONE match per rule per generated turn (lets the SQL strategy and
  the DuckDB oracle recover spans via first-occurrence ``instr``/``strpos``);
- at least one capture group (group 1 is the routed ``value``).
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
    tool_scope: str | None = None  # per-tool sub-bank (None = any tool)


RULES: list[Rule] = [
    # ------------------------------------------------ tool_invocation bank
    Rule(
        "r_tool_call",
        "tool_invocation",
        r"TOOL_CALL: name=(\w+) args=(\{[^\n]*\})",
        3,
        "TOOL_CALL: name=",
    ),
    Rule(
        "r_args_json",
        "tool_invocation",
        r"args=(\{[^\n]*\})",
        1,
        "args=",
    ),
    Rule(
        "r_file_path_arg",
        "tool_invocation",
        r'"path": "([\w./]+)"',
        2,
        '"path": "',
    ),
    Rule(
        "r_q_arg",
        "tool_invocation",
        r'"q": (\d+)',
        1,
        '"q": ',
    ),
    Rule(
        "r_tool_result_ok",
        "tool_invocation",
        r"OK rows=(\d+)",
        1,
        "OK rows=",
    ),
    # ------------------------------------------------------ code_span bank
    Rule(
        "r_code_fence",
        "code_span",
        r"```(\w+)\n([\s\S]*?)\n```",
        2,
        "```",
    ),
    Rule(
        "r_lang_tag",
        "code_span",
        r"```(\w+)",
        1,
        "```",
    ),
    Rule(
        "r_print_stmt",
        "code_span",
        r"print\(([^)\n]*)\)",
        1,
        "print(",
    ),
    Rule(
        "r_assignment",
        "code_span",
        r"x = (\d+)",
        1,
        "x = ",
    ),
    # ------------------------------------------------ error_signature bank
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
    Rule(
        "r_exc_class",
        "error_signature",
        r"(\w+Error): [^\n]*",
        3,
        "Error",
    ),
    Rule(
        "r_file_line_ref",
        "error_signature",
        r'File "([\w./]+)", line (\d+)',
        2,
        'File "',
    ),
    Rule(
        "r_http_5xx",
        "error_signature",
        r"ERROR 5(\d\d): upstream",
        3,
        "ERROR 5",
    ),
    Rule(
        "r_timeout_sig",
        "error_signature",
        r"upstream (timeout)",
        2,
        "upstream ",
    ),
    Rule(
        "r_warn_line",
        "error_signature",
        r"WARN ([^\n]*)",
        2,
        "WARN ",
    ),
    # ---------------------------------------------------- user_signal bank
    Rule(
        "r_item_ref",
        "user_signal",
        r"check item (\d+)",
        1,
        "check item ",
    ),
    Rule(
        "r_report_req",
        "user_signal",
        r"and (report)",
        1,
        "and ",
    ),
    Rule(
        "r_url_ref",
        "user_signal",
        r"https://([\w./-]+)",
        2,
        "https://",
    ),
    Rule(
        "r_priority",
        "user_signal",
        r"priority=p(\d)",
        1,
        "priority=p",
    ),
    # --------------------------------------------------- session_meta bank
    Rule(
        "r_session_start",
        "session_meta",
        r"session start for user (\d+)",
        1,
        "session start for user ",
    ),
    Rule(
        "r_deep_turn_header",
        "session_meta",
        r"turn (\d\d+) \[",
        1,
        "turn ",
    ),
    Rule(
        "r_retry_sched",
        "session_meta",
        r"retry (\d)/3 scheduled",
        1,
        "/3 scheduled",
    ),
    Rule(
        "r_render_ms",
        "session_meta",
        r"render (\d+)ms",
        1,
        "render ",
    ),
    Rule(
        "r_locale",
        "session_meta",
        r"locale=([a-z][a-z]-[A-Z][A-Z])",
        1,
        "locale=",
    ),
    # ------------------------------- per-tool sub-banks (tool_scope keyed),
    # the per-language-bank analog: the rule runs ONLY on rows whose tool
    # column equals the scope (java bank <-> java pairs).
    Rule(
        "r_bash_exec",
        "exec_audit",
        r"name=bash args=(\{[^\n]*\})",
        4,
        "name=bash",
        tool_scope="bash",
    ),
    Rule(
        "r_net_fetch",
        "exec_audit",
        r'name=http_get args=\{"q": (\d+)\}',
        2,
        "name=http_get",
        tool_scope="http_get",
    ),
    Rule(
        "r_fs_write",
        "exec_audit",
        r"name=write_file args=(\{[^\n]*\})",
        3,
        "name=write_file",
        tool_scope="write_file",
    ),
    Rule(
        "r_fs_edit",
        "exec_audit",
        r"name=edit args=(\{[^\n]*\})",
        3,
        "name=edit",
        tool_scope="edit",
    ),
    Rule(
        "r_search_q",
        "exec_audit",
        r'name=search args=\{"path": "([\w./]+)"\}',
        2,
        "name=search",
        tool_scope="search",
    ),
    Rule(
        "r_grep_q",
        "exec_audit",
        r'name=grep args=\{"q": (\d+)\}',
        1,
        "name=grep",
        tool_scope="grep",
    ),
    Rule(
        "r_read_file_q",
        "exec_audit",
        r'name=read_file args=\{"q": (\d+)\}',
        1,
        "name=read_file",
        tool_scope="read_file",
    ),
    Rule(
        "r_exit_code",
        "exec_audit",
        r"exit code (\d+)",
        3,
        "exit code ",
        tool_scope="bash",
    ),
    Rule(
        "r_write_bytes",
        "exec_audit",
        r"WROTE bytes=(\d+)",
        2,
        "WROTE bytes=",
        tool_scope=None,  # emitted by both write_file and edit turns
    ),
]

SINKS = [
    "tool_invocation",
    "code_span",
    "error_signature",
    "user_signal",
    "session_meta",
    "exec_audit",
]
DEAD_LETTER_SINK = "dead_letter"


def rules_df(spark):
    return spark.createDataFrame(
        [
            (r.rule_id, r.sink, r.pattern, r.significance, r.tool_scope)
            for r in RULES
        ],
        "rule_id string, sink string, pattern string, significance int, tool_scope string",
    )


def rules_values_sql() -> str:
    """Inline VALUES relation (rule metadata only; patterns are applied
    engine-side, not stored as SQL strings, to avoid double-escaping)."""
    rows = ", ".join(
        f"('{r.rule_id}', '{r.sink}', {r.significance})" for r in RULES
    )
    return f"(VALUES {rows}) AS rules(rule_id, sink, significance)"
