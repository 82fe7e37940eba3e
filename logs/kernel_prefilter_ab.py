"""Microbench: the shipped Arrow partials kernel (count_substring_regex on
ALL rows per rule) vs an anchor/scope-prefiltered variant (SIMD
match_substring + role/tool masks first, RE2 only on candidate rows).
Output parity is asserted batch-for-batch before timing is reported.
Run on real sf0.1 batches pulled through the same load_transcripts path
the pipeline uses."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from cca_spark.operators.parse import _extract_partials_arrow
from cca_spark.rules import RULES


def _extract_partials_arrow_prefiltered(batch):
    idx = {name: i for i, name in enumerate(batch.schema.names)}
    texts = batch.column(idx["text"])
    roles_arr = batch.column(idx["role"])
    tools_arr = batch.column(idx["tool"])
    n_rows = len(texts)
    sink_counts: dict[str, np.ndarray] = {}
    role_masks: dict[str, np.ndarray] = {}
    tool_masks: dict[str, np.ndarray] = {}
    # (anchor, role_scope, tool_scope) -> (np.ndarray indices, pa.Array subset)
    cand_cache: dict[tuple, tuple] = {}
    for rule in RULES:
        key = (rule.anchor, rule.role_scope, rule.tool_scope)
        cached = cand_cache.get(key)
        if cached is None:
            mask = pc.fill_null(
                pc.match_substring(texts, pattern=rule.anchor), False
            ).to_numpy(zero_copy_only=False)
            if rule.role_scope is not None:
                m = role_masks.get(rule.role_scope)
                if m is None:
                    m = pc.fill_null(pc.equal(roles_arr, rule.role_scope), False).to_numpy(
                        zero_copy_only=False
                    )
                    role_masks[rule.role_scope] = m
                mask = mask & m
            if rule.tool_scope is not None:
                m = tool_masks.get(rule.tool_scope)
                if m is None:
                    m = pc.fill_null(pc.equal(tools_arr, rule.tool_scope), False).to_numpy(
                        zero_copy_only=False
                    )
                    tool_masks[rule.tool_scope] = m
                mask = mask & m
            idxs = np.nonzero(mask)[0]
            sub = texts.take(pa.array(idxs)) if len(idxs) else None
            cached = (idxs, sub)
            cand_cache[key] = cached
        idxs, sub = cached
        if sub is None:
            continue
        cnt_sub = (
            pc.fill_null(pc.count_substring_regex(sub, pattern=rule.pattern), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if not cnt_sub.any():
            continue
        acc = sink_counts.get(rule.sink)
        if acc is None:
            acc = np.zeros(n_rows, dtype=np.int64)
            sink_counts[rule.sink] = acc
        acc[idxs] += cnt_sub
    if not sink_counts:
        return None
    date = pc.floor_temporal(batch.column(idx["ts"]), unit="day")
    base = pd.DataFrame(
        {
            "conv_id": batch.column(idx["conv_id"]).to_pandas(),
            "tool": tools_arr.to_pandas(),
            "date_bucket": date.to_pandas(),
        }
    )
    outs = []
    for sink, arr in sink_counts.items():
        nzm = arr > 0
        if not nzm.any():
            continue
        g = base[nzm].copy()
        g["n"] = arr[nzm]
        g["sink"] = sink
        outs.append(g)
    if not outs:
        return None
    facts = pd.concat(outs, ignore_index=True)
    out = (
        facts.groupby(["conv_id", "tool", "date_bucket", "sink"], dropna=False)["n"]
        .sum()
        .reset_index()
    )
    out["tool"] = out["tool"].where(pd.notna(out["tool"]), None)
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("tool", pa.string()),
            ("date_bucket", pa.timestamp("us")),
            ("sink", pa.string()),
            ("n", pa.int64()),
        ]
    )
    return pa.RecordBatch.from_pandas(
        out[["conv_id", "tool", "date_bucket", "sink", "n"]],
        schema=schema,
        preserve_index=False,
    )


def main():
    from cca_spark.session import get_spark
    from cca_spark.transcripts import load_transcripts

    spark = get_spark(app_name="kernel_prefilter_ab")
    pdf = (
        load_transcripts(spark, "/root/testdata/sf0.1")
        .limit(40000)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .toPandas()
    )
    spark.stop()
    batches = [
        pa.RecordBatch.from_pandas(pdf.iloc[i : i + 10000], preserve_index=False)
        for i in range(0, len(pdf), 10000)
    ]
    # parity first
    for i, b in enumerate(batches):
        a = _extract_partials_arrow(b)
        p = _extract_partials_arrow_prefiltered(b)
        at = pa.Table.from_batches([a]).to_pandas().sort_values(
            ["conv_id", "tool", "date_bucket", "sink"]
        ).reset_index(drop=True)
        ptb = pa.Table.from_batches([p]).to_pandas().sort_values(
            ["conv_id", "tool", "date_bucket", "sink"]
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(at, ptb)
    # timing: alternate, 5 rounds over all batches
    t_base, t_pref = [], []
    for r in range(5):
        t0 = time.time()
        for b in batches:
            _extract_partials_arrow(b)
        t_base.append(time.time() - t0)
        t0 = time.time()
        for b in batches:
            _extract_partials_arrow_prefiltered(b)
        t_pref.append(time.time() - t0)
    # anchor-hit-rate diagnostics
    b = batches[0]
    texts = b.column(b.schema.names.index("text"))
    rates = {}
    for rule in RULES[:200]:
        m = pc.fill_null(pc.match_substring(texts, pattern=rule.anchor), False)
        rates[rule.rule_id] = round(pc.sum(m).as_py() / len(texts), 4)
    print(
        json.dumps(
            {
                "parity": "ok",
                "base_s": [round(x, 3) for x in t_base],
                "prefiltered_s": [round(x, 3) for x in t_pref],
                "base_min": round(min(t_base), 3),
                "pref_min": round(min(t_pref), 3),
                "anchor_hit_rates_head": dict(list(rates.items())[:15]),
                "mean_hit_rate": round(sum(rates.values()) / len(rates), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
