import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, pandas as pd
from cca_spark.operators.parse import _extract_batch, compile_bank, KERNEL_FACT_COLUMNS
from cca_spark.rules import RULES

def _extract_batch_novalue(pdf, bank):
    texts_s = pdf["text"].fillna("")
    tools_s = pdf["tool"]
    texts = texts_s.tolist()
    from cca_spark.operators.parse import _candidate_masks
    masks = _candidate_masks(texts_s, tools_s, pdf["role"], bank)
    hits = []
    for j, (rule, cre, sfn) in enumerate(bank):
        finditer = cre.finditer
        base = rule.significance
        for i in np.nonzero(masks[j].to_numpy())[0]:
            for m in finditer(texts[i]):
                hits.append((i, j, m.start(), m.end(), base if sfn is None else sfn(m)))
    if hits:
        ix = np.fromiter((h[0] for h in hits), dtype=np.int64, count=len(hits))
        rj = np.fromiter((h[1] for h in hits), dtype=np.int64, count=len(hits))
    else:
        ix = rj = np.empty(0, dtype=np.int64)
    rule_ids = np.array([r.rule_id for r, _, _ in bank], dtype=object)
    sinks = np.array([r.sink for r, _, _ in bank], dtype=object)
    res = pd.DataFrame({
        "conv_id": pdf["conv_id"].to_numpy()[ix],
        "turn_idx": pdf["turn_idx"].to_numpy()[ix].astype("int32"),
        "role": pdf["role"].to_numpy()[ix],
        "tool": pdf["tool"].to_numpy()[ix],
        "ts": pdf["ts"].to_numpy()[ix],
        "rule_id": rule_ids[rj],
        "sink": sinks[rj],
        "significance": np.fromiter((h[4] for h in hits), dtype=np.int32, count=len(hits)),
        "span_start": np.fromiter((h[2] for h in hits), dtype=np.int32, count=len(hits)),
        "span_end": np.fromiter((h[3] for h in hits), dtype=np.int32, count=len(hits)),
    })
    res["ts"] = pd.to_datetime(res["ts"])
    return res

from cca_spark.session import get_spark
from cca_spark.transcripts import load_transcripts
spark = get_spark(app_name="kernel_value_ab")
pdf = (load_transcripts(spark, "/root/testdata/sf0.1").limit(40000)
       .select("conv_id","turn_idx","role","text","tool","ts").toPandas())
spark.stop()
batches = [pdf.iloc[i:i+10000] for i in range(0, len(pdf), 10000)]
bank = compile_bank()
t_full, t_nv = [], []
val_bytes = 0
for r in range(5):
    t0=time.time()
    outs=[_extract_batch(b, bank) for b in batches]
    t_full.append(time.time()-t0)
    t0=time.time()
    outs_nv=[_extract_batch_novalue(b, bank) for b in batches]
    t_nv.append(time.time()-t0)
if True:
    o = pd.concat(outs)
    val_bytes = int(o["value"].str.len().sum())
    total_rows = len(o)
print(json.dumps({"full_s": [round(x,3) for x in t_full], "novalue_s": [round(x,3) for x in t_nv],
                  "full_min": round(min(t_full),3), "novalue_min": round(min(t_nv),3),
                  "n_facts": total_rows, "value_bytes": val_bytes}))
