#!/usr/bin/env python3
"""Assemble APPEND_r16.json from the per-fixture append_bench outputs plus
the separately-measured serving numbers (maintenance and serving are
DIFFERENT measurements; the round artifact carries both, never fused).

Usage: merge_append_r16.py <append40.json> <append400.json> <out.json>
Serving numbers are passed via env SERVING_JSON, e.g.
  {"zipf1xl": {"sim_bm25_topk_warm_s": 12.3, "store": "cb=0 cr=4",
               "runs": [12.1, 12.3, 12.9]}}
"""
import json
import os
import sys

a40, a400, out = sys.argv[1:4]
j40 = json.load(open(a40))
j400 = json.load(open(a400))

serving = json.loads(os.environ.get("SERVING_JSON", "{}"))

note = (
    "Round 16 — the artifact r15 failed to land (its staged 400k sweep "
    "OOM-crashed at -Xmx24g; this sweep ran at XMX=40g). Same generator "
    "and delta layout as r14; medians of 3 fresh JVMs per side (append: "
    "pre-warmed durable store, TIME_ENTRY_STORE counters prove "
    "REUSE-only; rebuild: store disabled). The bm25 pairs measure "
    "MAINTENANCE only: bm25_maintain_postings_delta vs the full tokenize "
    "(O(delta) vs O(n) postings segment) and bm25_maintain_weights "
    "(append: REUSEd base postings + delta tokenize + re-weight; rebuild: "
    "full tokenize + weigh — an honestly-O(n) stats refresh, so its ratio "
    "reflects the tokenize saved, not sublinearity). The embed pair's "
    "400k row lands under the lshBitsFor 16-bit tier (8-bit produced "
    "1.65e9 raw candidate pairs there; ProbeEmbedPhases, ROUNDLOG r15). "
    "The canonical pairs re-measure under the corpus-derived "
    "occBucketCount (64 at 40k -> 512 at 400k). Serving wall-clock "
    "(sim_bm25_topk, MaxScore with persisted impact metadata) is in "
    "`serving`. Pairs measured at 400k in r14 and unchanged since "
    "(minhash 0.264, containment 0.123, semdedup_k512 0.142, "
    "substring_delta 0.107) are not re-run; see APPEND_r14.json."
)

json.dump(
    {
        "note": note,
        "serving": serving,
        "fixtures": [
            {"fixture": j40["fixture"], "n_docs": j40["n_docs"],
             "floor_s": j40["floor_s"], "pairs": j40["pairs"]},
            {"fixture": j400["fixture"], "n_docs": j400["n_docs"],
             "floor_s": j400["floor_s"], "pairs": j400["pairs"]},
        ],
    },
    open(out, "w"), indent=1)
print(f"wrote {out}")
