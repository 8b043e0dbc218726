#!/usr/bin/env python3
"""Assemble APPEND_r15.json from the per-fixture append_bench outputs plus
the separately-measured serving numbers (the r14 `weak` fix: maintenance
and serving are now DIFFERENT measurements and the round artifact carries
both, never fused).

Usage: merge_append_r15.py <append40.json> <append400.json> <out.json>
Serving numbers are passed via env (SERVING_JSON: {"zipf1big": {...}, ...})
or edited into the note afterwards.
"""
import json
import os
import sys

a40, a400, out = sys.argv[1:4]
j40 = json.load(open(a40))
j400 = json.load(open(a400))

serving = json.loads(os.environ.get("SERVING_JSON", "{}"))

note = (
    "Round 15. Same generator and 1% delta layout as r14; medians of 3 "
    "fresh JVMs per side (append: pre-warmed durable store; rebuild: "
    "store disabled). NEW this round: the bm25 pair measures MAINTENANCE "
    "only (r14's weak) — bm25_maintain_postings_delta vs the full "
    "tokenize is the O(delta)-vs-O(n) postings-segment pair, and "
    "bm25_maintain_weights (append: REUSEd base postings + delta "
    "tokenize + re-weight; rebuild: full tokenize + weigh) is the honest "
    "O(n) weights-refresh pair; serving wall-clock (sim_bm25_topk, "
    "MaxScore path with persisted impact metadata) is recorded "
    "separately in `serving`. The embed pair lands its 400k measurement "
    "(r14: staged out at >35 min base prep) after the lshBitsFor 16-bit "
    "tier collapsed the clustered-corpus candidate explosion "
    "(ProbeEmbedPhases: 1.65e9 raw pairs / 1082 s distinct at 8 bits -> "
    "96M / ~10 s at 16). The canonical pairs re-measure under the "
    "corpus-derived occurrence-bucket count (occBucketCount: 64 at 40k "
    "-> 512 at 400k). Pairs measured at 400k in r14 and unchanged since "
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
