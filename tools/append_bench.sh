#!/bin/bash
# Append-vs-rebuild measurement over a fixture dir (default: the Zipf
# realistic-vocabulary corpus from graft.tools.ZipfFixture).
#
# Each measurement is ONE materialization in ONE fresh JVM (TimeEntry):
#   append side  -> durable store pre-warmed with the base artifacts
#                   (SPARK_GRAFT_INDEX_DIR), so the timed run pays
#                   delta-only work — the incremental-ingest shape;
#   rebuild side -> store disabled (SPARK_GRAFT_NO_INDEX_STORE=1), so the
#                   timed run pays the full from-scratch compute.
# Median of 3 per side; prints one PAIR line per family with the ratio.
#
# Usage: tools/append_bench.sh [fixtureDir] [warmStoreDir]
set -e
FIX=${1:-fixtures/zipf}
STORE=${2:-/tmp/zipf_warm_store}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
JAVA="java -cp $CP --add-exports java.base/sun.nio.ch=ALL-UNNAMED -Xmx24g"

PAIRS="
dedup_minhash_append:dedup_minhash_lsh
dedup_containment_append:dedup_containment
dedup_semdedup_append:dedup_semdedup
dedup_substring_append:dedup_substring
dedup_substring_canonical_append:dedup_substring_canonical
sim_bm25_append_topk:sim_bm25_topk
dedup_embed_append:dedup_embed_cosine
"

rm -rf "$STORE"
echo "# prep: warming $STORE with base artifacts (untimed)"
for p in $PAIRS; do
  a=${p%%:*}
  SPARK_GRAFT_INDEX_DIR=$STORE $JAVA graft.tools.TimeEntry "$FIX" "$a" >/dev/null 2>&1
done

median() { printf '%s\n' "$@" | sort -n | awk '{v[NR]=$1} END{print v[int((NR+1)/2)]}'; }

for p in $PAIRS; do
  a=${p%%:*}; r=${p##*:}
  at=(); rt=()
  for i in 1 2 3; do
    at+=("$(SPARK_GRAFT_INDEX_DIR=$STORE $JAVA graft.tools.TimeEntry "$FIX" "$a" 2>/dev/null | awk '/^TIME_ENTRY/{print $3}')")
    rt+=("$(SPARK_GRAFT_NO_INDEX_STORE=1 $JAVA graft.tools.TimeEntry "$FIX" "$r" 2>/dev/null | awk '/^TIME_ENTRY/{print $3}')")
  done
  am=$(median "${at[@]}"); rm_=$(median "${rt[@]}")
  ratio=$(python3 -c "print(round($am/$rm_,3))")
  echo "PAIR append=$a ${am}s rebuild=$r ${rm_}s ratio=$ratio (runs: append=${at[*]} rebuild=${rt[*]})"
done
