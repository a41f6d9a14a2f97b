#!/bin/bash
# Round-4 flagship driver: depth-supervised long-budget online run ->
# full test protocol on the best checkpoint -> artifacts committed.
#
# Launched as: nohup bash scripts/r4_driver.sh > /tmp/r4_driver.log 2>&1 &
#              echo $! > /tmp/r4_driver.pid
# (CLAUDE.md: post-run work belongs in the driver, not the session; every
# step bounded by timeout; progress readable from /tmp/r4_driver.log.)
set -u
cd /root/repo

OUT=/tmp/e2e_r4_depth
CFG=startrax/configs/synthetic_star_online_depth.txt
APPINIT=/tmp/e2e_r3_depth/e2e/app_init/ckpts
MINUTES=${R4_MINUTES:-170}

echo "[driver] $(date) stage 1: depth e2e run (${MINUTES} min)"
RESUME_ARGS=(--appinit_ckpt "$APPINIT")
if [ -n "${R4_RESUME:-}" ]; then
    RESUME_ARGS=(--resume_from "$R4_RESUME")
fi
# extra --set overrides, space-separated KEY=VALUE pairs
for kv in ${R4_EXTRA_SET:-}; do
    RESUME_ARGS+=(--set "$kv")
done
timeout $(( (MINUTES + 45) * 60 )) nice -n -10 \
    python scripts/synthetic_e2e.py --config "$CFG" --minutes "$MINUTES" \
    --out "$OUT" "${RESUME_ARGS[@]}" > /tmp/e2e_r4_depth.log 2>&1
RC1=$?
echo "[driver] $(date) stage 1 done rc=$RC1"

mkdir -p artifacts
cp -f "$OUT/summary.json" artifacts/e2e_r4_depth_summary.json 2>/dev/null
cp -f "$OUT/e2e/online/history.json" artifacts/e2e_r4_depth_history.json 2>/dev/null
for f in rgb target static dynamic depth; do
    cp -f "$OUT/final_$f.png" "artifacts/r4_final_$f.png" 2>/dev/null
done
cp -f "$OUT/tracking.gif" artifacts/r4_tracking.gif 2>/dev/null
cp -f "$OUT/tracking.mp4" artifacts/r4_tracking.mp4 2>/dev/null
grep -a "^SUMMARY" /tmp/e2e_r4_depth.log | tail -1

BEST="$OUT/e2e/online/ckpts_best"
[ -d "$BEST" ] || BEST="$OUT/e2e/online/ckpts"

echo "[driver] $(date) stage 2: test protocol on $BEST"
timeout 3600 nice -n -10 \
    python -m startrax.apps.online --config "$CFG" --test true \
    --basedir "$OUT" --expname e2e --online_ckpt_path "$BEST" \
    > /tmp/e2e_r4_test.log 2>&1
RC2=$?
echo "[driver] $(date) stage 2 done rc=$RC2"

TESTDIR="$OUT/e2e/online_test"
cp -f "$TESTDIR/metrics.jsonl" artifacts/e2e_r4_test_protocol.jsonl 2>/dev/null
cp -f "$TESTDIR"/poses_vehicle*.txt artifacts/ 2>/dev/null
cp -f "$TESTDIR"/view0.gif artifacts/r4_test_view0.gif 2>/dev/null
cp -f "$TESTDIR"/view0.mp4 artifacts/r4_test_view0.mp4 2>/dev/null

# condensed reference-shaped report from the protocol's metric rows
timeout 300 python - <<'EOF' > artifacts/e2e_r4_test_report.json 2>/tmp/r4_report_err.log
import json, numpy as np, collections
rows = [json.loads(l) for l in open("artifacts/e2e_r4_test_protocol.jsonl")]
acc = collections.defaultdict(list)
for r in rows:
    for k, v in r.items():
        if k.startswith("test/") and isinstance(v, (int, float)):
            acc[k].append(v)
report = {k: round(float(np.mean(v)), 5) for k, v in sorted(acc.items())}
print(json.dumps(report, indent=2))
EOF

# add each artifact individually — a single `git add` with one unmatched
# glob (e.g. no .mp4 when the gif fallback fired) aborts the whole pathspec
# list and silently skips the commit
for f in artifacts/e2e_r4_depth_summary.json artifacts/e2e_r4_depth_history.json \
         artifacts/e2e_r4_test_protocol.jsonl artifacts/e2e_r4_test_report.json \
         artifacts/r4_*.png artifacts/r4_*.gif artifacts/r4_*.mp4 \
         artifacts/poses_vehicle*.txt; do
    [ -e "$f" ] && git add "$f"
done
git commit -m "r4: depth-supervised long run + full test protocol artifacts"
echo "[driver] $(date) DONE rc1=$RC1 rc2=$RC2"
