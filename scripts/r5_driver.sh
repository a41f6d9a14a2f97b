#!/bin/bash
# Round-5 flagship driver: the SCALED workload run (VERDICT r4 item 1) —
# 32 train views + 4 held-out at 192^2, the reference's workload envelope —
# then the full multi-view test protocol on the best checkpoint, artifacts
# committed.
#
# Launched as: nohup bash scripts/r5_driver.sh > /tmp/r5_driver.log 2>&1 &
#              echo $! > /tmp/r5_driver.pid
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

OUT=/tmp/e2e_r5_scaled
CFG=startrax/configs/synthetic_star_online_scaled.txt
MINUTES=${R5_MINUTES:-190}

echo "[driver] $(date) stage 1: scaled e2e run (${MINUTES} min)"
RESUME_ARGS=()
if [ -n "${R5_RESUME:-}" ]; then
    RESUME_ARGS=(--resume_from "$R5_RESUME")
fi
if [ -n "${R5_APPINIT_CKPT:-}" ]; then
    RESUME_ARGS+=(--appinit_ckpt "$R5_APPINIT_CKPT")
fi
for kv in ${R5_EXTRA_SET:-}; do
    RESUME_ARGS+=(--set "$kv")
done
timeout $(( (MINUTES + 50) * 60 )) nice -n -10 \
    python scripts/synthetic_e2e.py --config "$CFG" --minutes "$MINUTES" \
    --out "$OUT" "${RESUME_ARGS[@]}" > /tmp/e2e_r5_scaled.log 2>&1
RC1=$?
echo "[driver] $(date) stage 1 done rc=$RC1"

mkdir -p artifacts
cp -f "$OUT/summary.json" artifacts/e2e_r5_scaled_summary.json 2>/dev/null
cp -f "$OUT/e2e/online/history.json" artifacts/e2e_r5_scaled_history.json 2>/dev/null
for f in rgb target static dynamic depth; do
    cp -f "$OUT/final_$f.png" "artifacts/r5_final_$f.png" 2>/dev/null
done
cp -f "$OUT/tracking.gif" artifacts/r5_tracking.gif 2>/dev/null
cp -f "$OUT/tracking.mp4" artifacts/r5_tracking.mp4 2>/dev/null
grep -a "^SUMMARY" /tmp/e2e_r5_scaled.log | tail -1

BEST="$OUT/e2e/online/ckpts_best"
[ -d "$BEST" ] || BEST="$OUT/e2e/online/ckpts"

echo "[driver] $(date) stage 2: test protocol on $BEST"
timeout 4500 nice -n -10 \
    python -m startrax.apps.online --config "$CFG" --test true \
    --basedir "$OUT" --expname e2e --online_ckpt_path "$BEST" \
    > /tmp/e2e_r5_test.log 2>&1
RC2=$?
echo "[driver] $(date) stage 2 done rc=$RC2"

TESTDIR="$OUT/e2e/online_test"
cp -f "$TESTDIR/metrics.jsonl" artifacts/e2e_r5_test_protocol.jsonl 2>/dev/null
cp -f "$TESTDIR"/poses_vehicle*.txt artifacts/ 2>/dev/null
cp -f "$TESTDIR"/view0.gif artifacts/r5_test_view0.gif 2>/dev/null
cp -f "$TESTDIR"/view0.mp4 artifacts/r5_test_view0.mp4 2>/dev/null

timeout 300 python - <<'PYEOF' > artifacts/e2e_r5_test_report.json 2>/tmp/r5_report_err.log
import json, numpy as np, collections
rows = [json.loads(l) for l in open("artifacts/e2e_r5_test_protocol.jsonl")]
acc = collections.defaultdict(list)
for r in rows:
    for k, v in r.items():
        if k.startswith("test/") and isinstance(v, (int, float)):
            acc[k].append(v)
report = {k: round(float(np.mean(v)), 5) for k, v in sorted(acc.items())}
report["n_rows"] = len(rows)
print(json.dumps(report, indent=2))
PYEOF

for f in artifacts/e2e_r5_scaled_summary.json artifacts/e2e_r5_scaled_history.json \
         artifacts/e2e_r5_test_protocol.jsonl artifacts/e2e_r5_test_report.json \
         artifacts/r5_*.png artifacts/r5_*.gif artifacts/r5_*.mp4 \
         artifacts/poses_vehicle*.txt; do
    [ -e "$f" ] && git add "$f"
done
git commit -m "r5: scaled-workload run (32 views, 192^2) + multi-view test protocol artifacts"
echo "[driver] $(date) DONE rc1=$RC1 rc2=$RC2"
