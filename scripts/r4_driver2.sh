#!/bin/bash
# Round-4 follow-on driver: waits for the flagship depth run driver
# (r4_driver.sh) to release the TPU, then
#   1. re-runs the verify recipe (commit gate for the multi-start work),
#   2. runs the numerics A/B confirmation: seed 23 under reference_numerics
#      with the admission threshold calibrated to the convention's own loss
#      units (artifacts/ab_threshold_calibration_r4.json: x1.1), the single
#      run that decides whether the r3 "stall" was threshold mis-calibration,
#   3. commits the resulting artifacts.
set -u
cd /root/repo

PID=$(cat /tmp/r4_driver.pid 2>/dev/null || echo 0)
while [ "$PID" != "0" ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[driver2] $(date) flagship driver done; starting"

timeout 1800 nice -n -10 python /tmp/verify_r4.py > /tmp/verify_r4b.log 2>&1
echo "[driver2] $(date) verify rc=$? ($(grep -c 'VERIFY OK' /tmp/verify_r4b.log) ok)"

# (frame-0 gauge estimator diagnostic ran interactively earlier in the
# round; artifacts/frame0_gauge_diag_r4*.json already committed)

timeout 2700 nice -n -10 python scripts/synthetic_e2e.py \
    --minutes 22 --out /tmp/ab_r4_seed23_ref \
    --appinit_ckpt /tmp/e2e_r3_depth/e2e/app_init/ckpts \
    --set seed=23 --set reference_numerics=true \
    --set online_thres=2.2e-3 --set online_thres_tightened=1.045e-3 \
    > /tmp/ab_r4_seed23.log 2>&1
echo "[driver2] $(date) seed-23 refnum calibrated rc=$?"
grep -a "^SUMMARY" /tmp/ab_r4_seed23.log | tail -1

timeout 300 python - <<'EOF'
import json, os
table = json.load(open("artifacts/ab_table_r3.json"))
row = {"seed": 23, "reference_numerics": True,
       "online_thres_calibrated": 2.2e-3, "note":
       "r4 confirmation: threshold scaled x1.1 into the refnum convention's "
       "own loss units (artifacts/ab_threshold_calibration_r4.json)"}
p = "/tmp/ab_r4_seed23_ref/summary.json"
if os.path.exists(p):
    s = json.load(open(p))
    row.update({k: s.get(k) for k in (
        "curriculum_done", "frames_admitted", "online_epochs",
        "final_frame_psnr", "init_trans_error", "final_trans_error",
        "init_rot_error", "final_rot_error")})
out = {"base_table": table, "calibrated_rerun": row}
json.dump(out, open("artifacts/ab_table_r4.json", "w"), indent=2)
print(json.dumps(row))
EOF

git add artifacts/ab_table_r4.json artifacts/ab_threshold_calibration_r4.json
git commit -m "r4: numerics A/B threshold calibration + seed-23 confirmation run" \
    artifacts/ab_table_r4.json artifacts/ab_threshold_calibration_r4.json
echo "[driver2] $(date) DONE"
