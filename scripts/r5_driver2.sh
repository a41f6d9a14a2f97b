#!/bin/bash
# Round-5 follow-on driver: waits for the scaled-run driver (r5_driver.sh)
# to release the TPU, then
#   1. numerics A/B: the remaining calibrated refnum seeds (1453, 7, 42) at
#      the x1.1 threshold (VERDICT r4 item 3) -> artifacts/ab_table_r5.json
#   2. sigma_loss A/B at seed 23: depth-only / depth+sigma / sigma-only at
#      equal budgets, sigma_lambda from the measured calibration
#      (artifacts/sigma_calibration_r5.json) (VERDICT r4 item 5)
#   3. occgrid speed bench vs plain app-init (VERDICT r4 item 6)
# committing artifacts after each stage. Stages are skipped past STOP_AFTER
# (epoch seconds) so the round driver's final bench finds a free TPU.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

STOP_AFTER=${STOP_AFTER:-$(date -d "tomorrow 03:05" +%s 2>/dev/null || echo 9999999999)}
APPINIT=/tmp/e2e_r3_depth/e2e/app_init/ckpts
DEPTH_CFG=startrax/configs/synthetic_star_online_depth.txt

PID=$(cat /tmp/r5_driver.pid 2>/dev/null || echo 0)
while [ "$PID" != "0" ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[driver2] $(date) flagship driver done; starting"

# ---- stage 1: calibrated refnum A/B, remaining seeds ----
for seed in 1453 7 42; do
    if [ "$(date +%s)" -ge "$STOP_AFTER" ]; then echo "[driver2] deadline; skip seed $seed"; break; fi
    echo "[driver2] $(date) A/B refnum calibrated seed $seed"
    timeout 1800 nice -n -10 python scripts/synthetic_e2e.py \
        --minutes 20 --out /tmp/ab_r5/seed${seed}_ref \
        --appinit_ckpt "$APPINIT" \
        --set seed=$seed --set reference_numerics=true \
        --set online_thres=2.2e-3 --set online_thres_tightened=1.045e-3 \
        > /tmp/ab_r5_seed${seed}.log 2>&1
    echo "[driver2] $(date) seed $seed rc=$?"
done

timeout 300 python - <<'PYEOF'
import json, os
rows = []
base = json.load(open("artifacts/ab_table_r4.json"))
for seed in (1453, 7, 42, 23):
    if seed == 23:
        r = dict(base["calibrated_rerun"]); rows.append(r); continue
    p = f"/tmp/ab_r5/seed{seed}_ref/summary.json"
    row = {"seed": seed, "reference_numerics": True,
           "online_thres_calibrated": 2.2e-3,
           "note": "r5: threshold scaled x1.1 into the refnum convention's "
                   "own units (artifacts/ab_threshold_calibration_r4.json)"}
    if os.path.exists(p):
        s = json.load(open(p))
        row.update({k: s.get(k) for k in (
            "curriculum_done", "frames_admitted", "online_epochs",
            "final_frame_psnr", "init_trans_error", "final_trans_error",
            "init_rot_error", "final_rot_error")})
    else:
        row["missing"] = True
    rows.append(row)
out = {"base_table_r4": base["base_table"], "calibrated_refnum": rows}
json.dump(out, open("artifacts/ab_table_r5.json", "w"), indent=2)
print(json.dumps(rows, indent=1))
PYEOF
git add artifacts/ab_table_r5.json && git commit -m "r5: calibrated refnum A/B rows (seeds 1453/7/42 + r4 seed 23)"

# ---- stage 3: occgrid speed bench ----
if [ "$(date +%s)" -lt "$STOP_AFTER" ]; then
    echo "[driver2] $(date) occgrid bench"
    timeout 1800 nice -n -10 python scripts/occgrid_bench.py --minutes 8 \
        --out /tmp/occgrid_bench > /tmp/occgrid_bench.log 2>&1
    echo "[driver2] $(date) occgrid bench rc=$?"
    cp -f /tmp/occgrid_bench/occgrid_bench.json artifacts/occgrid_bench_r5.json 2>/dev/null
    git add artifacts/occgrid_bench_r5.json && \
        git commit -m "r5: occgrid vs app-init time-to-loss bench"
fi
# ---- stage 2: sigma_loss A/B at seed 23 ----
for arm in depth sigma_only depth_sigma; do
    if [ "$(date +%s)" -ge "$STOP_AFTER" ]; then echo "[driver2] deadline; skip arm $arm"; break; fi
    EXTRA=()
    case $arm in
        depth) ;;
        sigma_only) EXTRA=(--set depth_loss=false --set sigma_loss=true --set sigma_lambda=7e-6) ;;
        depth_sigma) EXTRA=(--set sigma_loss=true --set sigma_lambda=7e-6) ;;
    esac
    echo "[driver2] $(date) sigma A/B arm $arm"
    timeout 1400 nice -n -10 python scripts/synthetic_e2e.py \
        --config "$DEPTH_CFG" --minutes 14 --out /tmp/sigma_r5/$arm \
        --appinit_ckpt "$APPINIT" --set seed=23 "${EXTRA[@]}" \
        > /tmp/sigma_r5_$arm.log 2>&1
    echo "[driver2] $(date) arm $arm rc=$?"
done

timeout 300 python - <<'PYEOF'
import json, os
calib = json.load(open("/tmp/sigma_calib2.json")) if os.path.exists("/tmp/sigma_calib2.json") else None
table = {"calibration": calib, "arms": {}}
for arm in ("depth", "sigma_only", "depth_sigma"):
    p = f"/tmp/sigma_r5/{arm}/summary.json"
    if os.path.exists(p):
        s = json.load(open(p))
        table["arms"][arm] = {k: s.get(k) for k in (
            "curriculum_done", "frames_admitted", "online_epochs",
            "final_frame_psnr", "init_trans_error", "final_trans_error",
            "init_rot_error", "final_rot_error")}
    else:
        table["arms"][arm] = {"missing": True}
json.dump(table, open("artifacts/sigma_ab_r5.json", "w"), indent=2)
print(json.dumps(table["arms"], indent=1))
PYEOF
cp -f /tmp/sigma_calib2.json artifacts/sigma_calibration_r5.json 2>/dev/null
git add artifacts/sigma_ab_r5.json artifacts/sigma_calibration_r5.json && \
    git commit -m "r5: sigma_loss A/B (depth / depth+sigma / sigma-only, calibrated lambda)"

echo "[driver2] $(date) DONE"
