"""Re-judge the GT-free best-epoch selection criterion on SAVED run
histories (no new TPU run needed) — VERDICT r4 item 4.

The r4 finding: the every-epoch photometric(+depth) criterion conflates
post-adoption field re-convergence with pose quality — right after a
multi-start adoption or a gauge correction the fields have not re-converged
to the new poses, so the held-out score of a *better-posed* state can be
transiently worse, and conversely a long-settled worse-posed state can
score best. The builder's own protocol fix (STATUS r4 "r5 note"): score
candidates only at ALTERNATION-ROUND BOUNDARIES — the epoch that completes
a field->pose alternation round, where the fields have fully re-converged
to the current poses and the pose polish has settled.

This script replays both protocols over every committed history that
carries (score, phase, GT pose errors) rows and compares each protocol's
pick against the GT-pose oracle (the pick a GT-error-ranked selection would
make), restricted to the same candidate set:

  every_epoch    pick = argmin score over all scored epochs
  boundary_only  pick = argmin score over round-boundary epochs
                 (last polish_pose/pose epoch of each alternation round)
  oracle         pick = argmin mean(trans)+mean(rot) over the same set

Writes artifacts/selection_rejudge_r5.json. The boundary protocol ships as
the `selection_boundary_only` config flag (apps/online.py).

Reference context: the reference keeps the FINAL epoch and logs val metrics
per epoch (train_online__.py:632-652) — it has no selection problem because
it also has no basin-hopping; selection is a startrax capability that must
not mis-rank its own candidates.
"""

import json
import os
import sys

import numpy as np

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")

# histories with per-epoch (score, phase, trans, rot) rows
HISTORIES = [
    "e2e_r4_depth_history.json",        # the r4 flagship continuation
    "e2e_r4_frame0_gauge_history.json",
    "e2e_r3_gauge2_history.json",
    "e2e_r3_gauge_history.json",
    "e2e_r3_alternate_history.json",
    "e2e_r3_highlr_pose_history.json",
]

POSE_PHASES = ("polish_pose", "pose", "refit_pose")


def _boundaries(rows):
    """Indices of alternation-round boundaries: the last consecutive
    pose-phase epoch of each field->pose round (the settled state the r5
    protocol scores)."""
    idx = []
    for i, r in enumerate(rows):
        if r.get("phase") in POSE_PHASES:
            nxt = rows[i + 1].get("phase") if i + 1 < len(rows) else None
            if nxt not in POSE_PHASES:
                idx.append(i)
    return idx


def _gt_key(r):
    return float(np.mean(r["trans"])) + float(np.mean(r["rot"]))


def _pick(rows, idx):
    """(criterion pick, oracle pick) over the candidate index set."""
    scored = [i for i in idx if "score" in rows[i]]
    if not scored:
        return None, None
    crit = min(scored, key=lambda i: rows[i]["score"])
    oracle = min(scored, key=lambda i: _gt_key(rows[i]))
    return crit, oracle


def _row_info(rows, i):
    r = rows[i]
    return {
        "epoch": r["epoch"],
        "score": r.get("score"),
        "trans": r["trans"],
        "rot": r["rot"],
        "mean_rot": round(float(np.mean(r["rot"])), 5),
        "mean_trans": round(float(np.mean(r["trans"])), 5),
    }


def judge(path):
    rows = json.load(open(path))
    scored_all = [i for i, r in enumerate(rows)
                  if "score" in r and "rot" in r]
    if not scored_all:
        return None
    b_idx = [i for i in _boundaries(rows) if "score" in rows[i]]

    crit_all, oracle_all = _pick(rows, scored_all)
    crit_b, oracle_b = _pick(rows, b_idx)

    out = {
        "n_epochs": len(rows),
        "n_scored": len(scored_all),
        "n_boundaries": len(b_idx),
        "every_epoch": {
            "criterion": _row_info(rows, crit_all),
            "oracle": _row_info(rows, oracle_all),
        },
    }
    # gap = how much worse (mean rot / mean trans) the criterion's pick is
    # than the oracle's on the same candidate set
    def gap(c, o):
        return {
            "rot_gap": round(float(np.mean(rows[c]["rot"])
                                   - np.mean(rows[o]["rot"])), 5),
            "trans_gap": round(float(np.mean(rows[c]["trans"])
                                     - np.mean(rows[o]["trans"])), 5),
        }

    out["every_epoch"].update(gap(crit_all, oracle_all))
    if crit_b is not None:
        out["boundary_only"] = {
            "criterion": _row_info(rows, crit_b),
            "oracle": _row_info(rows, oracle_b),
            **gap(crit_b, oracle_b),
        }
        # the headline comparison: does the boundary protocol's pick come
        # closer to the ORACLE-OVER-ALL-EPOCHS rot than the every-epoch
        # protocol's pick does?
        out["rot_vs_global_oracle"] = {
            "every_epoch_pick": round(float(np.mean(rows[crit_all]["rot"])), 5),
            "boundary_pick": round(float(np.mean(rows[crit_b]["rot"])), 5),
            "global_oracle": round(float(np.mean(rows[oracle_all]["rot"])), 5),
        }
    return out


def main():
    report = {}
    for name in HISTORIES:
        path = os.path.join(ART, name)
        if not os.path.exists(path):
            continue
        r = judge(path)
        if r:
            report[name] = r

    # The SHIPPED rule (selection_boundary_only, apps/online.py): prefer the
    # best-scoring round boundary when the run produced >= 2 boundary
    # candidates, else fall back to the every-epoch best. Pure boundary-only
    # is fragile: a history with a single boundary (e.g. e2e_r3_gauge, whose
    # one boundary sits on the duplicate-mode gauge jump, rot 0.31) has no
    # selection at all and forces a catastrophic pick.
    for name, r in list(report.items()):
        if "boundary_only" not in r:
            continue
        use_boundary = r["n_boundaries"] >= 2
        src = r["boundary_only"] if use_boundary else r["every_epoch"]
        r["shipped_rule"] = {
            "used": "boundary" if use_boundary else "every_epoch_fallback",
            "criterion": src["criterion"],
            "rot_gap_vs_global_oracle": round(
                src["criterion"]["mean_rot"]
                - r["every_epoch"]["oracle"]["mean_rot"], 5),
        }

    # aggregate: mean rot-gap to the GLOBAL oracle under each protocol
    ee, bo, sh = [], [], []
    for r in report.values():
        if "rot_vs_global_oracle" in r:
            g = r["rot_vs_global_oracle"]
            ee.append(g["every_epoch_pick"] - g["global_oracle"])
            bo.append(g["boundary_pick"] - g["global_oracle"])
            sh.append(r["shipped_rule"]["rot_gap_vs_global_oracle"])
    report["_aggregate"] = {
        "histories_with_boundaries": len(bo),
        "mean_rot_gap_every_epoch": round(float(np.mean(ee)), 5) if ee else None,
        "mean_rot_gap_boundary_only": round(float(np.mean(bo)), 5) if bo else None,
        "mean_rot_gap_shipped_rule": round(float(np.mean(sh)), 5) if sh else None,
        "verdict": None,
    }
    if ee and sh:
        better = float(np.mean(sh)) < float(np.mean(ee))
        report["_aggregate"]["verdict"] = (
            "shipped rule (boundary picks, every-epoch fallback below 2 "
            "boundaries) picks closer to the GT oracle's rot than every-epoch"
            if better else
            "shipped rule does NOT improve the rot gap on the saved histories")

    out_path = os.path.join(ART, "selection_rejudge_r5.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print("wrote", out_path, file=sys.stderr)


if __name__ == "__main__":
    main()
