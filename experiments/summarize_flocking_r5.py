"""Summarize diag_flocking_r5.jsonl into the RESULTS.md table."""

import json
import sys

rows = []
for line in open("experiments/diag_flocking_r5.jsonl"):
    r = json.loads(line)
    if r.get("tag") == "config" and not r.get("quick") \
            and r.get("expert_cost", 0) > 1.0:   # commRadius=2.0 runs
        rows.append(r)

rows.sort(key=lambda r: r["cost_best_full"] / r["expert_cost"])
print(f"{'config':9s} {'seed':4s} {'DAGger':17s} {'loss':4s} "
      f"{'ep':>3s} {'expert':>7s} {'best':>7s} {'x-expert':>8s} "
      f"{'wall':>6s}")
for r in rows:
    print(f"{r['name']:9s} {r['seed']:<4d} {r['DAGgerType']:17s} "
          f"{r['loss']:4s} {r['nEpochs']:3d} {r['expert_cost']:7.3f} "
          f"{r['cost_best_full']:7.3f} "
          f"{r['cost_best_full'] / r['expert_cost']:8.3f} "
          f"{r['wall_s']:5.0f}s")
