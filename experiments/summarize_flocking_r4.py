"""Render experiments/diag_flocking_r4.json (JSONL, possibly partial)
as the RESULTS.md table + decomposition summary."""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    path = os.path.join(HERE, "diag_flocking_r4.json")
    rows, other = [], {}
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if d.get("tag") == "run":
                rows.append(d)
            elif "tag" in d:
                other.setdefault(d["tag"], []).append(d)
    exp = other.get("expert", [{}])[0].get("cost")
    print(f"expert cost: {exp}")
    print()
    print("| config | DAGger | pE | F | K | scaled | epochs | costFull "
          "| vs expert | costEnd | train_s |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: r["costFull"]):
        print(f"| {r['name']} | {r['dagger']} | {r['probExpert']} "
              f"| {r['F']} | {r['K']} | {'y' if r['scaled'] else ''} "
              f"| {r['epochs']} | {r['costFull']:.4f} "
              f"| {r['vs_expert']:.3f} | {r['costEnd']:.5f} "
              f"| {r['train_s']:.0f} |")
    for tag in ("best_explore", "best", "decomposition"):
        for d in other.get(tag, []):
            print()
            print(tag, json.dumps(d, indent=None))
    for d in other.get("error", []):
        print("ERROR:", d)


if __name__ == "__main__":
    main()
