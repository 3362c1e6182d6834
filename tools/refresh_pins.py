#!/usr/bin/env python3
"""Refresh src/main/resources/bench_pins_sf0.1.json from clean bench logs.

Usage: python3 tools/refresh_pins.py <bench_log> [<bench_log> ...]

Each log must be a zero-suspect graft.Bench run. The new pin for a query is
the element-wise MIN of its medians across the given runs (the committed
convention: pins are the best clean observation, so the contention detector
flags anything that drifts far above the box's demonstrated capability).
Queries absent from every log keep no pin (unpinned until first clean run).
"""
import json
import re
import sys

pins = {}
for path in sys.argv[1:]:
    line = None
    for l in open(path):
        if '"metric":"total"' in l and '"queries"' in l:
            line = l
    if line is None:
        raise SystemExit(f"no bench JSON line in {path}")
    d = json.loads(re.search(r"\{.*\}", line).group())
    if d.get("suspect"):
        raise SystemExit(f"{path} has suspects {d['suspect']}; refuse to pin")
    for q, v in d["queries"].items():
        pins[q] = min(pins.get(q, v), v)

out = "{\n" + ",\n".join(f' "{q}": {round(v, 3)}' for q, v in sorted(pins.items())) + "\n}\n"
dest = "src/main/resources/bench_pins_sf0.1.json"
with open(dest, "w") as f:
    f.write(out)
print(f"wrote {len(pins)} pins to {dest}")
