"""Fold the freshly-measured 65536 row (H65K_r05.json) into
HELM2_SCALE_r05.json, replacing the r5-early OOM note row."""

import json

with open("/root/repo/H65K_r05.json") as f:
    h65k = json.load(f)
with open("/root/repo/HELM2_SCALE_r05.json") as f:
    rows = json.load(f)

rows = [r for r in rows if r.get("n") != 65536 and "note_65536" not in r]
rows.extend(h65k)
with open("/root/repo/HELM2_SCALE_r05.json", "w") as f:
    json.dump(rows, f, indent=1)
print(json.dumps(h65k[-1], indent=1))
