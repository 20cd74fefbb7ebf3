#!/usr/bin/env python
"""Merge a round's CORRECTNESS_r{N}.json into DRIVER_GREEN.json.

Run at the START of each round for the newest CORRECTNESS file so the
registry's rotation (registry.all_queries) pushes still-unchecked
queries into the driver's 50-query window:

    python scripts/update_driver_green.py CORRECTNESS_r02.json r02
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GREEN_PATH = os.path.join(ROOT, "DRIVER_GREEN.json")


def main() -> None:
    correctness_path, round_tag = sys.argv[1], sys.argv[2]
    with open(os.path.join(ROOT, correctness_path)) as f:
        results = json.load(f)
    try:
        with open(GREEN_PATH) as f:
            hist = json.load(f)
    except OSError:
        hist = {"green": {}, "checked": {}}
    except ValueError as e:
        # a corrupt/truncated history must STOP the merge, not silently
        # restart from empty (losing the rotation's accumulated state)
        raise SystemExit(
            f"{GREEN_PATH} exists but is not valid JSON ({e}); refusing to "
            "overwrite the rotation history — restore it from git first"
        )

    hist.setdefault("rows_recorded", {})
    n_new_green = n_new_checked = n_new_rows = 0
    for name, res in results.items():
        if name not in hist["checked"]:
            hist["checked"][name] = round_tag
            n_new_checked += 1
        if (
            res.get("rows_match")
            and res.get("schema_match")
            and res.get("hash_match")
            and name not in hist["green"]
        ):
            hist["green"][name] = round_tag
            n_new_green += 1
        if (
            res.get("err") == "no_oracle"
            and res.get("spark_rows") is not None
            and name not in hist["rows_recorded"]
        ):
            hist["rows_recorded"][name] = round_tag
            n_new_rows += 1

    hist["_doc"] = (
        "Driver-gate history: 'checked' = query appeared in a CORRECTNESS_r{N} "
        "window; 'green' = rows+schema+hash all true at least once; "
        "'rows_recorded' = an oracle-less query produced a clean rows-only row "
        "(err=no_oracle with a row count — NOT a crash). "
        "registry.all_queries() orders red-then-never-checked-then-done: a "
        "rows-only query is done once rows_recorded, red if it appeared but "
        "crashed."
    )
    # atomic publish: a crash mid-dump must not leave a truncated file
    # (registry.all_queries treats unreadable history as empty, silently
    # resetting the rotation)
    tmp = GREEN_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
    os.replace(tmp, GREEN_PATH)
    print(
        f"{round_tag}: +{n_new_checked} checked, +{n_new_green} green, "
        f"+{n_new_rows} rows-recorded (totals: {len(hist['checked'])} checked, "
        f"{len(hist['green'])} green, {len(hist['rows_recorded'])} rows-recorded)"
    )


if __name__ == "__main__":
    main()
