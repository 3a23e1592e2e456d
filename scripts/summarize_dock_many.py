"""Summarize N cold-process bench runs into the dock_many-parity verdict.

Judge round-4 ask #3's done criterion: dock_many >= single-complex poses/s
on equal pose counts, 3 consecutive runs.  Each input file holds the bench
JSON line(s); the LAST parseable line is authoritative (bench.py emits an
early core line before the optional stages, then the enriched final line —
only the final one carries the dock_many fields).  Workload parity: both
paths run [batch]-sized chunks of the same bucket family; dock_many sources
its chunks from 4 fragment complexes at the same samples/complex
(BENCH_DM_SAMPLES defaults to BENCH_SAMPLES since round 5).
"""
import json
import sys


def last_json_line(path):
    out = None
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "value" in d:
                        out = d
    except OSError:
        pass
    return out


def main(paths):
    runs = [r for r in (last_json_line(p) for p in paths) if r]
    rows = []
    for r in runs:
        dm = r.get("dock_many_poses_per_sec")
        single = r.get("value")
        rows.append({
            "single_poses_per_sec": single,
            "dock_many_poses_per_sec": dm,
            "dock_many_over_single": (round(dm / single, 4)
                                      if dm and single else None),
            "dock_many_samples_per_complex":
                r.get("dock_many_samples_per_complex"),
            "dock_many_complexes": r.get("dock_many_complexes"),
        })
    ratios = [x["dock_many_over_single"] for x in rows
              if x["dock_many_over_single"] is not None]
    out = {
        "n_runs": len(rows),
        "runs": rows,
        "all_runs_have_dock_many_row": len(ratios) == len(rows) >= 3,
        "dock_many_ge_single_all": bool(ratios and len(ratios) >= 3
                                        and all(r >= 1.0 for r in ratios)),
        "dock_many_ge_095_single_all": bool(ratios and len(ratios) >= 3
                                            and all(r >= 0.95 for r in ratios)),
        "min_ratio": min(ratios) if ratios else None,
        "criterion": ("3 consecutive cold bench runs with the dock_many "
                      "row present and dock_many >= single-complex "
                      "poses/s at equal samples/complex (judge r4 ask #3)"),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
