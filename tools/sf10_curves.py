#!/usr/bin/env python3
"""Assemble BENCH_sf10_subset.json: per-query wall-clock at sf0.1
(bench3_min.json, min-of-3), sf1 (BENCH_sf1.json), and sf10 (the
subset run passed as argv[1]), with the decade scaling exponents
e01_1 = log10(t_sf1/t_sf01) and e1_10 = log10(t_sf10/t_sf1) — 1.0
means linear in data size, <1 sub-linear, 2.0 quadratic. A query is
flagged "suspect" when its second decade is super-linear (e1_10 >
1.3), the same bar the round-6 campaign used at 10x.

Usage: python3 tools/sf10_curves.py /tmp/bench_sf10_raw.json > BENCH_sf10_subset.json
"""
import json
import math
import sys


def main():
    sf10 = json.load(open(sys.argv[1]))
    sf01 = json.load(open("bench3_min.json"))["queries"]
    sf1 = json.load(open("BENCH_sf1.json"))["queries"]
    out = {}
    for name, t10 in sorted(sf10["queries"].items()):
        t01, t1 = sf01.get(name), sf1.get(name)
        row = {"sf0_1_s": t01, "sf1_s": t1, "sf10_s": round(t10, 3)}
        if t01 and t1 and t01 > 0 and t1 > 0 and t10 > 0:
            row["e01_1"] = round(math.log10(t1 / t01), 2)
            row["e1_10"] = round(math.log10(t10 / t1), 2)
            row["suspect"] = row["e1_10"] > 1.3
        out[name] = row
    n_susp = sum(1 for r in out.values() if r.get("suspect"))
    print(json.dumps({
        "metric": "sf10_subset_wall",
        "unit": "sec",
        "sf": 10,
        "n_queries": len(out),
        "n_errors": len(sf10.get("errors", {})),
        "errors": sf10.get("errors", {}),
        "total_s": round(sum(r["sf10_s"] for r in out.values()), 1),
        "n_suspect": n_susp,
        "queries": out,
    }, indent=1))


if __name__ == "__main__":
    main()
