#!/usr/bin/env python3
"""Compose BENCH_SCALE_r{N}.json from the two ScaleBench artifacts:
target/scale_bench.json (the 1x/10x/100x ladder + measured recall) and
target/scale_decade3.json (the 5M-doc third decade for the budgeted
families). The decade-3 fields keep their own namespace so each number
stays attributable to the mode (and band_chunks setting) that produced it.

Usage: python3 tools/merge_scale.py BENCH_SCALE_r18.json
"""
import json
import sys

def main(out_path: str) -> None:
    with open("target/scale_bench.json") as f:
        base = json.load(f)
    with open("target/scale_decade3.json") as f:
        d3 = json.load(f)
    base["decade3"] = d3
    with open(out_path, "w") as f:
        json.dump(base, f)
    print(f"wrote {out_path}: ladder docs={base['docs']} + decade3 docs={d3['docs']}")

if __name__ == "__main__":
    main(sys.argv[1])
