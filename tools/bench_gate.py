#!/usr/bin/env python3
"""Round gate for the bench artifact.

Rounds 5 and 7 both shipped BENCH_r{N}.json with parsed:null because the
runner's bounded stdout-tail capture clipped a growing metric line. The
structural fix (round 8) moves the per-query map into a committed
sidecar, BENCH_OUT.json, and shrinks stdout to a fixed-size total line.
This gate fails the round if the sidecar is missing, unparseable, or
internally inconsistent — run it after `runMain graft.Bench`:

    python3 tools/bench_gate.py [BENCH_OUT.json]
"""
import json
import math
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_OUT.json"
    try:
        with open(path) as f:
            doc = json.loads(f.read())
    except FileNotFoundError:
        print(f"FAIL: {path} missing -- run `sbt \"runMain graft.Bench\"` "
              "from the repo root and commit the sidecar")
        return 1
    except json.JSONDecodeError as e:
        print(f"FAIL: {path} is not valid JSON: {e}")
        return 1

    for key in ("metric", "value", "unit", "failed", "n", "queries", "sf"):
        if key not in doc:
            print(f"FAIL: {path} missing key {key!r} (stale shape?)")
            return 1
    queries = doc["queries"]
    if not isinstance(queries, dict) or len(queries) == 0:
        print(f"FAIL: {path} has no per-query map")
        return 1
    if len(queries) != doc["n"]:
        print(f"FAIL: {path} n={doc['n']} but {len(queries)} per-query entries")
        return 1
    good = [v for v in queries.values() if v >= 0.0]
    if len(queries) - len(good) != doc["failed"]:
        print(f"FAIL: {path} failed={doc['failed']} but "
              f"{len(queries) - len(good)} negative per-query entries")
        return 1
    if not math.isclose(sum(good), doc["value"], rel_tol=1e-9, abs_tol=1e-6):
        print(f"FAIL: {path} value={doc['value']} != sum of good "
              f"per-query times {sum(good)}")
        return 1
    print(f"ok: {path} -- {doc['n']} queries, {doc['failed']} failed, "
          f"total {doc['value']:.3f}s at {doc['sf']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
