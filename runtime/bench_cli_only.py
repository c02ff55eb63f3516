"""Re-measure ONLY bench.py's CLI serving legs (both modes) and print the
updated fields as one JSON line — for iterating on cli/refine.py serving
changes without re-running the scan/FLOP legs (~27 min on the chip).

    python runtime/bench_cli_only.py

Merge the printed dict into the latest BENCH record's `extra` by hand or
with runtime/merge_bench.py semantics (keys are identical to bench.py's).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    out = {}
    out.update(bench.bench_cli_serving(pose_only=2))
    print(json.dumps(out), flush=True)
    out.update(bench.bench_cli_serving(pose_only=3))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
