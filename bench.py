#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

{"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Measures cl100k_base encode throughput of the TPU device engine over a
RAM-resident synthetic Gutenberg-like corpus (same protocol as the
reference's JMH benchmark; see jtokkit_tpu/bench.py). Baseline = JTokkit
single-thread cl100k_base ≈ 18.7 MB/s.
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=float, default=32)
    p.add_argument("--encoding", default="cl100k_base")
    p.add_argument("--mode", default="device", choices=["device", "host", "native", "native-mt", "tiktoken"])
    p.add_argument("--flavor", default="english",
                   choices=["english", "mixed", "cjk"])
    p.add_argument("--smoke", action="store_true",
                   help="tiny corpus, quick sanity run")
    args = p.parse_args()

    from jtokkit_tpu import bench

    result = bench.run(
        mb=1 if args.smoke else args.mb,
        encoding=args.encoding,
        mode=args.mode,
        flavor=args.flavor,
        passes=1 if args.smoke else 3,
    )
    out = {k: result[k] for k in ("metric", "value", "unit", "vs_baseline")}
    out["detail"] = result["detail"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
