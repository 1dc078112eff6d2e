#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

{"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Default: HONEST device encode throughput — every document's token ids
materialized in host RAM (int32 array per document) — of cl100k_base over a
RAM-resident synthetic Gutenberg-like corpus (same protocol as the
reference's JMH benchmark; see jtokkit_tpu/bench.py). Baseline = JTokkit
single-thread cl100k_base ≈ 18.7 MB/s. The JSON detail carries companion
numbers (count-only mode, lists mode) when --extras is passed.

--all runs the full {encoding × flavor × mode} sweep and prints one JSON
line per configuration (the LAST line is the headline, so driver parsing
still sees the standard single-line contract).
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

MODES = ["device", "device-lists", "device-count", "decode", "device-decode",
         "host", "native", "native-mt", "tiktoken"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=float, default=32)
    p.add_argument("--encoding", default="cl100k_base")
    p.add_argument("--mode", default="device", choices=MODES)
    p.add_argument("--flavor", default="english",
                   choices=["english", "mixed", "cjk"])
    p.add_argument("--smoke", action="store_true",
                   help="tiny corpus, quick sanity run")
    p.add_argument("--all", action="store_true",
                   help="full sweep: encodings x flavors x key modes")
    p.add_argument("--sweep", action="store_true",
                   help="native thread-scaling sweep (reference analog of "
                        "AbstractMultiThreadedBenchmark 1..64 threads)")
    p.add_argument("--threads", type=int, default=None,
                   help="thread count for native-mt")
    args = p.parse_args()

    from jtokkit_tpu import bench

    if args.sweep:
        import os as _os

        rows = []
        for threads in (1, 2, 4, 8, 16):
            mode = "native" if threads == 1 else "native-mt"
            r = bench.run(mb=args.mb, encoding=args.encoding, mode=mode,
                          flavor=args.flavor, passes=3, threads=threads)
            out = {k: r[k] for k in
                   ("metric", "value", "unit", "vs_baseline")}
            out["detail"] = r["detail"]
            out["detail"]["threads"] = threads
            out["detail"]["cpus"] = _os.cpu_count()
            print(json.dumps(out), flush=True)
            rows.append(out)
        print(json.dumps(rows[-1]))
        return

    if args.all:
        rows = []
        for encoding in ("cl100k_base", "r50k_base", "p50k_base", "p50k_edit"):
            for flavor in ("english", "mixed", "cjk"):
                for mode in ("device", "device-count", "native", "native-mt"):
                    r = bench.run(
                        mb=args.mb, encoding=encoding, mode=mode,
                        flavor=flavor, passes=3,
                    )
                    out = {k: r[k] for k in
                           ("metric", "value", "unit", "vs_baseline")}
                    out["detail"] = r["detail"]
                    print(json.dumps(out), flush=True)
                    rows.append(out)
        # headline repeated last for the single-line contract
        head = next(
            r for r in rows
            if r["detail"]["flavor"] == "english"
            and r["metric"].startswith("cl100k_base encode throughput (device,")
        )
        print(json.dumps(head))
        return

    result = bench.run(
        mb=1 if args.smoke else args.mb,
        encoding=args.encoding,
        mode=args.mode,
        flavor=args.flavor,
        passes=1 if args.smoke else 3,
        threads=args.threads,
    )
    out = {k: result[k] for k in ("metric", "value", "unit", "vs_baseline")}
    out["detail"] = result["detail"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
