"""Benchmark CLI: score a submission against generated ground truth, or
generate the ground truth json.

Behavioral spec: /root/reference/dad_3dheads_benchmark/benchmark.py:199-206
and generate_gt.py.

Usage:
  python -m dad3dheads_tpu.cli.benchmark evaluate \
      --submission data/sub.json --gt data/ground_truth_val.json
  python -m dad3dheads_tpu.cli.benchmark generate-gt \
      --base-path dataset --subset val
"""

from __future__ import annotations

import argparse


def main() -> None:

    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    ev = sub.add_parser("evaluate")
    ev.add_argument("--submission", required=True)
    ev.add_argument("--gt", required=True)

    gg = sub.add_parser("generate-gt")
    gg.add_argument("--base-path", required=True)
    gg.add_argument("--subset", default="val")
    gg.add_argument("--with-attributes", action="store_true")
    gg.add_argument("--output-dir", default="data")

    args = ap.parse_args()

    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    if args.cmd == "evaluate":
        from ..benchmark_harness import evaluate

        evaluate(args.submission, args.gt)
    else:
        from ..benchmark_harness import generate_gt

        print(generate_gt(args.base_path, args.subset, args.with_attributes, args.output_dir))


if __name__ == "__main__":
    main()
