"""Loader-only throughput study: thread vs persistent-process workers.

VERDICT r04 weak #5: the multi-core loader claim ("438 img/s/core x N
cores") was an extrapolation from thread-mode numbers, and 8 threads
measured SLOWER than 1 on this 1-core host (GIL). This tool measures the
real thing: the same FlameDataset walked by

  - 1 thread (the r04 measured configuration),
  - N threads (exhibits the GIL anomaly; now clamped to cpu_count by
    default in DataLoader),
  - 1 / 2 / 4 persistent fork worker PROCESSES (data/dataset.py
    worker_mode="process" — batch-level IPC, worker-side collate),

and reports steady-state images/sec for each. No JAX, no device: this is
the host-side pipeline in isolation (JPEG decode + mesh sidecar +
projection; heatmaps deferred to device as in the r04 real path).

  python tools/loader_study.py --dataset /tmp/fitds256 --batch 32 --batches 12
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def measure(loader, n_batches: int, warmup: int = 2) -> float:
    """Steady-state img/s over n_batches after warmup batches."""
    it = iter(loader)
    seen = 0
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = next(it)
        seen += len(next(iter(b.values())))
    dt = time.perf_counter() - t0
    # drain so worker processes shut down cleanly before the next config
    for _ in it:
        pass
    return seen / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--subset", default="train")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches", type=int, default=12, help="timed batches per config")
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--out", default=None, help="write the JSON here too")
    args = ap.parse_args()

    from dad3dheads_tpu.data.dataset import DataLoader, FlameDataset

    base = os.path.join(args.dataset, "DAD-3DHeadsDataset", args.subset)
    ds = FlameDataset.from_config(
        {
            "ann_path": os.path.join(base, f"{args.subset}.json"),
            "dataset_root": base,
            "img_size": args.img,
            "output_uint8": True,
            "device_heatmap": True,
        }
    )
    # warm the sidecar mesh cache for EVERY item any config will touch, so
    # the first config doesn't eat the one-time json->npy conversions
    # (~14 ms/item) that later configs then skip
    for i in range(len(ds)):
        _ = ds[i]

    configs = [
        ("thread", 1),
        ("thread", 8),
        ("process", 1),
        ("process", 2),
        ("process", 4),
    ]
    results = {}
    for mode, n_w in configs:
        loader = DataLoader(
            ds,
            batch_size=args.batch,
            shuffle=False,
            num_workers=n_w,
            worker_mode=mode,
            process_index=0,
            process_count=1,
        )
        need = (args.batches + 2) * args.batch
        if len(ds) < need:
            raise SystemExit(f"dataset too small: {len(ds)} < {need}")
        ips = measure(loader, args.batches)
        # thread mode clamps workers to cpu_count (GIL contention); report
        # what actually ran so a 1-core "8 threads" row can't mislead
        key = f"{mode}_{n_w}w_eff{loader.num_workers}"
        results[key] = round(ips, 1)
        print(f"{key}: {ips:.1f} img/s", file=sys.stderr, flush=True)

    out = {
        "workload": (
            f"FlameDataset loader only (no device): batch {args.batch}, "
            f"{args.batches} timed batches, uint8 images, device-deferred heatmaps"
        ),
        "cpu_count": os.cpu_count(),
        "results_ips": results,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
