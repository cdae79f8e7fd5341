"""The multi-host path run FOR REAL: two OS processes, `jax.distributed`,
cross-process Gloo collectives.

The round-2 review's top gap: `jax.make_array_from_process_local_data`
(parallel/prefetch.py) was dead code in every test — both halves of the
multi-host contract were only ever exercised inside one process. Here two
spawned processes (4 virtual CPU devices each) build the shared 8-device
(data=4, model=2) mesh, shard the dataset with
``DataLoader(process_index=r, process_count=2)``, assemble global batches via
the non-fully-addressable branch, and take real train steps whose gradient
all-reduce and global-batch BN statistics cross the process boundary. A
single-process 8-device run of the same seeded script is the oracle.

Tolerances are chosen from measured numerics, not hope. The batch-mean loss
is permutation-invariant and collective-rounding differences enter it only at
~1e-7, so the STEP-0 loss must match the oracle to 1e-5. Beyond step 0 the
BN-heavy net at random init amplifies reduction-order rounding chaotically
(~1000x/step measured: permuting the rows of the SAME batch inside a single
process moved the step-1 loss by 1.7% and the step-2 grad norm by 7%), so
exact cross-implementation agreement is unattainable at fp32 — later steps
assert trajectory agreement at 10% plus an EXACT pure-Python check that both
worlds consumed identical per-step sample sets.

Reference contract: PL DDP actually spawns one process per GPU and syncs via
NCCL (/root/reference/model_training/train/flame_lightning_model.py:182-186,
config/backend/4gpu.yaml).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    return env


def _run_world(tmp_path, num_processes: int, port: int) -> list:
    procs, outs = [], []
    for r in range(num_processes):
        out = str(tmp_path / f"w{num_processes}_{r}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, _WORKER,
                    "--port", str(port),
                    "--process-id", str(r),
                    "--num-processes", str(num_processes),
                    "--steps", str(_STEPS),
                    "--out", out,
                ],
                env=_worker_env(8 // num_processes),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    results = []
    for p, out in zip(procs, outs):
        stdout, _ = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_loader_worlds_consume_identical_sample_sets():
    """Exact (fp-free) half of the oracle: per step, the union of the two
    ranks' local batches equals the single-process global batch."""
    from dad3dheads_tpu.data.dataset import DataLoader

    class DS:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {"si": np.asarray([i])}

    def step_sets(world):
        iters = [
            iter(
                DataLoader(
                    DS(), 8, shuffle=True, num_workers=1, seed=5,
                    process_index=r, process_count=world,
                )
            )
            for r in range(world)
        ]
        return [
            sorted(int(x) for it in iters for x in next(it)["si"].ravel())
            for _ in range(_STEPS)
        ]

    assert step_sets(2) == step_sets(1)


def test_two_process_training_matches_single_process(tmp_path):
    two = _run_world(tmp_path, num_processes=2, port=_free_port())
    one = _run_world(tmp_path, num_processes=1, port=_free_port())[0]

    # the two-process run actually executed the multi-host branch on a
    # (4, 2) mesh spanning both processes
    for r in two:
        assert r["multihost_branch"] is True
        assert r["device_count"] == 8 and r["local_device_count"] == 4
        assert r["mesh"] == {"data": 4, "model": 2}
        assert r["final_step"] == _STEPS
        assert all(np.isfinite(r["losses"]))
    assert one["multihost_branch"] is False

    # both ranks observe the same (replicated) global loss each step —
    # within one world everything is deterministic
    np.testing.assert_allclose(two[0]["losses"], two[1]["losses"], rtol=1e-6)
    np.testing.assert_allclose(
        two[0]["reproject_nme_2d"], two[1]["reproject_nme_2d"], rtol=1e-6
    )

    # step 0: same seeded data + init => the batch-mean loss and grad norm
    # reproduce the single-process oracle up to collective rounding
    np.testing.assert_allclose(two[0]["losses"][0], one["losses"][0], rtol=1e-5)
    np.testing.assert_allclose(
        two[0]["reproject_nme_2d"][0], one["reproject_nme_2d"][0], rtol=1e-4
    )
    np.testing.assert_allclose(
        two[0]["grad_norms"][0], one["grad_norms"][0], rtol=2e-3
    )

    # later steps: loss-trajectory agreement at chaos tolerance (see module
    # docstring for why exact agreement is impossible at fp32; the NME metric
    # routes the chaotic 3DMM params through the FLAME decode and is measured
    # to diverge ~50% by step 2 in BOTH single- and multi-process reorderings,
    # so only its step-0 value is comparable)
    np.testing.assert_allclose(two[0]["losses"], one["losses"], rtol=0.1)
    # training actually progressed (losses change across steps)
    assert len(set(np.round(one["losses"], 6))) > 1
